#!/usr/bin/env bash
# Train COMBO-R50 on avs_ms3 (ref: scripts/res_train_avsms3.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_ms3/COMBO_R50_bs8_20k.yaml "$@"
