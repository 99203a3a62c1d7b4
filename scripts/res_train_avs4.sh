#!/usr/bin/env bash
# Train COMBO-R50 on avs_s4 (ref: scripts/res_train_avs4.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_s4/COMBO_R50_bs8_90k.yaml "$@"
