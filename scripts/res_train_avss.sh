#!/usr/bin/env bash
# Train COMBO-R50 on avs_ss (ref: scripts/res_train_avss.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_ss/COMBO_R50_bs8_90k.yaml "$@"
