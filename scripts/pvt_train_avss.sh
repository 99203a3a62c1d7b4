#!/usr/bin/env bash
# Train COMBO-PVTV2B5 on avs_ss (ref: scripts/pvt_train_avss.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_ss/COMBO_PVTV2B5_bs8_90k.yaml "$@"
