#!/usr/bin/env bash
# Train COMBO-PVTV2B5 on avs_s4 (ref: scripts/pvt_train_avs4.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_s4/COMBO_PVTV2B5_bs8_90k.yaml "$@"
