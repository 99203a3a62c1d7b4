#!/usr/bin/env bash
# Train COMBO-PVTV2B5 on avs_ms3 (ref: scripts/pvt_train_avsms3.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python train_net.py --config-file combo_avs_tpu/configs/avs_ms3/COMBO_PVTV2B5_bs8_20k.yaml "$@"
