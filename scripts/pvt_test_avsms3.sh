#!/usr/bin/env bash
# Evaluate COMBO-PVTV2B5 on the avs_ms3 test split (ref: scripts/pvt_test_avsms3.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_ms3/Test_COMBO_PVTV2B5_bs8_20k.yaml "$@"
