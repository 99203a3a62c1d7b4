#!/usr/bin/env bash
# Evaluate COMBO-PVTV2B5 on the avs_s4 test split (ref: scripts/pvt_test_avs4.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_s4/Test_COMBO_PVTV2B5_bs8_90k.yaml "$@"
