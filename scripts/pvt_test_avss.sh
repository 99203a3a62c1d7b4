#!/usr/bin/env bash
# Evaluate COMBO-PVTV2B5 on the avs_ss test split (ref: scripts/pvt_test_avss.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_ss/Test_COMBO_PVTV2B5_bs8_90k.yaml "$@"
