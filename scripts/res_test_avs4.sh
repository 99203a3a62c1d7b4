#!/usr/bin/env bash
# Evaluate COMBO-R50 on the avs_s4 test split (ref: scripts/res_test_avs4.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_s4/Test_COMBO_R50_bs8_90k.yaml "$@"
