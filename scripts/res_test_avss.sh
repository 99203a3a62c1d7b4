#!/usr/bin/env bash
# Evaluate COMBO-R50 on the avs_ss test split (ref: scripts/res_test_avss.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_ss/Test_COMBO_R50_bs8_90k.yaml "$@"
