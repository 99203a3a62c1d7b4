#!/usr/bin/env bash
# Evaluate COMBO-R50 on the avs_ms3 test split (ref: scripts/res_test_avsms3.sh)
export AVS_DATASETS=${AVS_DATASETS:-AVS_dataset}
python pred.py --config-file combo_avs_tpu/configs/avs_ms3/Test_COMBO_R50_bs8_20k.yaml "$@"
