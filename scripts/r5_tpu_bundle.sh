#!/bin/bash
# TPU job bundle #3 (round 5): run AFTER bench_all frees the chip.
# One process at a time — the chip is exclusive and racing axon init fails.
#  1. post-batch-diet real-loop re-measure (60 S4 + 30 AVSS iters, real
#     Trainer/loader, compact uint8/bool batches)
#  2. stratified-vs-exact selection convergence A/B (VERDICT r4 weak #6)
#  3. remat_policy="save_deform" at production bs8 (VERDICT r4 #9)
set -x
cd "$(dirname "$0")/.."
python scripts/r5_longtrain.py --tag _diet --s4-iters 60 --avss-iters 30 \
    --eval-videos 48 2>&1
python scripts/exp_strat_ab.py --steps 300 2>&1
python scripts/exp_remat_policy.py --bs 8 2>&1
echo BUNDLE_DONE
