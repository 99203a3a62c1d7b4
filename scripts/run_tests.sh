#!/bin/bash
# Canonical test gate (VERDICT r3 #3): one long pytest process accumulates
# enough XLA:CPU state that 8-virtual-device sharded steps late in the run
# can die with a Fatal Python error (SIGABRT at result fetch) even though
# every file passes in isolation. No pytest-forked/xdist in this image, so
# the suite runs as two processes: the engine/sharded tail in its own.
#
# Usage: bash scripts/run_tests.sh  (from anywhere; ~50-60 min on this 1-core
# box — 196 tests as of r5: 175 library/ops/data + 21 engine/sharded)
set -u
cd "$(dirname "$0")/.."

ENGINE="tests/test_train.py tests/test_trainer_loop.py tests/test_sharded_eval.py \
tests/test_multiprocess.py tests/test_cli.py tests/test_avss_e2e.py"

t0=$SECONDS
IGNORES=""
for f in $ENGINE; do IGNORES="$IGNORES --ignore=$f"; done
echo "=== pass 1/2: library/ops/data tests ==="
python -m pytest tests/ -q $IGNORES
rc1=$?
echo "=== pass 1 rc=$rc1 ($((SECONDS - t0))s) ==="

t1=$SECONDS
echo "=== pass 2/2: engine + sharded tests ==="
python -m pytest $ENGINE -q
rc2=$?
echo "=== pass 2 rc=$rc2 ($((SECONDS - t1))s) ==="

echo "total $((SECONDS - t0))s"
exit $((rc1 | rc2))
