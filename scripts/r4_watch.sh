#!/bin/bash
# Round-4 TPU watcher: poll the axon relay; when it returns, run the
# CRITICAL measurements immediately (the relay can die again at any time),
# then exit so the interactive session is notified and continues adaptively.
cd /root/repo
LOG=/tmp/r4_sweep.log
echo "watcher started $(date)" > "$LOG"
while true; do
  if (echo > /dev/tcp/127.0.0.1/8113) 2>/dev/null; then
    echo "relay back at $(date)" >> "$LOG"
    sleep 30
    {
      echo "=== hfuse fwd+bwd on-chip proof (round-4 gate) ==="
      timeout 2400 python scripts/r4_prove_hfuse.py
      echo "hfuse_rc=$?"
      echo "=== bench eval R50 bf16 (driver metric) ==="
      timeout 2400 python bench.py
      echo "eval_rc=$?"
      echo "=== bench train S4 bs8 fp32 ==="
      timeout 3000 python bench.py --train
      echo "train_rc=$?"
      echo "=== critical sweep done $(date) ==="
    } >> "$LOG" 2>&1
    exit 0
  fi
  sleep 60
done
