#!/bin/bash
# Probe the TPU tunnel; when it comes back, run the integrate ablation and
# the bench once, serially (never two TPU jobs at once), logging to /tmp.
LOG=/tmp/tpu_watch.log
echo "watch start $(date)" >> "$LOG"
for i in $(seq 1 60); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float(jnp.sum(x@x)))
" >/dev/null 2>&1; then
    echo "tunnel up $(date)" >> "$LOG"
    echo "=== ablate ===" >> "$LOG"
    timeout 1800 python /root/repo/tools/ablate_integrate.py \
      >> "$LOG" 2>&1
    echo "=== bench ===" >> "$LOG"
    timeout 1800 python /root/repo/bench.py >> "$LOG" 2>&1
    echo "done $(date)" >> "$LOG"
    exit 0
  fi
  echo "probe $i down $(date)" >> "$LOG"
  sleep 240
done
echo "gave up $(date)" >> "$LOG"
