#!/bin/bash
# Queue B: bisect the scan_blocks device fault (pv_grad_bisect 32 256 scan
# hit UNAVAILABLE again in queue A). Each stage is its own process so a
# fault doesn't poison the next. ONE JAX process at a time on the tunnel.
set -x
cd /root/repo
{
  echo "=== queue B start $(date) ==="
  echo "--- health check"
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1
  for stage in fwd fwd_st grad grad_st body nockpt; do
    echo "--- bisect stage $stage (L=8 T=256)"
    timeout 1200 python experiments/pv_scan_bisect2.py $stage 8 256
    echo "--- stage $stage rc=$?"
  done
  echo "=== queue B done $(date) ==="
} 2>&1 | tee /tmp/queue_b.log
