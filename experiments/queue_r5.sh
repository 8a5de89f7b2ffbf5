#!/bin/bash
# Round-5 queue A: validate + time this round's levers on the real chip.
#   1. batched cb-grad kernel (A/B vs segment_sum + full manual-proj grad)
#   2. amortized/slab gather-prefill kernels (256/1024/2048 tokens)
#   3. calibration grad crash check + Adam-epoch timing (2x8 kernel path,
#      1x16 gather16 path) — 300 executions each, past the ~33-64 threshold
#   4. PV multi-step rehearsal: 12 full PV steps at L=32/T=512, loss curve,
#      s/step (grad / host-Adam / V)
# One python process per step; a fault must not poison the next step.
set -x
cd /root/repo
{
  echo "=== queue R5 start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- 1. cb-grad A/B at 7B gate shape"
  timeout 1800 python experiments/cbgrad_probe.py
  echo "--- rc=$?"

  echo "--- 2. prefill kernels (amortized + slab)"
  timeout 2400 python experiments/prefill_probe2.py
  echo "--- rc=$?"

  echo "--- 3. calibration grad crash + epoch timing (2x8 + 1x16)"
  timeout 3600 python experiments/calib_probe_r5.py both 3
  echo "--- rc=$?"

  echo "--- 4. PV rehearsal: 12 steps at L=32 T=512"
  timeout 7200 python experiments/pv_rehearsal.py 32 512 12 2
  echo "--- rc=$?"

  echo "--- 5. reference-grade calibration: one 7B projection, 1x16"
  timeout 7200 python experiments/calib_fullscale.py 2 1x16g8
  echo "--- rc=$?"

  echo "--- 6. lossy ladder fixture (skips if the CPU build already cached it)"
  timeout 5400 python experiments/build_lossy_ladder.py
  echo "--- rc=$?"

  echo "=== queue R5 done $(date) ==="
} 2>&1 | tee /tmp/queue_r5.log
