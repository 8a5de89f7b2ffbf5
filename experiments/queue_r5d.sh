#!/bin/bash
# Round-5 queue D: rehearsal retry (V-step sync fix), instrumented
# full-scale calibration, lossy fixture rebuild (fixed kernels, hidden-768).
set -x
cd /root/repo
{
  echo "=== queue R5d start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- PV rehearsal: 12 steps at L=32 T=512 (V-step synced)"
  timeout 7200 python experiments/pv_rehearsal.py 32 512 12 2
  echo "--- rc=$?"

  echo "--- reference-grade 1x16 calibration (instrumented, init_max_iter=30 via env)"
  AQLM_CALIB_INIT_ITER=30 timeout 5400 python experiments/calib_fullscale.py 2 1x16g8
  echo "--- rc=$?"

  echo "--- lossy ladder fixture rebuild (hidden 768, fixed kernels)"
  timeout 5400 python experiments/build_lossy_ladder.py --force
  echo "--- rc=$?"

  echo "=== queue R5d done $(date) ==="
} 2>&1 | tee /tmp/queue_r5d.log
