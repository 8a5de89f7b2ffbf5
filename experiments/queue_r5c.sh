#!/bin/bash
# Round-5 queue C: isolate the kmeans-scale worker crash, then the PV
# rehearsal retry (host-built student, zero downloads), then re-attempt the
# crash-dependent steps (lossy fixture, full-scale calibration).
set -x
cd /root/repo
{
  echo "=== queue R5c start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  for v in C D B E A; do
    echo "--- kmeans crash probe $v"
    timeout 1500 python experiments/kmeans_crash_probe.py $v 96
    echo "--- rc=$?"
  done

  echo "--- PV rehearsal retry: 12 steps at L=32 T=512 (host-built student)"
  timeout 7200 python experiments/pv_rehearsal.py 32 512 12 2
  echo "--- rc=$?"

  echo "--- kmeans probe F (full fit, 8 iters) — after the rehearsal so a crash cannot block it"
  timeout 2400 python experiments/kmeans_crash_probe.py F
  echo "--- rc=$?"

  echo "--- lossy ladder fixture retry"
  timeout 5400 python experiments/build_lossy_ladder.py
  echo "--- rc=$?"

  echo "--- reference-grade 1x16 calibration retry"
  timeout 7200 python experiments/calib_fullscale.py 2 1x16g8
  echo "--- rc=$?"

  echo "=== queue R5c done $(date) ==="
} 2>&1 | tee /tmp/queue_r5c.log
