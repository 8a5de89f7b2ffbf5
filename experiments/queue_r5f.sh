#!/bin/bash
# Round-5 queue F: the BENCH_r05 dress rehearsal + engine bench + int8 cold
# start, after the eager-1x16-dequant transient fix.
set -x
cd /root/repo
{
  echo "=== queue R5f start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- FULL bench (all modes, prefill SOL)"
  timeout 5400 python bench.py
  echo "--- rc=$?"

  echo "--- engine bench (max_batch=4, max_len=512)"
  AQLM_ENGINE_MB=4 AQLM_ENGINE_ML=512 timeout 3600 python bench.py --engine
  echo "--- rc=$?"

  echo "--- cold start: int8 materialized (instrumented)"
  timeout 2400 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/int8 int8
  echo "--- rc=$?"

  echo "--- cold start: int8 materialized, fusion off (OOM differential)"
  AQLM_COLD_NOFUSE=1 timeout 2400 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/int8 int8
  echo "--- rc=$?"

  echo "=== queue R5f done $(date) ==="
} 2>&1 | tee /tmp/queue_r5f.log
