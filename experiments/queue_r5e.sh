#!/bin/bash
# Round-5 queue E: the PV rehearsal (donated apply jit) + cold-start TTFT +
# engine-path bench + full bench.
set -x
cd /root/repo
{
  echo "=== queue R5e start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- PV rehearsal: 12 steps at L=32 T=512 (donated apply)"
  timeout 7200 python experiments/pv_rehearsal.py 32 512 12 2
  echo "--- rc=$?"

  echo "--- cold start: int8 materialized, cache-cold process"
  timeout 1800 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/int8 int8
  echo "--- rc=$?"
  echo "--- cold start: int8 materialized, cache-warm process"
  timeout 1200 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/int8 int8
  echo "--- rc=$?"
  echo "--- cold start: codes materialized, cache-cold"
  timeout 1800 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/codes codes
  echo "--- rc=$?"
  echo "--- cold start: codes materialized, cache-warm"
  timeout 1200 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/codes codes
  echo "--- rc=$?"
  echo "--- cold start BASELINE: canonical checkpoint, load-time int8 transcode"
  timeout 2400 python experiments/cold_start_probe.py /tmp/aqlm_ckpt_7b/canon int8
  echo "--- rc=$?"

  echo "--- engine-path bench (16 mixed requests, int8 + codes)"
  timeout 3600 python bench.py --engine
  echo "--- rc=$?"

  echo "--- full bench (decode + prefill SOL fractions per mode)"
  timeout 5400 python bench.py
  echo "--- rc=$?"
  echo "=== queue R5e done $(date) ==="
} 2>&1 | tee /tmp/queue_r5e.log
