#!/bin/bash
# Round-4 follow-up queue (run AFTER queue_r4.sh finishes; one JAX process
# at a time on the axon tunnel). Logs to /tmp/queue_r4b.log.
set -x
cd /root/repo
{
  echo "=== queue R4b start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- 0. PV manual-vjp scan: L=16 (the dequant-remat fault point)"
  timeout 2400 python experiments/pv_grad_bisect.py 16 256 scan manual
  echo "--- 0 rc=$?"
  echo "--- 0b. PV manual-vjp scan: L=32"
  timeout 3600 python experiments/pv_grad_bisect.py 32 256 scan manual
  echo "--- 0b rc=$?"
  echo "--- 0c. PV dequant-remat L=16 WITHOUT ST window (fault isolation)"
  timeout 2400 python experiments/pv_grad_bisect.py 16 256 scan dequant nost
  echo "--- 0c rc=$?"
  echo "--- 0d. PV 7B full step + V step + peak HBM (manual default)"
  timeout 4800 python experiments/pv_7b_memcheck.py
  echo "--- 0d rc=$?"

  echo "--- 1. prefill probe round 2: two-step variants E/F"
  timeout 2400 python experiments/prefill_probe.py 256
  echo "--- 1 rc=$?"

  echo "--- 2. int4 unpack domain A/B (u8 vs i32 vs bf16-arith)"
  timeout 1800 python experiments/int4_u8_probe.py
  echo "--- 2 rc=$?"

  echo "--- 3. int8 decode glue split (attn/quant/norm/head)"
  timeout 2400 python experiments/int8_glue_split.py
  echo "--- 3 rc=$?"

  echo "--- 4. bench refresh (gather prefill + per-mode metrics)"
  timeout 4800 python bench.py
  echo "--- 4 rc=$?"

  echo "=== queue R4b done $(date) ==="
} 2>&1 | tee /tmp/queue_r4b.log
