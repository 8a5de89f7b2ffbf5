#!/bin/bash
# Round-4 queue E (rewritten after the r4d root cause): XLA's dequant-scale
# take_along_axis gather crashes the v5e worker after ~33-64 executions;
# the PV manual path now dequantizes via the Pallas one-hot kernel
# (PVConfig.scan_dequant="auto"). Validate: scatter survival (codebook
# grads), the PV depth ladder with kernel dequant, and the full memcheck.
set -x
cd /root/repo
{
  echo "=== queue R4e start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- scatter survival (segment_sum at codebook-grad scale)"
  timeout 2400 python experiments/dequant_crash_probe.py E 256
  echo "--- rc=$?"

  echo "--- PV kernel-dequant ladder: L=8"
  timeout 2400 python experiments/pv_grad_bisect.py 8 256 scan manual
  echo "--- rc=$?"
  echo "--- PV kernel-dequant ladder: L=16"
  timeout 2400 python experiments/pv_grad_bisect.py 16 256 scan manual
  echo "--- rc=$?"
  echo "--- PV kernel-dequant ladder: L=32 (the 7B depth)"
  timeout 3600 python experiments/pv_grad_bisect.py 32 256 scan manual
  echo "--- rc=$?"
  echo "--- PV 7B full step + V step + peak HBM (kernel dequant, T=512)"
  timeout 4800 python experiments/pv_7b_memcheck.py
  echo "--- rc=$?"
  echo "=== queue R4e done $(date) ==="
} 2>&1 | tee /tmp/queue_r4e.log
