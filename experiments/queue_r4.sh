#!/bin/bash
# Round-4 on-chip queue. ONE JAX process at a time on the axon tunnel
# (NOTES.md env gotchas). Each probe is its own process so a device fault
# doesn't poison the next. Logs to /tmp/queue_r4.log.
set -x
cd /root/repo
{
  echo "=== queue R4 start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- 0. codes-prefill breakdown + gather-prefill candidate (27x gap)"
  timeout 2400 python experiments/prefill_probe.py 256
  echo "--- 0 rc=$?"

  echo "--- 1a. PV scan grad L=16"
  timeout 2400 python experiments/pv_grad_bisect.py 16 256 scan
  echo "--- 1a rc=$?"
  echo "--- 1b. PV scan grad L=24"
  timeout 2400 python experiments/pv_grad_bisect.py 24 256 scan
  echo "--- 1b rc=$?"
  echo "--- 1c. PV scan grad L=32 (the 7B depth)"
  timeout 3600 python experiments/pv_grad_bisect.py 32 256 scan
  echo "--- 1c rc=$?"
  echo "--- 1d. PV 7B full step + V step + peak HBM (L=32 T=512)"
  timeout 4800 python experiments/pv_7b_memcheck.py
  echo "--- 1d rc=$?"

  echo "--- 2. 2x7 single-gather full-model decode"
  timeout 3600 python experiments/decode_2x7_probe.py
  echo "--- 2 rc=$?"

  echo "--- 3. gather OOB semantics + LUT inner-loop op A/B"
  timeout 1800 python experiments/lutgemv_oob_probe.py
  echo "--- 3 rc=$?"

  echo "--- 4. int4 probe (1024-step chains): DMA- vs VPU-bound"
  timeout 1800 python experiments/int4_probe.py
  echo "--- 4 rc=$?"

  echo "--- 5. int8 short-ctx flash A/B (fused write+attend, 256 ctx)"
  timeout 2400 python experiments/int8_flash_ab.py 256
  echo "--- 5 rc=$?"

  echo "--- 6. speculative economics"
  timeout 2400 python experiments/spec_probe.py 4
  echo "--- 6 rc=$?"

  echo "--- 7. windowed flash tile-skip win (mistral-shaped)"
  timeout 1800 python experiments/window_flash_probe.py
  echo "--- 7 rc=$?"

  echo "=== queue R4 done $(date) ==="
} 2>&1 | tee /tmp/queue_r4.log
