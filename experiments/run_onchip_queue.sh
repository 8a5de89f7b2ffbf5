#!/bin/bash
# On-chip validation queue (run after the axon tunnel recovers).
# ONE JAX process at a time on the tunnel (NOTES.md env gotchas); this
# script runs the queue sequentially and logs to /tmp/onchip_queue.log.
set -x
cd /root/repo
{
  echo "=== queue start $(date) ==="
  echo "--- 0. fused write+attend kernel: Mosaic compile + correctness"
  echo "       (bench.py's codes decode path depends on this kernel now)"
  timeout 1200 python experiments/fused_wattn_probe.py || exit 1
  echo "--- 0b. int4 W4A16 kernel: Mosaic compile + correctness + vs-int8 timing"
  timeout 1200 python experiments/int4_probe.py || exit 1
  echo "--- 1. PV 7B scan grad step (the unrolled path faulted the chip)"
  timeout 2400 python experiments/pv_grad_bisect.py 32 256 scan || exit 1
  echo "--- 2. PV 7B full step + V step + peak HBM"
  timeout 3600 python experiments/pv_7b_memcheck.py || exit 1
  echo "--- 3. bench refresh"
  timeout 3600 python bench.py || exit 1
  echo "--- 4. speculative economics"
  timeout 2400 python experiments/spec_probe.py 4 || exit 1
  echo "--- 5. windowed flash tile-skip win (mistral-shaped)"
  timeout 1200 python experiments/window_flash_probe.py || exit 1
  echo "=== queue done $(date) ==="
} 2>&1 | tee -a /tmp/onchip_queue.log
