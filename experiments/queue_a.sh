#!/bin/bash
# On-chip queue, part A (kernel validation + PV-at-7B). ONE JAX process at a
# time on the axon tunnel (NOTES.md env gotchas). Logs to /tmp/queue_a.log.
set -x
cd /root/repo
{
  echo "=== queue A start $(date) ==="
  echo "--- 0. fused write+attend kernel: Mosaic compile + correctness"
  timeout 1200 python experiments/fused_wattn_probe.py || exit 1
  echo "--- 0b. int4 W4A16 kernel: Mosaic compile + correctness + vs-int8 timing"
  timeout 1200 python experiments/int4_probe.py || exit 1
  echo "--- 1. PV 7B scan grad step (the unrolled path faulted the chip)"
  timeout 2400 python experiments/pv_grad_bisect.py 32 256 scan || exit 1
  echo "--- 2. PV 7B full step + V step + peak HBM"
  timeout 3600 python experiments/pv_7b_memcheck.py || exit 1
  echo "=== queue A done $(date) ==="
} 2>&1 | tee /tmp/queue_a.log
