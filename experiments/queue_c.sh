#!/bin/bash
# Queue C: kernel-lever probes + full-model bench + feature economics.
# ONE JAX process at a time on the axon tunnel (NOTES.md env gotchas).
set -x
cd /root/repo
{
  echo "=== queue C start $(date) ==="
  echo "--- 0. gather OOB semantics + LUT inner-loop op A/B"
  timeout 1800 python experiments/lutgemv_oob_probe.py
  echo "--- 1. int4 probe (fixed 1024-step chains)"
  timeout 1800 python experiments/int4_probe.py
  echo "--- 2. int8 short-ctx flash A/B (fused write+attend, 256 ctx)"
  timeout 2400 python experiments/int8_flash_ab.py 256
  echo "--- 3. bench: FULL 32-layer models per mode"
  timeout 3600 python bench.py
  echo "--- 4. speculative economics"
  timeout 2400 python experiments/spec_probe.py 4
  echo "--- 5. windowed flash tile-skip win (mistral-shaped)"
  timeout 1800 python experiments/window_flash_probe.py
  echo "=== queue C done $(date) ==="
} 2>&1 | tee /tmp/queue_c.log
