#!/bin/bash
# Round-4 queue C: isolate the L>=16 scan device fault (manual remat ALSO
# faults at L=16 per queue_r4b step 0 — so it is not the checkpointed
# ST-window residual). Matrix: forward-vs-grad x ST-vs-no-ST x remat mode
# x L, each its own process. Run AFTER queue_r4b. Logs /tmp/queue_r4c.log.
set -x
cd /root/repo
{
  echo "=== queue R4c start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  for args in \
      "fwd 16 256 manual" \
      "grad 16 256 manual" \
      "grad_st 16 256 manual" \
      "grad 16 256 none" \
      "grad_st 16 64 manual" \
      "grad_st 12 256 manual" \
      "grad_st 16 256 dequant"; do
    echo "--- pv_scan_bisect2 $args"
    timeout 2400 python experiments/pv_scan_bisect2.py $args
    echo "--- rc=$?"
  done
  echo "--- segmented grad ladder (scan_segment_layers=8 default)"
  timeout 2400 python experiments/pv_grad_bisect.py 16 256 scan manual
  echo "--- seg L=16 rc=$?"
  timeout 3600 python experiments/pv_grad_bisect.py 32 256 scan manual
  echo "--- seg L=32 rc=$?"
  echo "--- memcheck with segmented manual scan"
  timeout 4800 python experiments/pv_7b_memcheck.py
  echo "--- memcheck rc=$?"
  echo "=== queue R4c done $(date) ==="
} 2>&1 | tee /tmp/queue_r4c.log
