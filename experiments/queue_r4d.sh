#!/bin/bash
# Round-4 queue D: (a) replicate the r3 L=8 PASS today — if L=8 now faults,
# the fault is environmental/regressed, not depth; (b) T scaling at L=8;
# (c) int4 u8-unpack A/B with the i16-hop fix; (d) bench re-run to validate
# the 2-D gather-prefill fix + capture codes prefill. One process at a time.
set -x
cd /root/repo
{
  echo "=== queue R4d start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- L=8 dequant (the r3 PASS configuration, unsegmented)"
  timeout 2400 python experiments/pv_scan_bisect2.py grad_st 8 256 dequant 0
  echo "--- rc=$?"
  echo "--- L=8 manual unsegmented"
  timeout 2400 python experiments/pv_scan_bisect2.py grad_st 8 256 manual 0
  echo "--- rc=$?"
  echo "--- L=10 manual unsegmented (threshold hunt: 8 < L* <= 12)"
  timeout 2400 python experiments/pv_scan_bisect2.py grad_st 10 256 manual 0
  echo "--- rc=$?"
  echo "--- L=16 manual seg=4 (finer segmentation than the failed seg=8)"
  timeout 2400 python experiments/pv_scan_bisect2.py grad_st 16 256 manual 4
  echo "--- rc=$?"

  for v in A B C D; do
    echo "--- dequant crash probe variant $v (ramp to 256 calls)"
    timeout 2400 python experiments/dequant_crash_probe.py $v 256
    echo "--- rc=$?"
  done

  echo "--- int4 u8 A/B (i16 hop)"
  timeout 1800 python experiments/int4_u8_probe.py
  echo "--- rc=$?"

  echo "--- bench (2-D gather-prefill fix validation + codes prefill number)"
  timeout 4800 python bench.py
  echo "--- rc=$?"
  echo "=== queue R4d done $(date) ==="
} 2>&1 | tee /tmp/queue_r4d.log
