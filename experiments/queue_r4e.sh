#!/bin/bash
# Round-4 queue E: pin the REGRESSION — L=8 dequant passed in r3 but faults
# now. Toggle the r4 additions one at a time at the r3-passing config
# (L=8 T=256 dequant unsegmented). Run AFTER queue_r4d.
set -x
cd /root/repo
{
  echo "=== queue R4e start $(date) ==="
  echo "--- health check"
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('chip ok:', float((x @ x).sum()))" || exit 1

  echo "--- L=8 dequant, NO remat glue (the r3 body, modulo nothing else)"
  AQLM_PV_NO_REMAT_GLUE=1 timeout 2400 python experiments/pv_scan_bisect2.py grad_st 8 256 dequant 0
  echo "--- rc=$?"
  echo "--- L=8 dequant, WITH remat glue (replicates the r4d fault?)"
  timeout 2400 python experiments/pv_scan_bisect2.py grad_st 8 256 dequant 0
  echo "--- rc=$?"
  echo "--- L=16 manual, NO remat glue"
  AQLM_PV_NO_REMAT_GLUE=1 timeout 2400 python experiments/pv_scan_bisect2.py grad_st 16 256 manual 0
  echo "--- rc=$?"
  echo "--- L=32 manual segmented, NO remat glue"
  AQLM_PV_NO_REMAT_GLUE=1 timeout 3600 python experiments/pv_grad_bisect.py 32 256 scan manual
  echo "--- rc=$?"
  echo "=== queue R4e done $(date) ==="
} 2>&1 | tee /tmp/queue_r4e.log
