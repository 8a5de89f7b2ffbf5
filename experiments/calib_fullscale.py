"""On-chip calibration of ONE 7B-width projection at reference-grade settings.

VERDICT r4 missing #2: the calibration pillar had never run at real settings
on the chip (the r1 smoke used 5 kmeans iters + 10 Adam steps). This runs
calib.engine.quantize_weight — the real entry point: residual-kmeans init,
100-step AMSGrad epochs, full beam-search sweeps, early stop — on gate_proj
(11008x4096) at 1x16g8 with the reference's defaults (init_max_iter=100,
steps_per_epoch=100, beam_size=1, relative_mse_tolerance=0.01;
/root/reference/main.py:669-760), bounded only by max_epochs for the
in-round run. Records time per phase and extrapolates the 32-layer
wall-clock next to the reference's ~1 day on 1xA100
(/root/reference/README.md:194).

The MSE loss differentiates through dequantize_weight, which on TPUs now
routes 1x16 through the gather16 custom-VJP (the XLA gather in that position
crashes the v5e worker after ~33-64 executions) — calib_probe_r5.py is the
isolated crash check; this is the full pipeline.

Run: python experiments/calib_fullscale.py [max_epochs] [scheme]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aqlm_tpu.calib.engine import CalibConfig, XTXAccumulator, quantize_weight
from aqlm_tpu.config import AqlmScheme

MAX_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SCHEME = sys.argv[2] if len(sys.argv) > 2 else "1x16g8"
OUT, IN = 11008, 4096
NSAMP, T = 16, 512  # XTX from 8192 activation rows (streamed accumulate)
if os.environ.get("AQLM_PROBE_TINY"):
    OUT, IN, NSAMP, T = 512, 256, 2, 64

print(f"backend: {jax.default_backend()}  {OUT}x{IN} {SCHEME} "
      f"max_epochs={MAX_EPOCHS}", flush=True)

scheme = AqlmScheme.parse(SCHEME)
key = jax.random.PRNGKey(0)
ref_w = jax.random.normal(key, (OUT, IN), jnp.float32) * 0.02

# XTX the way the pipeline builds it: accumulated over activation batches
acc = XTXAccumulator.zeros(IN)
for i in range(NSAMP):
    x = jax.random.normal(jax.random.PRNGKey(10 + i), (T, IN), jnp.float32)
    acc = acc.add(x)
XTX = acc.mean
jax.block_until_ready(XTX)
print("XTX accumulated", flush=True)

cfg = CalibConfig(
    lr=1e-4, beam_size=1, max_epochs=MAX_EPOCHS, steps_per_epoch=100,
    relative_mse_tolerance=0.01,
    init_max_iter=int(os.environ.get("AQLM_CALIB_INIT_ITER", "100")),
    verbose=True,
)

t0 = time.time()
w, stats = quantize_weight(ref_w, XTX, scheme, cfg)
total = time.time() - t0
jax.block_until_ready(w.codebooks)

bits = (
    w.codes.size * scheme.nbits_per_codebook
    + w.codebooks.size * 16 + w.scales.size * 16
) / (OUT * IN)
print(f"RESULT: {SCHEME} gate_proj {OUT}x{IN}: {total:.0f} s total "
      f"({len(stats['loss_history'])} epochs run), final MSE "
      f"{stats['final_mse']:.6f}, loss history "
      f"{[round(x, 6) for x in stats['loss_history']]}, {bits:.2f} bits/param",
      flush=True)
# block params / gate params = (4*h^2 + 3*h*i) / (h*i): 7B -> ~4.49
block_scale = (4 * 4096 * 4096 + 3 * 4096 * 11008) / (4096 * 11008)
per_layer = total * block_scale
print(f"RESULT: extrapolated full block ~{per_layer/60:.1f} min -> 32 layers "
      f"~{32*per_layer/3600:.1f} h on ONE v5e chip at these settings "
      f"(epochs capped at {MAX_EPOCHS}; reference 7B default config: ~1 day "
      f"on 1xA100, README.md:194). Out-group sharding over a mesh divides "
      f"the beam search (calib/parallel.py).", flush=True)
print("DONE", flush=True)
