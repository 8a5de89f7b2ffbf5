"""On-chip calibration at 7B widths: crash check + Adam-epoch timing.

The AQEngine MSE loss differentiates through dequantization ~100s of times
per layer at reference settings; the XLA take_along_axis gather in that
position crashed the v5e worker after ~33-64 executions
(experiments/dequant_crash_probe). dequantize_weight now routes TPU dequant
through the Pallas one-hot kernel (Kx8) or the row-packed wide gather
(1x16, "gather16") with manual VJPs (cb_grad_segment / segment_sum). This
probe runs value_and_grad(compute_mse) in a jitted 100-step Adam scan —
the exact engine epoch — for BOTH schemes at gate_proj shape, several
epochs (>=300 grad executions, past the crash threshold), and times it.

Run: python experiments/calib_probe_r5.py [scheme] [epochs]
  scheme: 2x8 | 1x16 | both (default both)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from aqlm_tpu.calib.engine import CalibConfig, compute_mse
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, random_aqlm_weight

WHICH = sys.argv[1] if len(sys.argv) > 1 else "both"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
OUT, IN = 11008, 4096
if os.environ.get("AQLM_PROBE_TINY"):
    OUT, IN = 512, 256

print(f"backend: {jax.default_backend()}  {OUT}x{IN}  epochs={EPOCHS}", flush=True)

key = jax.random.PRNGKey(0)
ref_w = jax.random.normal(key, (OUT, IN), jnp.float32) * 0.02
xtx_half = jax.random.normal(jax.random.PRNGKey(1), (IN, IN), jnp.float32) * 0.1
XTX = xtx_half @ xtx_half.T / IN


def run(scheme_name):
    scheme = AqlmScheme.parse(scheme_name)
    w = random_aqlm_weight(jax.random.PRNGKey(2), scheme, OUT, IN)
    cfg = CalibConfig(lr=1e-4, steps_per_epoch=100)
    opt = optax.amsgrad(cfg.lr, b1=0.0, b2=0.95)

    @jax.jit
    def adam_epoch(codebooks, scales, codes, opt_state, rw, xtx):
        def loss_fn(cb_sc):
            cb, sc = cb_sc
            ww = AqlmWeight(codes=codes, codebooks=cb, scales=sc, bias=None,
                            scheme=scheme)
            return compute_mse(ww, rw, xtx)

        def step(carry, _):
            (cb, sc), opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)((cb, sc))
            updates, opt_state = opt.update(grads, opt_state, (cb, sc))
            return (optax.apply_updates((cb, sc), updates), opt_state), loss

        ((cb, sc), opt_state), losses = jax.lax.scan(
            step, ((codebooks, scales), opt_state), None,
            length=cfg.steps_per_epoch,
        )
        return cb, sc, opt_state, losses

    opt_state = opt.init((w.codebooks, w.scales))
    cb, sc = w.codebooks, w.scales
    t0 = time.time()
    cb, sc, opt_state, losses = adam_epoch(cb, sc, w.codes, opt_state, ref_w, XTX)
    jax.block_until_ready(jax.device_get(losses[-1]))
    print(f"[{scheme_name}] epoch 0 (incl compile): {time.time()-t0:.1f} s  "
          f"loss {float(losses[0]):.6f} -> {float(losses[-1]):.6f}", flush=True)
    for e in range(1, EPOCHS):
        t0 = time.time()
        cb, sc, opt_state, losses = adam_epoch(cb, sc, w.codes, opt_state, ref_w, XTX)
        last = float(jax.device_get(losses[-1]))
        dt = time.time() - t0
        print(f"[{scheme_name}] epoch {e}: {dt:.1f} s ({dt*10:.0f} ms/step)  "
              f"loss -> {last:.6f}", flush=True)
    total_execs = EPOCHS * cfg.steps_per_epoch
    print(f"[{scheme_name}] CLEAN after {total_execs} grad(compute_mse) "
          f"executions (crash threshold was ~33-64)", flush=True)


if WHICH in ("2x8", "both"):
    run("2x8g8")
if WHICH in ("1x16", "both"):
    run("1x16g8")
print("DONE", flush=True)
