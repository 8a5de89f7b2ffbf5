"""Arbitrate the remaining op-level levers in the 2x8 LUT-GEMV inner loop.

The decode kernel's per-128-code chunk does: convert(u8->i32) + and(127) +
cmp(<128) + 2 lane gathers + select (ops/lut_gemv.py _gather_accum). The two
gathers at ~427 G/s are ~237 us/layer of the measured ~260 us — but the
cheap ops still cost ~10%, and dropping them is free IF the hardware
cooperates:

1. OOB semantics: does tpu.dynamic_gather (take_along_axis axis=1) wrap
   indices mod 128? If yes the `& 127` is redundant.
2. Timing A/B at gate_proj shape (11008x4096, 2x8): current vs no-and vs
   a single-gather S=128 loop (the hypothetical 2x7 scheme — quantifies
   what halving the table width would buy).

Run on the axon tunnel, ONE process at a time (NOTES.md).
Usage: python experiments/lutgemv_oob_probe.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.utils.timing import chain_time

print("backend:", jax.default_backend(), flush=True)

# --- 1. OOB semantics of the lane gather --------------------------------------


def _oob_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 256, size=(8, 128)), jnp.int32)
out = pl.pallas_call(
    _oob_kernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(idx, tab)
out = np.asarray(out)
wrapped = np.take_along_axis(np.asarray(tab), np.asarray(idx) & 127, axis=1)
clamped = np.take_along_axis(np.asarray(tab), np.minimum(np.asarray(idx), 127), axis=1)
if np.array_equal(out, wrapped):
    print("OOB: WRAPS mod 128 -> the `& 127` is redundant", flush=True)
    oob = "wrap"
elif np.array_equal(out, clamped):
    print("OOB: CLAMPS -> `& 127` required", flush=True)
    oob = "clamp"
else:
    print("OOB: UNDEFINED/other -> `& 127` required", flush=True)
    oob = "other"

# --- 2. timing A/B on the real shape ------------------------------------------

OUT, IN, K, G, TN = 11008, 4096, 2, 8, 128  # gate_proj, 2x8g8 (tn=128: OUT%512!=0)
IG = IN // G
KIG = K * IG
KR = 1024
L = 4


def _mk_kernel(variant):
    def kern(codes_ref, lo_ref, hi_ref, out_ref, acc_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes_block = codes_ref[0]
        kr = codes_block.shape[0]
        ones = jnp.ones((1, kr), jnp.float32)
        for c in range(TN // 128):
            idx = codes_block[:, c * 128 : (c + 1) * 128].astype(jnp.int32)
            if variant == "current":
                lane = idx & 127
                half = idx < 128
                g_lo = jnp.take_along_axis(lo_ref[:], lane, axis=1)
                g_hi = jnp.take_along_axis(hi_ref[:], lane, axis=1)
                gathered = jnp.where(half, g_lo, g_hi)
            elif variant == "noand":
                half = idx < 128
                g_lo = jnp.take_along_axis(lo_ref[:], idx, axis=1)
                g_hi = jnp.take_along_axis(hi_ref[:], idx, axis=1)
                gathered = jnp.where(half, g_lo, g_hi)
            elif variant == "single128":
                lane = idx & 127  # S=128 world: codes already < 128
                gathered = jnp.take_along_axis(lo_ref[:], lane, axis=1)
            else:
                raise ValueError(variant)
            acc_ref[0, c * 128 : (c + 1) * 128] += jax.lax.dot_general(
                ones, gathered, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]

        @pl.when(r == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run_one(codes_tl, lo, hi, variant):
    nt = codes_tl.shape[0]
    return pl.pallas_call(
        _mk_kernel(variant),
        grid=(nt, KIG // KR),
        in_specs=[
            pl.BlockSpec((1, KR, TN), lambda o, r: (o, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KR, 128), lambda o, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KR, 128), lambda o, r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN), lambda o, r: (0, o)),
        out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TN), jnp.float32)],
    )(codes_tl, lo, hi)


codes = jnp.asarray(rng.integers(0, 256, size=(L, OUT // TN, KIG, TN)), jnp.uint8)
lo = jnp.asarray(rng.standard_normal((KIG, 128)), jnp.float32)
hi = jnp.asarray(rng.standard_normal((KIG, 128)), jnp.float32)

# correctness first: noand must equal current when OOB wraps
y_cur = run_one(codes[0], lo, hi, "current")
if oob == "wrap":
    y_noand = run_one(codes[0], lo, hi, "noand")
    ok = bool(jnp.allclose(y_cur, y_noand))
    print(f"noand == current: {ok}", flush=True)

for variant in ("current", "noand", "single128") if oob == "wrap" else ("current", "single128"):
    def step(carry, cs):
        x, i = carry
        # one fixed layer: opaque pallas_calls are not hoisted (timing.py),
        # and skipping a per-step dynamic slice keeps the A/B pure
        y = run_one(cs, lo, hi, variant)
        return (x + y[0, :1] * 1e-9, i + 1)

    t = chain_time(step, (jnp.zeros((1,), jnp.float32), jnp.asarray(0, jnp.int32)),
                   n_steps=256, n_repeats=5, consts=codes[0])
    print(f"{variant:10s}: {t*1e6:7.1f} us/call (gate_proj shape)", flush=True)
