"""A/B the int4 nibble-unpack domain: int32 (current) vs uint8 bitwise.

The W4A16 kernel's unpack chain is ~5 VPU ops/byte in int32 domain
(astype i32, &15, >>4, 2x astype bf16). If int4 decode measures VPU-bound
(experiments/int4_probe.py), the lever is op WIDTH: elementwise u8 ops pack
4x denser per vreg than i32, so doing the and/shift in uint8 before the
bf16 convert cuts the vreg-op count ~2x. This probes whether Mosaic lowers
u8 shifts/ands at full rate, at the gate_proj decode shape.

Variants:
  A  current int32-domain unpack (baseline, = ops/int4_matmul._body)
  B  uint8-domain: nib = (wb & 15) / (wb >> 4) in u8, then i16 -> bf16
     (Mosaic has no direct u8->bf16 cast — first on-chip run failed with
     "Unsupported cast: uint8 -> bfloat16"; the i16 hop is still half the
     vreg width of the i32 chain)
  C  bf16-domain arithmetic: u8 -> i16 -> bf16 convert once, hi = floor(w *
     1/16), lo = w - 16*hi (integers <= 255 are exact in bf16)

Run: python experiments/int4_u8_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.int4_matmul import GROUP, quantize_int4
from aqlm_tpu.ops.int8_matmul import _tile
from aqlm_tpu.utils.timing import chain_time

OUT, IN = 11008, 4096
if os.environ.get("AQLM_PROBE_TINY"):
    OUT, IN = 512, 512
print(f"backend: {jax.default_backend()}", flush=True)

key = jax.random.PRNGKey(0)
dense = jax.random.normal(key, (OUT, IN), jnp.float32) * 0.02
w4, gs = quantize_int4(dense)
x0 = jax.random.normal(jax.random.PRNGKey(1), (1, IN), jnp.bfloat16)


def make_kernel(variant):
    def body(x, w_bytes, s_rows, acc_ref):
        tkp = w_bytes.shape[1]
        xdt = x.dtype
        if variant == "C":
            wf = w_bytes.astype(jnp.int16).astype(jnp.bfloat16)
        for gi in range(tkp // GROUP):
            if variant == "A":
                wb = w_bytes[:, gi * GROUP : (gi + 1) * GROUP].astype(jnp.int32)
                nibs = ((0, (wb & 15).astype(xdt)), (1, (wb >> 4).astype(xdt)))
            elif variant == "B":
                wb = w_bytes[:, gi * GROUP : (gi + 1) * GROUP]  # uint8
                nibs = (
                    (0, (wb & jnp.uint8(15)).astype(jnp.int16).astype(xdt)),
                    (1, (wb >> jnp.uint8(4)).astype(jnp.int16).astype(xdt)),
                )
            else:  # C
                wbf = wf[:, gi * GROUP : (gi + 1) * GROUP]
                hi = jnp.floor(wbf * jnp.bfloat16(1.0 / 16.0))
                lo = wbf - hi * jnp.bfloat16(16.0)
                nibs = ((0, lo.astype(xdt)), (1, hi.astype(xdt)))
            for half_i, nib in nibs:
                og = 2 * gi + half_i
                xg = x[:, og * GROUP : (og + 1) * GROUP]
                d = jax.lax.dot_general(
                    xg, nib, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc_ref[:] += (d - 8.0 * xs) * s_rows[og][None, :].astype(jnp.float32)

    def kern(x_ref, w_ref, s_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        body(x_ref[:], w_ref[:], s_ref[:], acc_ref)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def call(x, w4, gscale, *, variant):
    b, in_pad = x.shape
    out_features, half = w4.shape
    tn = _tile(out_features, 512, 128)
    tkp = _tile(half, 1024, 128)
    tb = b
    grid = (out_features // tn, 1, half // tkp)
    tg = 2 * tkp // GROUP
    return pl.pallas_call(
        make_kernel(variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, 2 * tkp), lambda o, bt, k: (bt, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tkp), lambda o, bt, k: (o, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, tn), lambda o, bt, k: (k, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k: (bt, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(x, w4, gscale)


def dep(x, y):
    return x + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)


ys = {}
for variant in ("A", "B", "C"):
    try:
        y = call(x0, w4, gs, variant=variant)
        ys[variant] = y
        if "A" in ys and variant != "A":
            import numpy as np

            rel = float(
                jnp.linalg.norm(y.astype(jnp.float32) - ys["A"].astype(jnp.float32))
                / jnp.linalg.norm(ys["A"].astype(jnp.float32))
            )
            print(f"{variant} rel err vs A: {rel:.2e}", flush=True)
            assert rel < 1e-2, rel

        def step(x, consts, v=variant):
            w, s = consts
            return dep(x, call(x, w, s, variant=v))

        t = chain_time(step, x0, n_steps=256, consts=(w4, gs))
        print(f"{variant}: {t*1e6:.1f} us/call", flush=True)
    except Exception as e:
        print(f"{variant}: FAILED {e!r}", flush=True)
