"""r2 op-level probes for the Kx8 LUT-GEMV inner loop (gate_proj 2x8, B=1).

Current kernel (V0) per 128-code chunk: convert u8->i32, &127, <128 compare,
2 gathers, select, MXU dot. Variants cut specific ops:

  V0  repo kernel (baseline)
  V1  drop the `& 127` lane mask — tests whether tpu.dynamic_gather wraps
      indices mod 128 (if results match V0, the mask is free to remove)
  V2  full-width gathers: one take_along_axis per half over the whole
      [kr, tn] index block instead of a python loop of 128-lane chunks
  V3  V2 + no mask

Each variant's output is checked against V0 before timing.

Run (chip must be otherwise idle): python experiments/lut_ops_probe2.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.utils.timing import chain_time

OUT, IN, K, G, S = 11008, 4096, 2, 8, 256
IG = IN // G
KIG = K * IG
TN = 128  # 11008 % 512 != 0
KR = 1024

key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (OUT // TN, KIG, TN), 0, S, jnp.int32).astype(jnp.uint8)
lut = jax.random.normal(key, (1, KIG, S), jnp.float32)
lut_lo, lut_hi = lut[..., :128], lut[..., 128:]
print(f"backend: {jax.default_backend()}", flush=True)


def make_kernel(variant):
    def kern(codes_ref, lo_ref, hi_ref, out_ref, acc_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        cb = codes_ref[0]
        kr = cb.shape[0]
        ones = jnp.ones((1, kr), jnp.float32)
        if variant in ("V0", "V1"):
            for c in range(TN // 128):
                idx = cb[:, c * 128:(c + 1) * 128].astype(jnp.int32)
                lane = idx if variant == "V1" else (idx & 127)
                half = idx < 128
                g_lo = jnp.take_along_axis(lo_ref[0], lane, axis=1)
                g_hi = jnp.take_along_axis(hi_ref[0], lane, axis=1)
                g = jnp.where(half, g_lo, g_hi)
                acc_ref[0, c * 128:(c + 1) * 128] += jax.lax.dot_general(
                    ones, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
        else:  # V2 / V3: one full-width gather pair per row block
            idx = cb.astype(jnp.int32)  # [kr, TN]
            lane = idx if variant == "V3" else (idx & 127)
            half = idx < 128
            g_lo = jnp.take_along_axis(lo_ref[0], lane, axis=1)
            g_hi = jnp.take_along_axis(hi_ref[0], lane, axis=1)
            g = jnp.where(half, g_lo, g_hi)
            acc_ref[0] += jax.lax.dot_general(
                ones, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]

        @pl.when(r == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run(codes, lo, hi, variant):
    nt = codes.shape[0]
    return pl.pallas_call(
        make_kernel(variant),
        grid=(nt, KIG // KR),
        in_specs=[
            pl.BlockSpec((1, KR, TN), lambda o, r: (o, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KR, 128), lambda o, r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KR, 128), lambda o, r: (0, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN), lambda o, r: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, OUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TN), jnp.float32)],
    )(codes, lo, hi)


ref = None
for v in ("V0", "V1", "V2", "V3"):
    try:
        y = jax.device_get(run(codes, lut_lo, lut_hi, v))
        if ref is None:
            ref = y
            ok = "ref"
        else:
            ok = "MATCH" if abs(y - ref).max() < 1e-4 else f"MISMATCH {abs(y - ref).max():.3g}"
        def step(lo, cs, _v=v):
            y = run(cs, lo, lut_hi, _v)
            return lo + (y.ravel()[:1] * 0)  # carry dependence, same shape

        t = chain_time(step, lut_lo, n_steps=50, consts=codes)
        print(f"{v}: {t * 1e6:.1f} us/call  [{ok}]", flush=True)
    except Exception as e:
        print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
