"""A/B kernel variants for the Kx8 LUT-GEMV decode at full gate_proj shape.

Measured on the real chip with the natural carry chain (x feeds back), so
nothing is hoistable. Variants:

  A  current repo kernel (two 128-lane halves + select; f32 luts)
  B  s-packed: 256-entry lut packed into 128 f32 lanes as (bf16 lut[s],
     bf16 lut[s+128]) — ONE gather per code + bit select of the half
  C  B + deferred reduce: accumulate [8,tn] vreg-wise, one cross-sublane
     reduce per tile instead of per (chunk, b)
  D  C + codes pre-extended to int32 rows once per tile
  E  gather-only ceiling: B's gathers with no accumulate (sums garbage)

Run: python experiments/lutgemv_ab.py [B]
"""

import functools
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.lut_gemv import lut_gemv_kx8
from aqlm_tpu.utils.timing import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
OUT, IN, K, G, S = 11008, 4096, 2, 8, 256
IG = IN // G
KIG = K * IG

key = jax.random.PRNGKey(0)
codes_t = jax.random.randint(key, (K, IG, OUT), 0, S, jnp.int32).astype(jnp.uint8)
cbs = jax.random.normal(key, (K, S, G), jnp.float32) * 0.05
scales = jnp.ones((OUT,), jnp.float32)
x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)
print(f"backend: {jax.default_backend()}  B={B}", flush=True)


def pack_lut(lut):  # [B, KIG, 256] f32 -> [B, KIG, 128] f32 of packed bf16 pairs
    lo = jax.lax.bitcast_convert_type(lut[..., :128].astype(jnp.bfloat16), jnp.uint16)
    hi = jax.lax.bitcast_convert_type(lut[..., 128:].astype(jnp.bfloat16), jnp.uint16)
    bits = (lo.astype(jnp.uint32) << 16) | hi.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def build_lut(xb):
    xg = xb.reshape(B, IG, G).astype(jnp.float32)
    return jnp.einsum("big,ksg->bkis", xg, cbs,
                      preferred_element_type=jnp.float32).reshape(B, KIG, S)


def make_packed_kernel(variant):
    def kern(codes_ref, tab_ref, out_ref, acc_ref, *, tn):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if variant == "D":
            idx_all = codes_ref[:].astype(jnp.int32)
        for c in range(tn // 128):
            if variant == "D":
                idx = idx_all[:, c * 128 : (c + 1) * 128]
            else:
                idx = codes_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32)
            lane = idx & 127
            for b in range(B):
                g = jnp.take_along_axis(tab_ref[b], lane, axis=1)
                bits = jax.lax.bitcast_convert_type(g, jnp.int32)
                lo_val = bits & jnp.int32(-65536)   # s < 128 half, as f32 bits
                hi_val = bits << 16                  # s >= 128 half
                sel = jnp.where(idx < 128, lo_val, hi_val)
                v = jax.lax.bitcast_convert_type(sel, jnp.float32)
                if variant == "E":
                    acc_ref[b, 0, c * 128 : (c + 1) * 128] = v[0]  # no reduce
                elif variant == "B":
                    acc_ref[b, 0, c * 128 : (c + 1) * 128] += jnp.sum(v, axis=0)
                else:  # C, D: strided partial sums, cross-sublane deferred
                    kr = v.shape[0]
                    part = jnp.sum(v.reshape(kr // 8, 8, 128), axis=0)  # [8,128]
                    acc_ref[b, :, c * 128 : (c + 1) * 128] += part

        @pl.when(r == pl.num_programs(1) - 1)
        def _():
            if variant in ("C", "D"):
                out_ref[:] = jnp.sum(acc_ref[:], axis=1)
            else:
                out_ref[:] = acc_ref[:, 0]

    return kern


def call_packed(variant, codes2, lut_packed):
    kig, out_features = codes2.shape
    tn = 512 if out_features % 512 == 0 else 128
    kr = kig
    while kr > 1024:
        kr //= 2
    kern = functools.partial(make_packed_kernel(variant), tn=tn)
    return pl.pallas_call(
        kern,
        grid=(out_features // tn, kig // kr),
        in_specs=[
            pl.BlockSpec((kr, tn), lambda o, r: (r, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, kr, 128), lambda o, r: (0, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda o, r: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_features), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 8, tn), jnp.float32)],
    )(codes2, lut_packed)


codes2 = codes_t.reshape(KIG, OUT)


def bench(name, step):
    t = chain_time(step, x0, n_steps=20, consts=None)
    gathers = KIG * OUT * B
    print(f"{name}: {t*1e3:7.3f} ms/call  {gathers/t/1e9:7.1f} G gathers/s", flush=True)


def step_A(x):
    y = lut_gemv_kx8(x, codes_t, cbs, scales, group=G)
    return jnp.tanh(y[:, :IN]).astype(jnp.bfloat16)


def mk_step_packed(variant):
    def step(x):
        lut = build_lut(x)
        y = call_packed(variant, codes2, pack_lut(lut))
        return jnp.tanh(y[:, :IN]).astype(jnp.bfloat16)

    return step


bench("A current   ", jax.jit(step_A))
for v in ["B", "C", "D", "E"]:
    bench(f"{v} packed-{v} ", jax.jit(mk_step_packed(v)))
