"""Codes-mode prefill breakdown + candidate fix (BENCH_r03: 188 tok/s vs
int8's 5081 on the same 256-token prompt — a 27x gap).

Suspects at the 7B gate_proj shape (11008x4096, 2x8, B=256 tokens):
  A. fused_onehot_matmul — the current prefill kernel. Its one-hot is built
     by a [IG, tn, S] compare-vs-iota on the VPU: ~S compares per GROUP per
     codebook = ~13G VPU element-ops/layer, ~10x the MXU dequant FLOPs.
  B. untile_codes inside the jitted forward (runtime.py prefill path).
  C. dense bf16 matmul at B=256 (the floor once dequant is free).
  D. CANDIDATE FIX: gather-dequant prefill kernel reading the TILED codes
     layout directly — dequantizes W^T tiles with the decode kernel's
     128-lane table gathers (g gathers per code, ~427 G/s measured) instead
     of one-hot compares, then feeds the MXU. No untile, no compare.

Run: python experiments/prefill_probe.py [B]
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):  # CPU smoke run (env var alone does not
    jax.config.update("jax_platforms", "cpu")  # keep axon off — NOTES.md)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import dequantize_onehot, fused_onehot_matmul
from aqlm_tpu.ops.lut_gemv import tile_codes, untile_codes
from aqlm_tpu.utils.timing import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
OUT, IN, K, G, S = 11008, 4096, 2, 8, 256
if os.environ.get("AQLM_PROBE_TINY"):
    B, OUT, IN = 8, 512, 256
IG = IN // G
KIG = K * IG

key = jax.random.PRNGKey(0)
codes_t = jax.random.randint(key, (K, IG, OUT), 0, S, jnp.int32).astype(jnp.uint8)
codes_tl = tile_codes(codes_t)  # [NT, KIG, tn]
NT, _, TN = codes_tl.shape
cbs = jax.random.normal(key, (K, S, G), jnp.float32) * 0.05
scales = jnp.ones((OUT,), jnp.float32)
x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)
wt_dense = jax.random.normal(jax.random.PRNGKey(2), (IN, OUT), jnp.bfloat16) * 0.02
print(f"backend: {jax.default_backend()}  B={B} tiles {codes_tl.shape}", flush=True)


def dep(x, y):
    """Inject a data dependence of x on y without changing x's shape."""
    return x + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)


def dep_int(c, x):
    """Non-foldable zero: make int consts c depend on the carry x (a folded
    dependence lets XLA hoist pure-XLA transforms out of the timing loop)."""
    s = jnp.sum(x.astype(jnp.float32))
    z = jnp.where(jnp.isfinite(s), 0, 1).astype(jnp.int32)
    return (c.astype(jnp.int32) + z).astype(c.dtype)


# --- A. current one-hot prefill kernel --------------------------------------
def step_onehot(x, consts):
    ct, cb, sc = consts
    y = fused_onehot_matmul(x, ct, cb, sc, group=G)
    return dep(x, y)


t = chain_time(step_onehot, x0, n_steps=8, consts=(codes_t, cbs, scales))
print(f"A fused_onehot_matmul B={B}: {t*1e3:.3f} ms/call", flush=True)

# --- A2. standalone one-hot dequant (no matmul) ------------------------------
def step_deq(x, consts):
    ct, cb, sc = consts
    ct = dep_int(ct, x)
    w = dequantize_onehot(ct, cb, sc, group=G)
    return dep(x, w)


t = chain_time(step_deq, x0, n_steps=8, consts=(codes_t, cbs, scales))
print(f"A2 dequantize_onehot: {t*1e3:.3f} ms/call", flush=True)

# --- B. untile_codes (XLA relayout) ------------------------------------------
def step_untile(x, consts):
    (ctl,) = consts
    ctl = dep_int(ctl, x)
    ct = untile_codes(ctl, K)
    return dep(x, ct)


t = chain_time(step_untile, x0, n_steps=8, consts=(codes_tl,))
print(f"B untile_codes: {t*1e3:.3f} ms/call", flush=True)

# --- C. dense bf16 matmul floor ----------------------------------------------
def step_dense(x, consts):
    (w,) = consts
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return dep(x, y)


t = chain_time(step_dense, x0, n_steps=16, consts=(wt_dense,))
print(f"C dense bf16 matmul B={B}: {t*1e3:.3f} ms/call", flush=True)


# --- D. candidate: gather-dequant prefill kernel over TILED codes ------------
def _gather_prefill_kernel(codes_ref, lo_ref, hi_ref, x_ref, sc_ref, out_ref,
                           acc_ref, wt_ref, *, tig, two_halves, kk, g, tn):
    """grid = (NT, b_tiles, row_tiles). Block shapes:
      codes_ref [1, kr, tn] uint8 (kr = tig*kk rows, ig-major)
      lo/hi_ref [g, kk, 128] f32 (codebook element j tables, both halves)
      x_ref     [tb, tig*g]
      sc_ref    [1, 1, tn]
      wt_ref    scratch [tig, g, tn] f32 (dequantized W^T tile)
    """
    r = pl.program_id(2)
    idx = codes_ref[0].astype(jnp.int32)  # [kr, tn]
    kr = tig * kk
    for c in range(tn // 128):
        chunk = idx[:, c * 128 : (c + 1) * 128]
        lane = (chunk & 127) if two_halves else chunk
        half = chunk < 128
        for j in range(g):
            tlo = jnp.broadcast_to(lo_ref[j][None], (tig, kk, 128)).reshape(kr, 128)
            glo = jnp.take_along_axis(tlo, lane, axis=1)
            if two_halves:
                thi = jnp.broadcast_to(hi_ref[j][None], (tig, kk, 128)).reshape(kr, 128)
                ghi = jnp.take_along_axis(thi, lane, axis=1)
                gath = jnp.where(half, glo, ghi)
            else:
                gath = glo
            wt_ref[:, j, c * 128 : (c + 1) * 128] = gath.reshape(tig, kk, 128).sum(axis=1)

    wt = wt_ref[:].reshape(tig * g, tn).astype(jnp.bfloat16)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(r == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def gather_prefill(x, codes_tl, codebooks, scales, *, group):
    nt, kig, tn = codes_tl.shape
    kk, s, g = codebooks.shape
    assert g == group
    two = s > 128
    ig = kig // kk
    in_features = ig * g
    b = x.shape[0]

    # codebook element-j tables: [g, K, 128] halves (f32: bf16 gathers crash
    # the remote Mosaic compiler, NOTES.md)
    cbt = codebooks.transpose(2, 0, 1).astype(jnp.float32)  # [g, K, S]
    if two:
        lo, hi = cbt[..., :128], cbt[..., 128:256]
    else:
        lo = hi = cbt[..., :128]

    # row tiling: bound the wt scratch (tig*g*tn f32 <= ~2 MB)
    kr = kig
    while (kr // kk) * g * tn * 4 > 2 * 2**20:
        assert kr % 2 == 0
        kr //= 2
    tig = kr // kk
    tb = min(b, 256)
    while b % tb:
        tb -= 1
    grid = (nt, b // tb, kig // kr)

    kern = functools.partial(
        _gather_prefill_kernel, tig=tig, two_halves=two, kk=kk, g=g, tn=tn
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kr, tn), lambda o, bt, r: (o, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tig * g), lambda o, bt, r: (bt, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda o, bt, r: (0, 0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, r: (bt, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt * tn), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, tn), jnp.float32),
            pltpu.VMEM((tig, g, tn), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(codes_tl, lo, hi, x.reshape(b, in_features), scales.reshape(1, 1, -1).astype(jnp.float32))


# correctness vs the one-hot path
y_ref = fused_onehot_matmul(x0[:8], codes_t, cbs, scales, group=G)
y_new = gather_prefill(x0[:8], codes_tl, cbs, scales, group=G)
rel = float(
    jnp.linalg.norm(y_new.astype(jnp.float32) - y_ref.astype(jnp.float32))
    / jnp.linalg.norm(y_ref.astype(jnp.float32))
)
print(f"D gather_prefill rel err vs one-hot: {rel:.2e}", flush=True)
assert rel < 2e-2, rel


def step_gather(x, consts):
    ctl, cb, sc = consts
    y = gather_prefill(x, ctl, cb, sc, group=G)
    return dep(x, y)


t = chain_time(step_gather, x0, n_steps=16, consts=(codes_tl, cbs, scales))
print(f"D gather_prefill B={B}: {t*1e3:.3f} ms/call", flush=True)


# --- E. standalone gather dequant (no matmul) --------------------------------
from aqlm_tpu.ops.gather_prefill import gather_dequant_wt  # noqa: E402


def step_gdeq(x, consts):
    ctl, cb, sc = consts
    ctl = dep_int(ctl, x)
    w = gather_dequant_wt(ctl, cb, sc)
    return dep(x, w)


t = chain_time(step_gdeq, x0, n_steps=16, consts=(codes_tl, cbs, scales))
print(f"E gather_dequant_wt: {t*1e3:.3f} ms/call", flush=True)


# --- F. two-step prefill: gather dequant to HBM + XLA dense matmul -----------
def step_two(x, consts):
    ctl, cb, sc = consts
    ctl = dep_int(ctl, x)
    w = gather_dequant_wt(ctl, cb, sc)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return dep(x, y)


t = chain_time(step_two, x0, n_steps=16, consts=(codes_tl, cbs, scales))
print(f"F gather_dequant + dense matmul B={B}: {t*1e3:.3f} ms/call", flush=True)
