"""Probe 6: lane-gather throughput at scale + prototype fused 2x8 dequant-matvec.

The design on the table (probe 5 found only axis=1 gathers lower on Mosaic):
store codes transposed [IG, OUT]; per codebook column g the table is 256
values = 2 x 128 lanes; dequantize W^T tiles with per-lane gathers + one
select; feed MXU directly with W^T (no transpose needed for x @ W^T).
"""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aqlm_tpu.utils.timing import chain_time

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)

# ---- lane-gather throughput at scale ----
M, L = 8192, 128  # 1M gathers per call


def lg_kernel(idx_ref, rows_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=1)


rows = jax.random.normal(key, (M, L), jnp.float32)
idx0 = jax.random.randint(key, (M, L), 0, L, jnp.int32)


def lg_call(lidx):
    return pl.pallas_call(
        lg_kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lidx, rows)


def lg_step(lidx):
    out = lg_call(lidx)
    return (lidx + out.astype(jnp.int32)) % L


ok = np.allclose(
    np.asarray(lg_call(idx0)), np.take_along_axis(np.asarray(rows), np.asarray(idx0), 1)
)
t = chain_time(lg_step, idx0, n_steps=50, n_repeats=3)
print(
    f"lane gather [8192x128]: {t*1e6:8.1f} us/call  correct={ok}  "
    f"-> {M*L/t/1e9:6.2f} G gathers/s  ({M*L/t/0.94e9/128:5.2f} elems/lane/cycle)",
    flush=True,
)

# bf16 variant
rows_bf = rows.astype(jnp.bfloat16)


def lg_kernel_bf(idx_ref, rows_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=1)


def lg_call_bf(lidx):
    return pl.pallas_call(
        lg_kernel_bf,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lidx, rows_bf)


try:
    ok = np.allclose(
        np.asarray(lg_call_bf(idx0)),
        np.take_along_axis(np.asarray(rows_bf), np.asarray(idx0), 1),
    )
    t = chain_time(lambda i: (i + lg_call_bf(i).astype(jnp.int32)) % L, idx0, n_steps=50)
    print(f"lane gather bf16: {t*1e6:8.1f} us/call  correct={ok}", flush=True)
except Exception as e:
    print(f"lane gather bf16 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

# ---- prototype fused 2x8 dequant + matvec, full layer ----
OUT, IN, G, S, K = 11008, 4096, 8, 256, 2
IG = IN // G
codesT = jax.random.randint(key, (K, IG, OUT), 0, S, jnp.int32).astype(jnp.uint8)  # transposed!
cb = jax.random.normal(key, (K, S, G), jnp.float32).astype(jnp.bfloat16)
scales = jax.random.uniform(key, (OUT,), jnp.float32, 0.5, 1.5).astype(jnp.bfloat16)

TN = 512  # out-channel tile (lanes)
TIG = 128  # in-group tile -> TK = 1024 weights


def dequant_matvec_kernel(codesT_ref, cbT_lo_ref, cbT_hi_ref, x_ref, out_ref, acc_ref):
    # codesT_ref: [K, TIG, TN] uint8 -> int32
    # cbT_lo/hi:  [K, 8, 128]  (cb[k, s, g] at [k, g, s%128], s<128 in lo)
    # x_ref:      [B, TIG*G]
    # out/acc:    [B, TN]
    B = x_ref.shape[0]
    TK = TIG * G
    wT = jnp.zeros((TK, TN), jnp.bfloat16)
    for k in range(K):
        codes = codesT_ref[k].astype(jnp.int32)  # [TIG, TN]
        idx = pltpu.repeat(codes, G, axis=0)  # [TK, TN] rows grouped: row i -> ig=i//G? no:
        # pltpu.repeat repeats the whole array; need per-row repeat -> use reshape trick:
        # codes [TIG, TN] -> [TIG, 1, TN] broadcast [TIG, G, TN] -> [TK, TN]
        idx = jnp.broadcast_to(codes[:, None, :], (TIG, G, TN)).reshape(TK, TN)
        lo = idx & 127
        # table rows: row i uses cb[k, :, i % G]
        tbl_lo = jnp.broadcast_to(cbT_lo_ref[k][None, :, :], (TIG, G, 128)).reshape(TK, 128)
        tbl_hi = jnp.broadcast_to(cbT_hi_ref[k][None, :, :], (TIG, G, 128)).reshape(TK, 128)
        v_lo = jnp.take_along_axis(tbl_lo, lo, axis=1)
        v_hi = jnp.take_along_axis(tbl_hi, lo, axis=1)
        wT = wT + jnp.where(idx < 128, v_lo, v_hi)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def fused_matvec(x, codesT, cb, scales):
    B = x.shape[0]
    # cb [K,S,G] -> cbT lo/hi [K, G, 128]
    cbT = cb.transpose(0, 2, 1)  # [K, G, S]
    cb_lo, cb_hi = cbT[:, :, :128], cbT[:, :, 128:]
    y = pl.pallas_call(
        dequant_matvec_kernel,
        grid=(OUT // TN, IG // TIG),
        in_specs=[
            pl.BlockSpec((K, TIG, TN), lambda o, i: (0, i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TIG * G), lambda o, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, TN), jnp.float32)],
    )(codesT, cb_lo, cb_hi, x)
    return y * scales[None, :]


B = 8
x = jax.random.normal(key, (B, IN), jnp.bfloat16)
try:
    got = np.asarray(fused_matvec(x, codesT, cb, scales), np.float32)
    # numpy reference
    w = np.zeros((OUT, IN), np.float32)
    cbn = np.asarray(cb, np.float32)
    cn = np.asarray(codesT, np.int64)  # [K, IG, OUT]
    for k in range(K):
        w += cbn[k][cn[k]].transpose(1, 0, 2).reshape(OUT, IN)
    ref = (np.asarray(x, np.float32) @ w.T) * np.asarray(scales, np.float32)[None, :]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"fused 2x8 dequant-matvec correctness rel err: {rel:.5f}", flush=True)

    def step(xx):
        y = fused_matvec(xx, codesT, cb, scales)  # [B, OUT]
        return xx + y[:, :IN] * 1e-3

    t = chain_time(step, x, n_steps=20, n_repeats=3)
    print(
        f"fused 2x8 dequant-matvec B={B}: {t*1e6:8.1f} us/layer "
        f"(dense baseline ~150 us; codes HBM {K*IG*OUT/1e6:.1f} MB)",
        flush=True,
    )
except Exception as e:
    import traceback

    print("fused 2x8 FAILED:", flush=True)
    traceback.print_exc()
