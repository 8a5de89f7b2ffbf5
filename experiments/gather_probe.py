"""On-chip probe: which codebook-gather strategy is viable on TPU.

AQLM dequant is gather-dominated (codes index a 2^16- or 2^8-entry codebook).
TPUs have no general hardware gather, so the kernel design hinges on what
Mosaic/XLA actually support fast. This script measures, on the real chip:

  A. XLA (non-Pallas) take_along_axis dequant of a 7B-size layer + matmul
  B. Pallas sublane dynamic_gather: jnp.take(table[4096,128], idx, axis=0)
  C. Pallas lane extraction: take_along_axis(rows[N,128], lane_idx[N,8], 1)
  D. Pallas one-hot MXU gather for 256-entry codebooks (Kx8 schemes)
  E. dense bf16 matvec baseline (the number to beat)

Run: python experiments/gather_probe.py
"""

import sys, time, functools

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


key = jax.random.PRNGKey(0)
OUT, IN = 11008, 4096  # llama-2-7b gate_proj
G = 8
IG = IN // G
S = 2 ** 16

print("backend:", jax.default_backend(), flush=True)

# ---------------- E: dense baseline ----------------
wk, xk = jax.random.split(key)
Wd = jax.random.normal(wk, (OUT, IN), jnp.bfloat16)
x = jax.random.normal(xk, (1, IN), jnp.bfloat16)
dense = jax.jit(lambda x, w: x @ w.T)
t, _ = timeit(dense, x, Wd)
print(f"E dense bf16 matvec {OUT}x{IN}: {t*1e6:.1f} us  ({OUT*IN*2/t/1e9:.0f} GB/s)", flush=True)

# ---------------- A: XLA gather dequant + matmul ----------------
codes = jax.random.randint(key, (OUT, IG), 0, S, jnp.int32).astype(jnp.uint16)
cb = jax.random.normal(key, (S, G), jnp.bfloat16)


@jax.jit
def xla_dequant_matmul(x, codes, cb):
    w = jnp.take(cb, codes.astype(jnp.int32), axis=0)  # [OUT, IG, G]
    w = w.reshape(OUT, IN)
    return x @ w.T


t, _ = timeit(xla_dequant_matmul, x, codes, cb)
print(f"A XLA take+matmul: {t*1e6:.1f} us", flush=True)


# ---------------- B: Pallas sublane dynamic_gather ----------------
# table [4096, 128] f32; gather N=2048 rows
def sub_gather_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


N = 2048
table = jax.random.normal(key, (4096, 128), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 4096, jnp.int32)

try:
    f = jax.jit(
        lambda idx, table: pl.pallas_call(
            sub_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)
    )
    t, out = timeit(f, idx, table)
    ref = np.asarray(table)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), ref)
    print(f"B pallas sublane gather [4096,128]->[{N},128]: {t*1e6:.1f} us  correct={ok}"
          f"  ({N*128*4/t/1e9:.0f} GB/s out)", flush=True)
except Exception as e:
    print(f"B pallas sublane gather FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

# B2: bf16 table
try:
    table_bf = table.astype(jnp.bfloat16)
    f = jax.jit(
        lambda idx, table: pl.pallas_call(
            sub_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)
    )
    t, out = timeit(f, idx, table_bf)
    ref = np.asarray(table_bf)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), ref)
    print(f"B2 pallas sublane gather bf16: {t*1e6:.1f} us  correct={ok}", flush=True)
except Exception as e:
    print(f"B2 bf16 sublane gather FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- C: Pallas lane extraction ----------------
def lane_gather_kernel(rows_ref, lidx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(rows_ref[:], lidx_ref[:], axis=1)


rows = jax.random.normal(key, (N, 128), jnp.float32)
base = jax.random.randint(key, (N, 1), 0, 16, jnp.int32) * G
lidx = base + jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
try:
    f = jax.jit(
        lambda rows, lidx: pl.pallas_call(
            lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((N, G), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rows, lidx)
    )
    t, out = timeit(f, rows, lidx)
    ref = np.take_along_axis(np.asarray(rows), np.asarray(lidx), axis=1)
    ok = np.allclose(np.asarray(out), ref)
    print(f"C pallas lane take_along_axis [N,128]->[N,8]: {t*1e6:.1f} us  correct={ok}", flush=True)
except Exception as e:
    print(f"C lane gather FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- D: one-hot MXU gather (256-entry) ----------------
def onehot_kernel(codes_ref, cb_ref, out_ref):
    codes = codes_ref[:]  # [N, 1] int32
    onehot = (codes == jax.lax.broadcasted_iota(jnp.int32, (N, 256), 1)).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(onehot, cb_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )


cb8 = jax.random.normal(key, (256, 128), jnp.bfloat16)
codes8 = jax.random.randint(key, (N, 1), 0, 256, jnp.int32)
try:
    f = jax.jit(
        lambda c, cb: pl.pallas_call(
            onehot_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c, cb)
    )
    t, out = timeit(f, codes8, cb8)
    ref = np.asarray(cb8)[np.asarray(codes8)[:, 0]]
    ok = np.allclose(np.asarray(out), ref)
    print(f"D pallas one-hot MXU gather [256]->[{N},128]: {t*1e6:.1f} us  correct={ok}", flush=True)
except Exception as e:
    print(f"D one-hot FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- B3: big-table gather, full dequant-size workload ----------------
# Gather ALL codes of the layer in tiles: total OUT*IG = 5.6M gathers of 8 values.
def tile_gather_kernel(codes_ref, table_ref, out_ref):
    hi = (codes_ref[:] >> 4).astype(jnp.int32)  # [TN, IG]
    rows = jnp.take(table_ref[:], hi.reshape(-1), axis=0)  # [TN*IG, 128]
    lo = (codes_ref[:] & 15).astype(jnp.int32).reshape(-1, 1) * G
    lidx = lo + jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], G), 1)
    vals = jnp.take_along_axis(rows, lidx, axis=1)  # [TN*IG, 8]
    out_ref[:] = vals.reshape(codes_ref.shape[0], IG * G)


TN = 128
packed_table = jax.random.normal(key, (4096, 128), jnp.float32)
codes32 = codes.astype(jnp.int32)
try:
    f = jax.jit(
        lambda c, tb: pl.pallas_call(
            tile_gather_kernel,
            grid=(OUT // TN,),
            in_specs=[
                pl.BlockSpec((TN, IG), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, IN), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OUT, IN), jnp.float32),
        )(c, tb)
    )
    t, out = timeit(f, codes32, packed_table, iters=20)
    # spot check correctness
    c0 = int(np.asarray(codes32)[0, 0])
    exp = np.asarray(packed_table)[c0 >> 4, (c0 & 15) * G : (c0 & 15) * G + G]
    got = np.asarray(out)[0, :G]
    print(
        f"B3 pallas full-layer 1x16 dequant ({OUT}x{IN}): {t*1e6:.1f} us  "
        f"correct={np.allclose(got, exp)}  (dense-equiv {OUT*IN*2/t/1e9:.0f} GB/s)",
        flush=True,
    )
except Exception as e:
    print(f"B3 full dequant FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
