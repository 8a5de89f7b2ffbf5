"""Probe 2: validate XLA fused gather-matmul correctness + scaling; retry
Pallas gather as take_along_axis; measure GEMM (prefill) shapes."""

import sys, time

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
OUT, IN, G = 11008, 4096, 8
IG = IN // G
S = 2 ** 16
print("backend:", jax.default_backend(), flush=True)

codes = jax.random.randint(key, (OUT, IG), 0, S, jnp.int32).astype(jnp.uint16)
cb = jax.random.normal(key, (S, G), jnp.bfloat16)
scales = jax.random.uniform(key, (OUT, 1), jnp.float32, 0.5, 1.5)


def dequant_matmul(x, codes, cb, scales):
    w = jnp.take(cb, codes.astype(jnp.int32), axis=0).reshape(OUT, IN)
    w = w * scales.astype(w.dtype)
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


jf = jax.jit(dequant_matmul)

# correctness vs numpy
xs = jax.random.normal(key, (1, IN), jnp.bfloat16)
wnp = np.asarray(cb, np.float32)[np.asarray(codes).astype(np.int64)].reshape(OUT, IN)
wnp = wnp * np.asarray(scales)
ref = np.asarray(xs, np.float32) @ wnp.T
got = np.asarray(jf(xs, codes, cb, scales), np.float32)
rel = np.abs(got - ref).max() / np.abs(ref).max()
print("A correctness (bf16 vs f64-ish numpy): rel err", rel, flush=True)

for B in (1, 8, 64, 512, 2048):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    t, _ = timeit(jf, x, codes, cb, scales, iters=30)
    dense_flops = 2 * B * OUT * IN
    print(
        f"A gather-matmul B={B}: {t*1e6:8.1f} us   dense-equiv {dense_flops/t/1e12:6.1f} TFLOPs",
        flush=True,
    )

# dense comparison at same batches
Wd = jax.random.normal(key, (OUT, IN), jnp.bfloat16)
jd = jax.jit(lambda x, w: x @ w.T)
for B in (1, 512, 2048):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    t, _ = timeit(jd, x, Wd, iters=30)
    print(f"E dense B={B}: {t*1e6:8.1f} us   {2*B*OUT*IN/t/1e12:6.1f} TFLOPs", flush=True)

# 2x8 scheme via XLA: two gathers + add
S8 = 256
codes2 = jax.random.randint(key, (OUT, IG, 2), 0, S8, jnp.uint8)
cb2 = jax.random.normal(key, (2, S8, G), jnp.bfloat16)


def dequant2x8(x, codes, cb, scales):
    w = (
        jnp.take(cb[0], codes[..., 0].astype(jnp.int32), axis=0)
        + jnp.take(cb[1], codes[..., 1].astype(jnp.int32), axis=0)
    ).reshape(OUT, IN) * scales.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


jf2 = jax.jit(dequant2x8)
for B in (1, 512):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    t, _ = timeit(jf2, x, codes2, cb2, scales, iters=30)
    print(f"A2 2x8 gather-matmul B={B}: {t*1e6:8.1f} us", flush=True)

# Pallas gather via take_along_axis row-gather
N = 2048
table = jax.random.normal(key, (4096, 128), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 4096, jnp.int32)


def taa_kernel(idx_ref, table_ref, out_ref):
    ids = idx_ref[:].reshape(N, 1)
    ids = jnp.broadcast_to(ids, (N, 128))
    out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)


try:
    f = jax.jit(
        lambda idx, table: pl.pallas_call(
            taa_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)
    )
    t, out = timeit(f, idx, table)
    ok = np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
    print(f"B4 pallas take_along_axis row gather: {t*1e6:.1f} us  correct={ok}", flush=True)
except Exception as e:
    print(f"B4 FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)

# print the HLO of the fused op to see what XLA does (truncated)
txt = jax.jit(dequant_matmul).lower(xs, codes, cb, scales).compile().as_text()
lines = [l for l in txt.splitlines() if "fusion" in l or "gather" in l or "dot" in l]
print("HLO summary (first 25 matching lines):", flush=True)
for l in lines[:25]:
    print("  ", l[:160], flush=True)
