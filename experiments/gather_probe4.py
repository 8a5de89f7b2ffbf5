"""Probe 4 (chained timing): the real design space for AQLM dequant on v5e.

Measures with data-dependent chains inside one jit (see utils/timing.py):
  1. dense bf16 matvec/GEMM         (baseline)
  2. XLA gather dequant-matmul 1x16  (expected slow: gather-rate-bound)
  3. gather throughput vs row width  (8 / 32 / 128 lanes) -> cost model
  4. one-hot MXU dequant GEMM, 256-entry codebook (2x8-style), pure XLA
  5. same as Pallas kernel (fused, VMEM codebook)
  6. int8 weight x bf16 activation dense (the '1x16 served as int8' fallback)
"""

import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aqlm_tpu.utils.timing import chain_time

key = jax.random.PRNGKey(0)
OUT, IN, G = 11008, 4096, 8
IG = IN // G
print("backend:", jax.default_backend(), flush=True)


def report(name, t, hbm_bytes=None, flops=None):
    extra = ""
    if hbm_bytes:
        extra += f"  {hbm_bytes/t/1e9:7.0f} GB/s"
    if flops:
        extra += f"  {flops/t/1e12:6.1f} TFLOPs"
    print(f"{name:55s} {t*1e6:9.1f} us{extra}", flush=True)


# 1. dense baseline: gate(x) then down(gate) keeps shapes cycling
W1 = jax.random.normal(key, (OUT, IN), jnp.bfloat16)
W2 = jax.random.normal(key, (IN, OUT), jnp.bfloat16)
for B in (1, 256):
    x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

    def step(x):
        h = x @ W1.T
        return (h @ W2.T) * 1e-3

    t = chain_time(step, x0, n_steps=30) / 2  # two matmuls per step
    report(f"1 dense bf16 {OUT}x{IN} B={B}", t, hbm_bytes=OUT * IN * 2, flops=2 * B * OUT * IN)

# 2. XLA gather dequant matvec (1x16)
S = 2 ** 16
codes1 = jax.random.randint(key, (OUT, IG), 0, S, jnp.int32).astype(jnp.uint16)
codes1b = jax.random.randint(key, (IN, OUT // G), 0, S, jnp.int32).astype(jnp.uint16)
cb = jax.random.normal(key, (S, G), jnp.bfloat16)
for B in (1,):
    x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

    def step(x):
        w1 = jnp.take(cb, codes1.astype(jnp.int32), axis=0).reshape(OUT, IN)
        h = x @ w1.T
        w2 = jnp.take(cb, codes1b.astype(jnp.int32), axis=0).reshape(IN, OUT)
        return (h @ w2.T) * 1e-3

    t = chain_time(step, x0, n_steps=6, n_repeats=2) / 2
    report(f"2 XLA gather-dequant 1x16 matvec B={B}", t, hbm_bytes=OUT * IG * 2)

# 3. raw XLA gather throughput vs row width
for width, rows in ((8, 65536), (32, 16384), (128, 4096)):
    NROWS = 1 << 20  # 1M gathers
    table = jax.random.normal(key, (rows, width), jnp.bfloat16)
    idx0 = jax.random.randint(key, (NROWS,), 0, rows, jnp.int32)

    def step(idx):
        g = jnp.take(table, idx, axis=0)  # [NROWS, width]
        # data-dependent next index to prevent hoisting
        return (idx + g[:, 0].astype(jnp.int32)) % rows

    t = chain_time(step, idx0, n_steps=10, n_repeats=2)
    rate = NROWS / t
    report(f"3 gather rate width={width} ({rows} rows)", t)
    print(f"      -> {rate/1e6:8.1f} M rows/s   {rate*width/1e9:6.2f} G values/s", flush=True)

# 4. one-hot MXU dequant (256-entry codebooks, XLA)
S8 = 256
codesA = jax.random.randint(key, (OUT, IG), 0, S8, jnp.int32).astype(jnp.uint8)
codesB = jax.random.randint(key, (IN, OUT // G), 0, S8, jnp.int32).astype(jnp.uint8)
cb8 = jax.random.normal(key, (S8, G), jnp.bfloat16)


def onehot_dequant(codes, cb8, n_out, n_in):
    oh = jax.nn.one_hot(codes.astype(jnp.int32), S8, dtype=jnp.bfloat16)  # [o, ig, S8]
    return jnp.einsum(
        "ois,sg->oig", oh, cb8, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).reshape(n_out, n_in)


for B in (1, 256):
    x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

    def step(x):
        w1 = onehot_dequant(codesA, cb8, OUT, IN)
        h = x @ w1.T
        w2 = onehot_dequant(codesB, cb8, IN, OUT)
        return (h @ w2.T) * 1e-3

    t = chain_time(step, x0, n_steps=10, n_repeats=2) / 2
    report(f"4 XLA one-hot dequant+mm S=256 B={B}", t, hbm_bytes=OUT * IG, flops=2 * OUT * IN * (S8 / 2 + B))

# 5. Pallas fused one-hot dequant GEMM (single codebook, 256)
TN, TK = 256, 2048  # out-tile, in-tile


def fused_kernel(codes_ref, cb_ref, x_ref, out_ref, acc_ref):
    ig_per_tile = TK // G
    codes = codes_ref[:].astype(jnp.int32)  # [TN, ig_per_tile]
    oh = (
        codes[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (TN, ig_per_tile, S8), 2)
    ).astype(jnp.bfloat16)
    w = jax.lax.dot_general(
        oh.reshape(TN * ig_per_tile, S8),
        cb_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(TN, TK)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def pallas_dequant_mm(x, codes, cb8):
    B = x.shape[0]
    TB = min(B, 256)
    return pl.pallas_call(
        fused_kernel,
        grid=(B // TB if B >= TB else 1, OUT // TN, IN // TK),
        in_specs=[
            pl.BlockSpec((TN, TK // G), lambda b, o, k: (o, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TK), lambda b, o, k: (b, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda b, o, k: (b, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TB, TN), jnp.float32)],
    )(codes, cb8, x)


# correctness first
xs = jax.random.normal(key, (8, IN), jnp.bfloat16)
try:
    got = np.asarray(pallas_dequant_mm(xs, codesA, cb8), np.float32)
    wref = np.asarray(cb8, np.float32)[np.asarray(codesA).astype(np.int64)].reshape(OUT, IN)
    ref = np.asarray(xs, np.float32) @ wref.T
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"5 pallas fused correctness rel err: {rel:.5f}", flush=True)
    for B in (8, 256):
        x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

        def step(x):
            y = pallas_dequant_mm(x, codesA, cb8)  # [B, OUT]
            return x + y[:, :IN] * 1e-3

        t = chain_time(step, x0, n_steps=10, n_repeats=2)
        report(f"5 Pallas one-hot fused GEMM S=256 B={B}", t, hbm_bytes=OUT * IG)
except Exception as e:
    print(f"5 pallas fused FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)

# 6. int8-weight dense (serving cache for 1x16)
W8 = jax.random.randint(key, (OUT, IN), -127, 127, jnp.int8)
W8b = jax.random.randint(key, (IN, OUT), -127, 127, jnp.int8)
sc = jax.random.uniform(key, (OUT,), jnp.float32)
scb = jax.random.uniform(key, (IN,), jnp.float32)
for B in (1, 256):
    x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

    def step(x):
        h = (x @ W8.T.astype(jnp.bfloat16)) * sc.astype(jnp.bfloat16)
        return ((h @ W8b.T.astype(jnp.bfloat16)) * scb.astype(jnp.bfloat16)) * 1e-3

    t = chain_time(step, x0, n_steps=20, n_repeats=2) / 2
    report(f"6 int8-weight dense B={B}", t, hbm_bytes=OUT * IN)
