"""Probe 3: pin down XLA's fast fused gather->dot pattern.

Probe 1 saw take+matmul at ~12us (codes-HBM speed of light); probe 2 saw 13.5ms
when scales multiplied the gathered weight BEFORE the dot. Hypothesis: XLA has
a fused gather-operand dot emitter that pattern-matching breaks easily.
Scales are per-out-row, so apply them to the OUTPUT instead.
"""

import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

def timeit(fn, *args, iters=100, warmup=5):
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
scales = jax.random.uniform(key, (OUT,), jnp.float32, 0.5, 1.5).astype(jnp.bfloat16)


def fused(x, codes, cb, scales):
    w = jnp.take(cb, codes.astype(jnp.int32), axis=0).reshape(OUT, IN)
    y = x @ w.T
    return y * scales[None, :]


jf = jax.jit(fused)

# correctness
xs = jax.random.normal(key, (2, IN), jnp.bfloat16)
wnp = np.asarray(cb, np.float32)[np.asarray(codes).astype(np.int64)].reshape(OUT, IN)
ref = (np.asarray(xs, np.float32) @ wnp.T) * np.asarray(scales, np.float32)[None, :]
got = np.asarray(jf(xs, codes, cb, scales), np.float32)
print("correctness rel err:", np.abs(got - ref).max() / np.abs(ref).max(), flush=True)

for B in (1, 16, 256, 1024):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    for iters in (20, 200):
        t, _ = timeit(jf, x, codes, cb, scales, iters=iters)
        print(f"fused B={B} iters={iters}: {t*1e6:9.1f} us", flush=True)

# dense immediately after, same harness
Wd = jax.random.normal(key, (OUT, IN), jnp.bfloat16)
jd = jax.jit(lambda x, w: x @ w.T)
for B in (1, 256, 1024):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    t, _ = timeit(jd, x, Wd, iters=200)
    print(f"dense B={B}: {t*1e6:9.1f} us", flush=True)

# 2x8: sum of two gathers then dot
codes2 = jax.random.randint(key, (OUT, IG, 2), 0, 256, jnp.uint8)
cb2 = jax.random.normal(key, (2, 256, G), jnp.bfloat16)


def fused2(x, codes, cb, scales):
    w = (
        jnp.take(cb[0], codes[..., 0].astype(jnp.int32), axis=0)
        + jnp.take(cb[1], codes[..., 1].astype(jnp.int32), axis=0)
    ).reshape(OUT, IN)
    return (x @ w.T) * scales[None, :]


jf2 = jax.jit(fused2)
got = np.asarray(jf2(xs, codes2, cb2, scales), np.float32)
w2 = (
    np.asarray(cb2[0], np.float32)[np.asarray(codes2[..., 0]).astype(np.int64)]
    + np.asarray(cb2[1], np.float32)[np.asarray(codes2[..., 1]).astype(np.int64)]
).reshape(OUT, IN)
ref2 = (np.asarray(xs, np.float32) @ w2.T) * np.asarray(scales, np.float32)[None, :]
print("2x8 correctness rel err:", np.abs(got - ref2).max() / np.abs(ref2).max(), flush=True)
for B in (1, 256):
    x = jax.random.normal(key, (B, IN), jnp.bfloat16)
    t, _ = timeit(jf2, x, codes2, cb2, scales, iters=100)
    print(f"fused 2x8 B={B}: {t*1e6:9.1f} us", flush=True)

# what does the winning HLO look like?
txt = jf.lower(xs, codes, cb, scales).compile().as_text()
import re
fusions = re.findall(r"ROOT.*fusion.*|.*= (?:bf16|f32|s32)\[[^\]]*\] (?:dot|gather|custom-call)\(.*", txt)
print("key HLO ops:", flush=True)
for l in fusions[:15]:
    print("  ", l.strip()[:150], flush=True)
