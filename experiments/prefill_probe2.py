"""r5 prefill kernel timings: amortized-dequant gather-prefill across batch
sizes + the slab-split down_proj shape.

r4 baseline (prefill_probe): fused gather-prefill 1.369 ms/call at gate
(11008x4096, 2x8, B=256); dequant alone 1.278 — >90% of the kernel. r5
changes: (a) the per-j table broadcast hoisted out of the lane-chunk loop,
(b) multi-batch-tile grids dequantize once per out-tile into a persistent
W^T scratch (batch tiles >0 reuse), (c) layers whose W^T column exceeds the
scratch cap split the contraction dim into slabs. Expected: ~same at B=256
(one tile), ~3-4x per token at B>=1024.

Run: python experiments/prefill_probe2.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aqlm_tpu.ops.gather_prefill import (
    _batch_tile, _slab_split, gather_prefill_matmul,
)
from aqlm_tpu.ops.kernels import fused_onehot_matmul
from aqlm_tpu.ops.lut_gemv import tile_codes
from aqlm_tpu.utils.timing import chain_time

K, G_, S = 2, 8, 256
TINY = bool(os.environ.get("AQLM_PROBE_TINY"))


def dep(x, y):
    return x + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)


def bench_shape(name, out_f, in_f, bs):
    ig = in_f // G_
    key = jax.random.PRNGKey(0)
    codes_t = jax.random.randint(key, (K, ig, out_f), 0, S, jnp.int32).astype(jnp.uint8)
    codes_tl = tile_codes(codes_t)
    cbs = jax.random.normal(key, (K, S, G_), jnp.float32) * 0.05
    scales = jnp.ones((out_f,), jnp.float32)
    kig, tn = codes_tl.shape[1], codes_tl.shape[2]

    # correctness once per shape (small batch)
    x8 = jax.random.normal(key, (8, in_f), jnp.bfloat16)
    y_ref = fused_onehot_matmul(x8, codes_t, cbs, scales, group=G_)
    y_new = gather_prefill_matmul(x8, codes_tl, cbs, scales, group=G_)
    rel = float(
        jnp.linalg.norm(y_new.astype(jnp.float32) - y_ref.astype(jnp.float32))
        / jnp.linalg.norm(y_ref.astype(jnp.float32))
    )
    assert rel < 2e-2, rel

    for b in bs:
        bp = (b + 7) // 8 * 8
        slabs, amortize = _slab_split(kig, K, G_, tn, bp // _batch_tile(bp))
        x0 = jax.random.normal(key, (b, in_f), jnp.bfloat16)

        def step(x, consts):
            ctl, cb, sc = consts
            y = gather_prefill_matmul(x, ctl, cb, sc, group=G_)
            return dep(x, y)

        t = chain_time(step, x0, n_steps=8, consts=(codes_tl, cbs, scales))
        print(f"{name} B={b}: {t*1e3:.3f} ms/call  "
              f"({t/b*1e6:.2f} us/token; slabs={len(slabs)} amortized={amortize})",
              flush=True)


if TINY:
    bench_shape("tiny", 512, 256, [8, 264])
else:
    bench_shape("gate 11008x4096", 11008, 4096, [256, 1024, 2048])
    bench_shape("down 4096x11008", 4096, 11008, [256, 1024])
print("DONE", flush=True)
