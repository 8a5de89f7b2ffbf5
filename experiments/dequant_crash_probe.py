"""Isolate the PV scan worker crash: is the per-iteration XLA dequant gather
the op that kills the TPU worker after ~60-90 executions?

Facts (queue_r4c): the PV scan FORWARD alone crashes the worker at L=16
(112 dequants) but passed at L=8 (56) — independent of remat mode, ST
window, T (64 vs 256), and segmentation (2x8-deep scans fault like 1x16).
The per-iteration op unique to the PV body is dequantize_weight's
take_along_axis with BROADCAST indices ([k, o*i, N] — a ~360 MB int32
index materialization per 7B gate projection).

This probe runs N dequants in a fori_loop over a stacked codes array
(dynamic-sliced per step, like scan xs) with NO model around them, ramping
N, for each variant:

  A  current dequantize_weight (broadcast-index gather)
  B  per-j gather loop (8 gathers with [k, 1, N] indices, no broadcast)
  C  Pallas one-hot MXU dequant (ops/kernels.dequantize_onehot)
  D  Pallas gather dequant over tiled codes (ops/gather_prefill.gather_dequant_wt)
  E  segment_sum scatter-add at codebook-grad scale (dcb[k,s,:] = sum of
     dW groups with code s) — is XLA scatter affected like gather?

r4d verdict: A and B CRASH the worker between n=32 and n=64; C and D
survive 256 — the XLA gather op at this scale is the faulting primitive.

Run: python experiments/dequant_crash_probe.py [variant] [n_calls]
(one variant per process — a crash must not poison the next).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight

variant = sys.argv[1] if len(sys.argv) > 1 else "A"
n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 128
OUT, IN = 11008, 4096
if os.environ.get("AQLM_PROBE_TINY"):
    OUT, IN = 512, 256
K, S, G = 2, 256, 8
IG = IN // G
L = 8  # distinct codes arrays cycled (matches the scan's xs slicing)

print(f"backend: {jax.default_backend()} variant={variant} n={n_calls}", flush=True)

key = jax.random.PRNGKey(0)
codes_l = jax.random.randint(key, (L, OUT, IG, K), 0, S, jnp.int32).astype(jnp.uint8)
cbs = jax.random.normal(key, (K, S, 1, G), jnp.float32) * 0.05
scales = jnp.ones((OUT,), jnp.float32)

if variant == "C":
    from aqlm_tpu.ops.kernels import dequantize_onehot

    codes_t_l = codes_l.astype(jnp.int32).transpose(0, 3, 2, 1).astype(jnp.uint8)
elif variant == "D":
    from aqlm_tpu.ops.gather_prefill import gather_dequant_wt
    from aqlm_tpu.ops.lut_gemv import tile_codes

    ct = codes_l.astype(jnp.int32).transpose(0, 3, 2, 1).astype(jnp.uint8)
    codes_tl_l = jnp.stack([tile_codes(ct[i]) for i in range(L)])


def dequant_b(codes, cb, sc):
    """Per-j gather loop: no broadcast index materialization."""
    og, ig, k = codes.shape
    n = og * ig
    idx = codes.astype(jnp.int32).transpose(2, 0, 1).reshape(k, 1, n)
    cb_t = cb.reshape(k, -1, G).transpose(0, 2, 1)  # [k, G, S]
    acc = 0
    parts = []
    for j in range(G):
        gj = jnp.take_along_axis(cb_t[:, j : j + 1, :], idx, axis=2)  # [k,1,n]
        parts.append(gj.sum(axis=0))
    groups = jnp.concatenate(parts, axis=0)  # [G, N]
    w = groups.T.reshape(og, ig, 1, G) * sc.reshape(og, 1, 1, 1)
    return w.transpose(0, 2, 1, 3).reshape(og, ig * G)


@partial(jax.jit, static_argnames=("n",))
def run(codes_src, cb, sc, n):
    def body(i, acc):
        li = i % L
        if variant == "E":
            codes = jax.lax.dynamic_index_in_dim(codes_src, li, 0, keepdims=False)
            # codebook-grad shaped scatter: dcb[k*S + code] += dW_group
            flat = codes.astype(jnp.int32).transpose(2, 0, 1).reshape(K, -1)
            seg = (flat + (jnp.arange(K, dtype=jnp.int32) * S)[:, None]).reshape(-1)
            dw = jnp.ones((seg.shape[0], G), jnp.float32) * (1.0 + acc * 0)
            dcb = jax.ops.segment_sum(dw, seg, num_segments=K * S)
            return acc + jnp.sum(dcb) * 1e-12
        if variant in ("A", "B"):
            codes = jax.lax.dynamic_index_in_dim(codes_src, li, 0, keepdims=False)
            if variant == "A":
                w = dequantize_weight(
                    AqlmWeight(codes=codes, codebooks=cb, scales=sc, bias=None,
                               scheme=SCHEME_2X8), dtype=jnp.bfloat16,
                    impl="xla")  # the probe MUST exercise the crashing path
            else:
                w = dequant_b(codes, cb, sc).astype(jnp.bfloat16)
        elif variant == "C":
            ct = jax.lax.dynamic_index_in_dim(codes_src, li, 0, keepdims=False)
            w = dequantize_onehot(ct, cb[:, :, 0, :], sc, group=G)
        else:
            ctl = jax.lax.dynamic_index_in_dim(codes_src, li, 0, keepdims=False)
            w = gather_dequant_wt(ctl, cb[:, :, 0, :], sc)
        return acc + jnp.sum(w.astype(jnp.float32)) * 1e-9

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


src = {"A": codes_l, "B": codes_l, "E": codes_l,
       "C": codes_t_l if variant == "C" else None,
       "D": codes_tl_l if variant == "D" else None}[variant]

for n in (8, 32, 64, 96, 128, 192, 256):
    if n > n_calls:
        break
    t0 = time.time()
    val = float(jax.device_get(run(src, cbs, scales, n)))
    print(f"  n={n}: OK {time.time()-t0:.1f}s val={val:.3f}", flush=True)
print(f"variant {variant}: survived {min(n_calls, 256)} dequants", flush=True)
