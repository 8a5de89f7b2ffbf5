"""Split the int8 decode step: quantized matmuls vs attention vs norms vs
lm_head+sampler (the ~1.6 ms/token "glue" of NOTES.md:33, VERDICT r3 #5).

Monkeypatch ablation of forward_stacked on an 8-layer int8 7B slice (fused
qkv/gate-up + int8 lm_head, exactly bench.py's model construction):

  full       the real decode step (baseline)
  no-attn    attention_headmajor / flash read replaced by q-passthrough
             (KV writes still happen)
  no-quant   int8_matmul_indexed returns a tiled slice of x
  no-norm    rms_norm returns x unchanged
  no-head    lm_head + argmax replaced by a constant token

Per-variant chained decode steps; (full - variant) is that phase's cost.

Run: python experiments/int8_glue_split.py [n_layers]
"""

import dataclasses as dc
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_1X16
from aqlm_tpu.models import llama, stacked as stacked_mod
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.ops import runtime as runtime_mod
from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = dc.replace(llama.ModelConfig.llama2_7b(), num_layers=L)
print(f"backend: {jax.default_backend()}  L={L}", flush=True)

t0 = time.time()
params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_1X16, mode="int8")
params = quantize_lm_head_int8(fuse_projections(params, cfg, donate=True))
model = stack_layer_params(params, donate=True)
del params
jax.block_until_ready(model["embed"])
print(f"built {L}L int8 model in {time.time()-t0:.0f}s", flush=True)

_orig = dict(
    attn=stacked_mod.attention_headmajor,
    rms=stacked_mod.rms_norm,
    int8mm=runtime_mod.int8_matmul_indexed,
)


def _patch(variant):
    stacked_mod.attention_headmajor = _orig["attn"]
    stacked_mod.rms_norm = _orig["rms"]
    runtime_mod.int8_matmul_indexed = _orig["int8mm"]
    if variant == "no-attn":
        stacked_mod.attention_headmajor = lambda q, k, v, mask: q
    elif variant == "no-norm":
        stacked_mod.rms_norm = lambda x, w, eps=1e-5, plus_one=False: x
    elif variant == "no-quant":
        def fake(x, w8, s, idx, bias=None):
            out_f = w8.shape[1]
            reps = (1,) * (x.ndim - 1) + (-(-out_f // x.shape[-1]),)
            return jnp.tile(x, reps)[..., :out_f].astype(x.dtype)
        runtime_mod.int8_matmul_indexed = fake


def measure(variant, n=64):
    _patch(variant)
    no_head = variant == "no-head"

    @partial(jax.jit, static_argnames=("steps",))
    def decode_n(p, cache, tok, off, steps):
        def body(i, carry):
            tok, cache, off = carry
            logits, cache = forward_stacked(p, cfg, tok, cache=cache, cache_offset=off)
            if no_head:
                # lm_head is None -> logits are the final hidden; consume it
                # through a non-foldable predicate so the body is not DCE'd
                s = jnp.sum(logits[:, -1, :].astype(jnp.float32))
                nxt = jnp.where(jnp.isfinite(s), tok, tok + 1)
            else:
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, off + 1
        tok, cache, off = jax.lax.fori_loop(0, steps, body, (tok, cache, off))
        return tok

    # no-head needs the head skipped INSIDE forward; cheapest: drop lm_head
    p = model
    if no_head:
        p = dict(model)
        p["lm_head"] = None
        # forward returns hidden-as-logits in that case; argmax skipped above

    cache = init_kv_cache(cfg, 1, 256, quantized=True)
    tok0 = jnp.ones((1, 1), jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)

    def run(steps):
        t = decode_n(p, cache, tok0, off0, steps)
        return int(jax.device_get(t)[0, 0])

    run(n); run(0)
    ts = []
    for _ in range(3):
        t0 = time.time(); run(n); ts.append(time.time() - t0)
    base = []
    for _ in range(3):
        t0 = time.time(); run(0); base.append(time.time() - t0)
    dt = (sorted(ts)[1] - sorted(base)[1]) / n
    _patch("full")
    return dt


full = measure("full")
print(f"full: {full*1e3:.3f} ms/step ({full*1e3/L*32:.2f} ms at 32L-equiv)", flush=True)
for variant in ("no-attn", "no-quant", "no-norm", "no-head"):
    dt = measure(variant)
    print(f"{variant}: {dt*1e3:.3f} ms/step  (phase cost {1e3*(full-dt):.3f} ms)",
          flush=True)
