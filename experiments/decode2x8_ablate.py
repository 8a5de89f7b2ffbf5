"""Ablate the 2x8 codes decode step to find the ~540 us/layer split.

Variants of a forward_stacked-equivalent step (8-layer 7B, int8 KV, 256 ctx):
  full       everything (baseline)
  no-attn    attention+KV replaced by pass-through
  no-quant   all 7 quantized matmuls replaced by slicing (attn+glue only)
  no-lutb    LUT build replaced by a cached table + epsilon dependence
             (kernel gathers still run; isolates the lut einsum/pad cost)
"""

import sys, time, dataclasses as dc
from functools import partial

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.common import make_causal_mask, rms_norm, rope
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import (
    KVCache, _dequantize_kv, _quantize_kv, attention_headmajor,
    init_kv_cache, stack_layer_params,
)
from aqlm_tpu.ops.lut_gemv import _call_indexed, _build_lut
from aqlm_tpu.ops.runtime import IndexedQuantizedLinear, QuantizedLinear, quantized_matmul_indexed

cfg = dc.replace(llama.ModelConfig(), num_layers=8)
print("backend:", jax.default_backend(), flush=True)

params = random_quantized_params(jax.random.PRNGKey(1), cfg, SCHEME_2X8, mode="codes")
stacked = stack_layer_params(params, donate=True)
del params
G = SCHEME_2X8.in_group_size


def make_forward(variant):
    d = cfg.dim_per_head

    def qmm(x, name, layers, i):
        q: QuantizedLinear = layers[name]
        if variant == "no-quant":
            out_f = q.codes_tl.shape[1] * q.codes_tl.shape[3]  # [L,NT,KIG,tn]
            reps = -(-out_f // x.shape[-1])
            return jnp.tile(x, (1, reps))[:, :out_f]
        if variant == "no-lutb":
            cbs = q.codebooks[0]
            lo, hi = _build_lut(x[:, : q.codes_tl.shape[2] // SCHEME_2X8.num_codebooks * G].astype(jnp.bfloat16) * 0 + 1.0, cbs, G)
            eps = (x[0, 0] * 1e-30).astype(jnp.float32)
            lo = lo + eps
            y = _call_indexed(q.codes_tl, lo, hi if hi is not None else None, jnp.asarray(i, jnp.int32), interpret=False)
            scales = jax.lax.dynamic_index_in_dim(q.scales, i, 0, keepdims=False)
            return (y * scales[None, :]).astype(x.dtype)
        return quantized_matmul_indexed(x, IndexedQuantizedLinear(stacked=q, idx=i))

    def forward(p, tokens, cache_kv, offsets):
        b, t = tokens.shape
        positions = offsets[:, None] + jnp.arange(t)[None, :]
        x = jnp.take(p["embed"], tokens, axis=0)
        layers = p["layers"]
        max_len = cache_kv[0].shape[2 + 1]
        key_pos = jnp.broadcast_to(jnp.arange(max_len)[None, :], (b, max_len))
        mask = make_causal_mask(positions, key_pos)
        qnames = [n for n, v in layers.items() if isinstance(v, QuantizedLinear)]
        rest = {n: v for n, v in layers.items() if n not in qnames}
        ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

        def block(carry, scan_in):
            x = carry
            i, rest_i, kv = scan_in
            res = x
            xn = rms_norm(x, rest_i["input_norm"], cfg.rms_eps)
            q = qmm(xn[:, 0], "q_proj", layers, i).reshape(b, t, cfg.num_heads, d)
            k = qmm(xn[:, 0], "k_proj", layers, i).reshape(b, t, cfg.num_kv_heads, d)
            v = qmm(xn[:, 0], "v_proj", layers, i).reshape(b, t, cfg.num_kv_heads, d)
            if variant == "no-attn":
                attn = q
                new_kv = kv
            else:
                q, k = rope(q, k, positions, cfg.rope_theta)
                k_c, v_c, ks_c, vs_c = kv
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                wr = lambda c, n_, off: jax.vmap(
                    lambda cc, xx, o: jax.lax.dynamic_update_slice_in_dim(cc, xx, o, axis=1)
                )(c, jnp.moveaxis(n_, 1, 2), off)
                k_c = wr(k_c, k8, offsets)
                v_c = wr(v_c, v8, offsets)
                ks_c = wr(ks_c, ks[..., None], offsets)
                vs_c = wr(vs_c, vs[..., None], offsets)
                new_kv = (k_c, v_c, ks_c, vs_c)
                k_all = _dequantize_kv(k_c, ks_c, q.dtype)
                v_all = _dequantize_kv(v_c, vs_c, q.dtype)
                attn = attention_headmajor(q, k_all, v_all, mask)
            attn = attn.astype(x.dtype).reshape(b, t, -1)
            x = res + qmm(attn[:, 0], "o_proj", layers, i)[:, None, :]
            res = x
            xn = rms_norm(x, rest_i["post_attn_norm"], cfg.rms_eps)
            g = qmm(xn[:, 0], "gate_proj", layers, i)
            u = qmm(xn[:, 0], "up_proj", layers, i)
            mlp = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
            x = res + qmm(mlp, "down_proj", layers, i)[:, None, :]
            return x, new_kv

        x, kv_out = jax.lax.scan(block, x, (ids, rest, cache_kv))
        x = rms_norm(x, p["final_norm"], cfg.rms_eps)
        logits = jnp.einsum("bth,vh->btv", x, p["lm_head"].weight.astype(x.dtype),
                            preferred_element_type=jnp.float32)
        return logits, kv_out

    return forward


def measure(variant):
    fwd = make_forward(variant)
    cache = init_kv_cache(cfg, 1, 256, quantized=True)
    kv = (cache.k, cache.v, cache.k_scale, cache.v_scale)
    tok0 = jnp.zeros((1, 1), jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def decode(p, kv, tok, offsets, n):
        def body(i, carry):
            tok, kv, off = carry
            logits, kv = fwd(p, tok, kv, off)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return nxt, kv, off + 1
        tok, kv, offsets = jax.lax.fori_loop(0, n, body, (tok, kv, offsets))
        return tok

    def run(n):
        return int(jax.device_get(decode(stacked, kv, tok0, off0, n))[0, 0])

    run(16); run(0)
    t0 = time.time(); run(16); t16 = time.time() - t0
    t0 = time.time(); run(0); tb = time.time() - t0
    ms = (t16 - tb) / 16 * 1e3
    print(f"{variant:8s}: {ms:.2f} ms/8L ({ms/8*1e3:.0f} us/layer)", flush=True)


for v in ["full", "no-attn", "no-quant", "no-lutb"]:
    try:
        measure(v)
    except Exception as e:
        print(v, "failed:", repr(e)[:300], flush=True)
