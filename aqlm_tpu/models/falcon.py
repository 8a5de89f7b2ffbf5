"""Falcon-style causal LM (parallel attention + MLP, MQA/GQA, LayerNorm).

The reference's falcon support lives in its model dispatch tables
(/root/reference/src/modelutils.py:17,140-176: FALCON_TYPES, get_layers over
`transformer.h`, sequential groups over query_key_value/dense/
dense_h_to_4h/dense_4h_to_h) — the architectural differences from llama are:

- PARALLEL block: one shared input LayerNorm feeds both attention and MLP,
  and both residual-add into x (falcon-7b `parallel_attn=True`,
  `num_ln_in_parallel_attn=1`);
- LayerNorm with bias (not RMSNorm);
- multi-query attention (falcon-7b: 1 shared KV head) — expressed here as
  GQA with num_kv_heads=1, which the shared attention helper handles;
- GELU MLP (dense_h_to_4h -> gelu -> dense_4h_to_h).

The fused query_key_value projection is split into q/k/v at import (same
exact-split treatment as phi3's qkv_proj in io/hf_import.py), so the generic
calibration pipeline quantizes each part independently.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear, apply_linear, attention, make_causal_mask, rope

__all__ = ["FalconConfig", "init_random_params", "forward", "block_forward_with_taps", "layer_norm"]


@dataclasses.dataclass(frozen=True)
class FalconConfig(llama.ModelConfig):
    ln_eps: float = 1e-5

    @classmethod
    def falcon_7b(cls) -> "FalconConfig":
        return cls(
            vocab_size=65024, hidden_size=4544, intermediate_size=4 * 4544,
            num_layers=32, num_heads=71, num_kv_heads=1,
            max_position_embeddings=2048, rope_theta=10000.0,
        )

    @classmethod
    def tiny(cls, **kw) -> "FalconConfig":
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=1, max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def init_random_params(key, cfg: FalconConfig, dtype=jnp.float32) -> dict:
    h, d = cfg.hidden_size, cfg.dim_per_head
    keys = jax.random.split(key, cfg.num_layers * 8 + 3)

    def dense(k, o, i):
        return DenseLinear(weight=(jax.random.normal(k, (o, i)) * 0.02).astype(dtype), bias=None)

    layers = []
    for li in range(cfg.num_layers):
        ks = keys[li * 8 : (li + 1) * 8]
        layers.append(
            dict(
                input_norm=jnp.ones((h,), dtype),
                input_norm_bias=jnp.zeros((h,), dtype),
                q_proj=dense(ks[0], cfg.num_heads * d, h),
                k_proj=dense(ks[1], cfg.num_kv_heads * d, h),
                v_proj=dense(ks[2], cfg.num_kv_heads * d, h),
                o_proj=dense(ks[3], h, cfg.num_heads * d),
                fc1=dense(ks[4], cfg.intermediate_size, h),
                fc2=dense(ks[5], h, cfg.intermediate_size),
            )
        )
    embed = (jax.random.normal(keys[-3], (cfg.vocab_size, h)) * 0.02).astype(dtype)
    return dict(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        final_norm_bias=jnp.zeros((h,), dtype),
        lm_head=dense(keys[-2], cfg.vocab_size, h),
    )


def _block(x, layer, cfg: FalconConfig, positions):
    b, t, h = x.shape
    d = cfg.dim_per_head
    xn = layer_norm(x, layer["input_norm"], layer["input_norm_bias"], cfg.ln_eps)
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    q, k = rope(q, k, positions, cfg.rope_theta)
    attn = attention(q, k, v, make_causal_mask(positions, positions)).reshape(b, t, -1)
    attn_out = apply_linear(attn, layer["o_proj"])
    mlp = apply_linear(
        jax.nn.gelu(apply_linear(xn, layer["fc1"]).astype(jnp.float32)).astype(x.dtype),
        layer["fc2"],
    )
    # parallel residual: both branches add into the SAME input
    return x + attn_out + mlp


def block_forward_with_taps(x, layer, cfg: FalconConfig, positions):
    """Calibration taps for the parallel block (pipeline contract)."""
    b, t, h = x.shape
    d = cfg.dim_per_head
    taps = {}
    xn = layer_norm(x, layer["input_norm"], layer["input_norm_bias"], cfg.ln_eps)
    taps["q_proj"] = taps["k_proj"] = taps["v_proj"] = taps["fc1"] = xn
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    q, k = rope(q, k, positions, cfg.rope_theta)
    attn = attention(q, k, v, make_causal_mask(positions, positions)).reshape(b, t, -1)
    taps["o_proj"] = attn
    attn_out = apply_linear(attn, layer["o_proj"])
    fc1_out = jax.nn.gelu(apply_linear(xn, layer["fc1"]).astype(jnp.float32)).astype(x.dtype)
    taps["fc2"] = fc1_out
    mlp = apply_linear(fc1_out, layer["fc2"])
    return x + attn_out + mlp, taps


def forward(params: dict, cfg: FalconConfig, input_ids: jax.Array, *, positions=None,
            return_hidden: bool = False, remat_blocks: bool = False, **_):
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = jnp.take(params["embed"], input_ids, axis=0)
    block = _block
    if remat_blocks:  # PV training: recompute block activations in backward
        block = jax.checkpoint(block, static_argnums=(2,))
    for layer in params["layers"]:
        x = block(x, layer, cfg, positions)
    x = layer_norm(x, params["final_norm"], params["final_norm_bias"], cfg.ln_eps)
    if return_hidden:  # PV chunked-KL path (pv/losses.py applies the head)
        return x, None
    logits = apply_linear(x, params["lm_head"])
    return logits, None
