"""Cohere (Command-R) causal LM: parallel attention+MLP block, bias-free
mean-centered LayerNorm, interleaved rope, SwiGLU MLP, tied lm_head with
logit_scale.

The reference supports cohere purely through its dispatch tables
(/root/reference/src/modelutils.py:17 LLAMA_LIKE includes "cohere",
:159-176 sequential groups) — the block math it relies on lives in HF
transformers. Architectural deltas from our llama.py family:

- PARALLEL block (like falcon.py): one shared input LayerNorm feeds both
  attention and the SwiGLU MLP; both residual-add into x.
- CohereLayerNorm: mean-centered, variance-normalized, WEIGHT ONLY (no
  bias) — unlike RMSNorm it subtracts the mean.
- INTERLEAVED rope (x[2i], x[2i+1] pairs), not llama's half-split.
- optional per-head qk-norm over head_dim (command-r-plus).
- logits = (x @ embed.T) * logit_scale (tied embeddings).

Quantizable projections are the llama seven (q/k/v/o/gate/up/down), so the
generic calibration pipeline and serving runtimes apply unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear, apply_linear, attention, make_causal_mask

__all__ = ["CohereConfig", "init_random_params", "forward", "block_forward_with_taps",
           "cohere_layer_norm", "rope_interleaved"]


@dataclasses.dataclass(frozen=True)
class CohereConfig(llama.ModelConfig):
    ln_eps: float = 1e-5
    logit_scale: float = 1.0
    use_qk_norm: bool = False

    @classmethod
    def command_r(cls) -> "CohereConfig":
        return cls(
            vocab_size=256000, hidden_size=8192, intermediate_size=22528,
            num_layers=40, num_heads=64, num_kv_heads=64,
            max_position_embeddings=8192, rope_theta=8_000_000.0,
            logit_scale=0.0625,
        )

    @classmethod
    def tiny(cls, **kw) -> "CohereConfig":
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2,
            max_position_embeddings=128, logit_scale=0.125,
        )
        defaults.update(kw)
        return cls(**defaults)


def cohere_layer_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Mean-centered variance norm with weight only (CohereLayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def rope_interleaved(q, k, positions, theta):
    """Rotary embedding over INTERLEAVED pairs (x[2i], x[2i+1]).

    transformers' cohere rotate_half stacks even/odd lanes, vs llama's
    half-split; freqs repeat per consecutive lane pair."""
    d = q.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[..., None].astype(jnp.float32) * freqs  # [b, t, d/2]
    cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.stack([o1, o2], axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def init_random_params(key, cfg: CohereConfig, dtype=jnp.float32) -> dict:
    h, d = cfg.hidden_size, cfg.dim_per_head
    keys = jax.random.split(key, cfg.num_layers * 8 + 2)

    def dense(k, o, i):
        return DenseLinear(weight=(jax.random.normal(k, (o, i)) * 0.02).astype(dtype), bias=None)

    layers = []
    for li in range(cfg.num_layers):
        ks = keys[li * 8 : (li + 1) * 8]
        layer = dict(
            input_norm=jnp.ones((h,), dtype),
            q_proj=dense(ks[0], cfg.num_heads * d, h),
            k_proj=dense(ks[1], cfg.num_kv_heads * d, h),
            v_proj=dense(ks[2], cfg.num_kv_heads * d, h),
            o_proj=dense(ks[3], h, cfg.num_heads * d),
            gate_proj=dense(ks[4], cfg.intermediate_size, h),
            up_proj=dense(ks[5], cfg.intermediate_size, h),
            down_proj=dense(ks[6], h, cfg.intermediate_size),
        )
        if cfg.use_qk_norm:
            layer["q_norm"] = jnp.ones((cfg.num_heads, d), dtype)
            layer["k_norm"] = jnp.ones((cfg.num_kv_heads, d), dtype)
        layers.append(layer)
    embed = (jax.random.normal(keys[-2], (cfg.vocab_size, h)) * 0.02).astype(dtype)
    # lm_head is TIED to embed; params carry only the embedding table
    return dict(embed=embed, layers=layers, final_norm=jnp.ones((h,), dtype))


def _attn_mlp(x, layer, cfg: CohereConfig, positions):
    """Shared parallel-branch math; returns (attn_out, mlp_out, taps)."""
    b, t, h = x.shape
    d = cfg.dim_per_head
    taps = {}
    xn = cohere_layer_norm(x, layer["input_norm"], cfg.ln_eps)
    taps["q_proj"] = taps["k_proj"] = taps["v_proj"] = xn
    taps["gate_proj"] = taps["up_proj"] = xn
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    if cfg.use_qk_norm:  # per-head LayerNorm over head_dim (command-r-plus)
        q = cohere_layer_norm(q, layer["q_norm"], cfg.ln_eps)
        k = cohere_layer_norm(k, layer["k_norm"], cfg.ln_eps)
    q, k = rope_interleaved(q, k, positions, cfg.rope_theta)
    attn = attention(q, k, v, make_causal_mask(positions, positions)).reshape(b, t, -1)
    taps["o_proj"] = attn
    attn_out = apply_linear(attn, layer["o_proj"])
    gate = apply_linear(xn, layer["gate_proj"]).astype(jnp.float32)
    up = apply_linear(xn, layer["up_proj"]).astype(jnp.float32)
    hidden = (jax.nn.silu(gate) * up).astype(x.dtype)
    taps["down_proj"] = hidden
    mlp = apply_linear(hidden, layer["down_proj"])
    return attn_out, mlp, taps


def block_forward_with_taps(x, layer, cfg: CohereConfig, positions):
    """Calibration taps for the parallel block (pipeline contract)."""
    attn_out, mlp, taps = _attn_mlp(x, layer, cfg, positions)
    return x + attn_out + mlp, taps


def forward(params: dict, cfg: CohereConfig, input_ids: jax.Array, *, positions=None,
            return_hidden: bool = False, remat_blocks: bool = False, **_):
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = jnp.take(params["embed"], input_ids, axis=0)

    def block(x, layer):
        attn_out, mlp, _ = _attn_mlp(x, layer, cfg, positions)
        return x + attn_out + mlp

    if remat_blocks:  # PV training: recompute block activations in backward
        block = jax.checkpoint(block)
    for layer in params["layers"]:
        x = block(x, layer)
    x = cohere_layer_norm(x, params["final_norm"], cfg.ln_eps)
    if return_hidden:  # PV chunked-KL path (pv/losses.py applies the head)
        return x, None
    logits = x @ params["embed"].T.astype(x.dtype)
    return logits * jnp.asarray(cfg.logit_scale, logits.dtype), None
