"""OPT-style causal LM (learned positions, pre-LayerNorm, ReLU MLP).

Reference support: OPT appears throughout the model dispatch tables
(/root/reference/src/modelutils.py:140-176: layers at `model.decoder.layers`,
sequential groups over q/k/v/out_proj + fc1/fc2; get_lm_logits applies
`final_layer_norm` + optional project_out, :117-138). Architectural
differences from llama:

- learned positional embeddings with OPT's +2 offset (no rope);
- LayerNorm with bias, pre-norm (`do_layer_norm_before=True` models);
- attention out projection named out_proj, biases on all projections;
- ReLU MLP fc1 -> fc2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear, apply_linear, attention, make_causal_mask
from aqlm_tpu.models.falcon import layer_norm

__all__ = ["OptConfig", "init_random_params", "forward", "block_forward_with_taps"]


@dataclasses.dataclass(frozen=True)
class OptConfig(llama.ModelConfig):
    ln_eps: float = 1e-5

    @classmethod
    def opt_1b3(cls) -> "OptConfig":
        return cls(
            vocab_size=50272, hidden_size=2048, intermediate_size=8192,
            num_layers=24, num_heads=32, num_kv_heads=32,
            max_position_embeddings=2048,
        )

    @classmethod
    def tiny(cls, **kw) -> "OptConfig":
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)


def init_random_params(key, cfg: OptConfig, dtype=jnp.float32) -> dict:
    h, d = cfg.hidden_size, cfg.dim_per_head
    keys = jax.random.split(key, cfg.num_layers * 8 + 4)

    def dense(k, o, i):
        return DenseLinear(
            weight=(jax.random.normal(k, (o, i)) * 0.02).astype(dtype),
            bias=jnp.zeros((o,), dtype),
        )

    layers = []
    for li in range(cfg.num_layers):
        ks = keys[li * 8 : (li + 1) * 8]
        layers.append(
            dict(
                attn_norm=jnp.ones((h,), dtype),
                attn_norm_bias=jnp.zeros((h,), dtype),
                q_proj=dense(ks[0], cfg.num_heads * d, h),
                k_proj=dense(ks[1], cfg.num_kv_heads * d, h),
                v_proj=dense(ks[2], cfg.num_kv_heads * d, h),
                out_proj=dense(ks[3], h, cfg.num_heads * d),
                mlp_norm=jnp.ones((h,), dtype),
                mlp_norm_bias=jnp.zeros((h,), dtype),
                fc1=dense(ks[4], cfg.intermediate_size, h),
                fc2=dense(ks[5], h, cfg.intermediate_size),
            )
        )
    embed = (jax.random.normal(keys[-4], (cfg.vocab_size, h)) * 0.02).astype(dtype)
    # OPT's embed_positions table carries the +2 offset rows
    pos = (jax.random.normal(keys[-3], (cfg.max_position_embeddings + 2, h)) * 0.02).astype(dtype)
    return dict(
        embed=embed,
        pos_embed=pos,
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        final_norm_bias=jnp.zeros((h,), dtype),
        lm_head=DenseLinear(weight=embed, bias=None),  # tied
    )


def embed(params: dict, input_ids: jax.Array, positions: jax.Array) -> jax.Array:
    x = jnp.take(params["embed"], input_ids, axis=0)
    return x + jnp.take(params["pos_embed"], positions + 2, axis=0)


def _attn(x, layer, cfg, positions):
    b, t, h = x.shape
    d = cfg.dim_per_head
    q = apply_linear(x, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(x, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(x, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    out = attention(q, k, v, make_causal_mask(positions, positions)).reshape(b, t, -1)
    return apply_linear(out, layer["out_proj"])


def block_forward_with_taps(x, layer, cfg: OptConfig, positions):
    taps = {}
    xn = layer_norm(x, layer["attn_norm"], layer["attn_norm_bias"], cfg.ln_eps)
    taps["q_proj"] = taps["k_proj"] = taps["v_proj"] = xn
    b, t, h = x.shape
    d = cfg.dim_per_head
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    attn_out = attention(q, k, v, make_causal_mask(positions, positions)).reshape(b, t, -1)
    taps["out_proj"] = attn_out
    x = x + apply_linear(attn_out, layer["out_proj"])

    xn = layer_norm(x, layer["mlp_norm"], layer["mlp_norm_bias"], cfg.ln_eps)
    taps["fc1"] = xn
    fc1_out = jax.nn.relu(apply_linear(xn, layer["fc1"]).astype(jnp.float32)).astype(x.dtype)
    taps["fc2"] = fc1_out
    x = x + apply_linear(fc1_out, layer["fc2"])
    return x, taps


def forward(params: dict, cfg: OptConfig, input_ids: jax.Array, *, positions=None,
            return_hidden: bool = False, remat_blocks: bool = False, **_):
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = embed(params, input_ids, positions)

    def block(x, layer):
        return block_forward_with_taps(x, layer, cfg, positions)[0]

    if remat_blocks:  # PV training: recompute block activations in backward
        block = jax.checkpoint(block)
    for layer in params["layers"]:
        x = block(x, layer)
    x = layer_norm(x, params["final_norm"], params["final_norm_bias"], cfg.ln_eps)
    if return_hidden:  # PV chunked-KL path (pv/losses.py applies the head)
        return x, None
    logits = apply_linear(x, params["lm_head"])
    return logits, None
