"""Llama-family causal LM in pure JAX (covers llama/mistral/qwen2/gemma
configs via ModelConfig knobs; cohere lives in models/cohere.py — its
parallel block and interleaved rope don't fit these knobs. The reference's
family dispatch lives in /root/reference/src/modelutils.py:17,140-176 —
here one config class replaces the per-family tables).

Parameters are a plain pytree; every projection is either a DenseLinear or a
QuantizedLinear (any runtime mode), mirroring how the reference swaps
nn.Linear -> QuantizedLinear per layer (main.py:272-283).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from aqlm_tpu.models.common import (
    DenseLinear,
    apply_linear,
    attention,
    make_causal_mask,
    rms_norm,
    rope,
)

__all__ = ["ModelConfig", "init_random_params", "forward", "init_kv_cache", "QUANTIZABLE_PROJS"]

# the per-block linears the reference quantizes, in its sequential-group order
# (src/modelutils.py:159-176)
QUANTIZABLE_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int | None = None
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    attention_bias: bool = False  # qwen2: True
    gemma_norm: bool = False  # gemma: (1+w) RMSNorm + embed scaling
    logit_softcap: float | None = None
    max_position_embeddings: int = 4096
    # mistral/qwen2 sliding-window attention (None = full causal)
    sliding_window: int | None = None
    # normalized HF rope_scaling: ("linear", factor) or
    # ("llama3", factor, low_freq_factor, high_freq_factor, original_max_pos)
    rope_scaling: tuple | None = None

    @property
    def dim_per_head(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "ModelConfig":
        """Small config for tests."""
        defaults = dict(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def llama2_7b(cls) -> "ModelConfig":
        return cls()

    @classmethod
    def llama3_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, rope_theta=500000.0,
            max_position_embeddings=8192,
        )

    @classmethod
    def llama2_70b(cls) -> "ModelConfig":
        return cls(
            hidden_size=8192, intermediate_size=28672, num_layers=80,
            num_heads=64, num_kv_heads=8,
        )

    @classmethod
    def llama3_70b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256, hidden_size=8192, intermediate_size=28672,
            num_layers=80, num_heads=64, num_kv_heads=8, rope_theta=500000.0,
            max_position_embeddings=8192,
        )

    @classmethod
    def llama3_1_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, rope_theta=500000.0,
            max_position_embeddings=131072,
            rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192.0),
        )

    @classmethod
    def mistral_7b(cls) -> "ModelConfig":
        return cls(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, rope_theta=10000.0,
            max_position_embeddings=8192, sliding_window=4096,
        )


def _dense(key, out_f, in_f, dtype, bias=False, scale=None):
    if scale is None:
        scale = in_f ** -0.5
    w = jax.random.normal(key, (out_f, in_f), jnp.float32) * scale
    b = jnp.zeros((out_f,), dtype) if bias else None
    return DenseLinear(weight=w.astype(dtype), bias=b)


def init_random_params(key, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Random dense params (tests / pre-quantization scaffold)."""
    keys = jax.random.split(key, cfg.num_layers + 3)
    h, d = cfg.hidden_size, cfg.dim_per_head
    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(keys[li], 8)
        layers.append(
            dict(
                input_norm=jnp.ones((h,), dtype),
                q_proj=_dense(ks[0], cfg.num_heads * d, h, dtype, cfg.attention_bias),
                k_proj=_dense(ks[1], cfg.num_kv_heads * d, h, dtype, cfg.attention_bias),
                v_proj=_dense(ks[2], cfg.num_kv_heads * d, h, dtype, cfg.attention_bias),
                o_proj=_dense(ks[3], h, cfg.num_heads * d, dtype),
                post_attn_norm=jnp.ones((h,), dtype),
                gate_proj=_dense(ks[4], cfg.intermediate_size, h, dtype),
                up_proj=_dense(ks[5], cfg.intermediate_size, h, dtype),
                down_proj=_dense(ks[6], h, cfg.intermediate_size, dtype),
            )
        )
    embed = jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.float32) * 0.02
    params = dict(
        embed=embed.astype(dtype),
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        lm_head=None
        if cfg.tie_embeddings
        else _dense(keys[-2], cfg.vocab_size, h, dtype),
    )
    return params


def init_kv_cache(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """[layers] of (k, v) with shape [B, max_len, n_kv, head_dim]."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.dim_per_head)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(cfg.num_layers)
    ]


def _block(x, layer, cfg: ModelConfig, positions, kv, cache_positions, kv_len_mask,
           *, attention_fn=None, act_mul_fn=None):
    """One transformer block. Returns (x, new_kv).

    attention_fn / act_mul_fn override the attention and silu-mul glue —
    the PV scan path injects recompute-in-backward custom_vjp variants
    (pv/straight_through.py) so the scan doesn't stack their residuals;
    primal math is identical."""
    b, t, h = x.shape
    d = cfg.dim_per_head
    res = x
    x = rms_norm(x, layer["input_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    q = apply_linear(x, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(x, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(x, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)

    if kv is not None:
        k_cache, v_cache = kv
        # scatter new k/v at cache_positions (per-batch identical offsets)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k.astype(k_cache.dtype), cache_positions, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v.astype(v_cache.dtype), cache_positions, axis=1)
        k_all, v_all = k_cache.astype(q.dtype), v_cache.astype(q.dtype)
        new_kv = (k_cache, v_cache)
        mask = kv_len_mask  # [B,1,T,max_len], precomputed
    else:
        k_all, v_all = k, v
        new_kv = None
        mask = make_causal_mask(positions, positions, window=cfg.sliding_window)

    attn = (attention_fn or attention)(q, k_all, v_all, mask)
    x = res + apply_linear(attn.reshape(b, t, -1), layer["o_proj"])

    res = x
    xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    gate = apply_linear(xn, layer["gate_proj"])
    up = apply_linear(xn, layer["up_proj"])
    if act_mul_fn is None:
        mlp_in = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    else:
        mlp_in = act_mul_fn(gate, up)
    x = res + apply_linear(mlp_in, layer["down_proj"])
    return x, new_kv


def block_forward_with_taps(x, layer, cfg: ModelConfig, positions):
    """One block forward that also returns each projection's INPUT activation.

    The calibration pipeline accumulates X^T X from these taps — the
    functional equivalent of the reference's _LayerWrapperThatAccumulatesXTX
    (/root/reference/main.py:454-483, used instead of forward hooks).
    Returns (block_output, taps) where taps[name] feeds layer[name].
    """
    b, t, h = x.shape
    d = cfg.dim_per_head
    taps = {}
    res = x
    xn = rms_norm(x, layer["input_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    taps["q_proj"] = taps["k_proj"] = taps["v_proj"] = xn
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)
    attn = attention(
        q, k, v, make_causal_mask(positions, positions, window=cfg.sliding_window)
    ).reshape(b, t, -1)
    taps["o_proj"] = attn
    x = res + apply_linear(attn, layer["o_proj"])

    res = x
    xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    taps["gate_proj"] = taps["up_proj"] = xn
    gate = apply_linear(xn, layer["gate_proj"])
    up = apply_linear(xn, layer["up_proj"])
    mlp_in = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    taps["down_proj"] = mlp_in
    x = res + apply_linear(mlp_in, layer["down_proj"])
    return x, taps


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,
    *,
    positions: jax.Array | None = None,
    kv_caches: list | None = None,
    cache_offset: jax.Array | None = None,
    return_hidden: bool = False,
    remat_blocks: bool = False,
):
    """Causal LM forward.

    Without cache: full-sequence forward (calibration / perplexity / prefill
    when cache is written separately). With kv_caches + cache_offset: writes
    new K/V at [cache_offset, cache_offset+T) and attends over the cache.
    Returns (logits [B,T,V], new_kv_caches).

    return_hidden=True skips the lm_head and returns the post-final-norm
    hidden states instead of logits — the input contract of
    `pv.losses.chunked_kl_loss` (head applied per token-chunk under remat).
    remat_blocks=True wraps each transformer block in jax.checkpoint so a
    backward pass recomputes block internals instead of keeping them live —
    required for codes-resident PV training, where every block transiently
    dequantizes its weights (reference analogue: --use_checkpointing /
    gradient_checkpointing, finetune.py:318-321).
    """
    b, t = input_ids.shape
    if positions is None:
        if cache_offset is not None:
            positions = cache_offset + jnp.arange(t)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    positions = jnp.broadcast_to(positions, (b, t))

    x = jnp.take(params["embed"], input_ids, axis=0)
    if cfg.gemma_norm:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)

    kv_len_mask = None
    cache_positions = None
    if kv_caches is not None:
        max_len = kv_caches[0][0].shape[1]
        cache_positions = cache_offset if cache_offset is not None else 0
        key_pos = jnp.broadcast_to(jnp.arange(max_len)[None, :], (b, max_len))
        kv_len_mask = make_causal_mask(positions, key_pos, window=cfg.sliding_window)

    new_caches = []
    block = _block
    if remat_blocks:
        block = jax.checkpoint(_block, static_argnums=(2,))
    for li, layer in enumerate(params["layers"]):
        kv = kv_caches[li] if kv_caches is not None else None
        x, new_kv = block(x, layer, cfg, positions, kv, cache_positions, kv_len_mask)
        new_caches.append(new_kv)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    if return_hidden:
        return x, (new_caches if kv_caches is not None else None)
    if params.get("lm_head") is not None:
        logits = apply_linear(x, params["lm_head"])
    else:
        logits = jnp.einsum(
            "bth,vh->btv", x, params["embed"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if cfg.logit_softcap:
        c = cfg.logit_softcap
        logits = jnp.tanh(logits.astype(jnp.float32) / c) * c
        logits = logits.astype(x.dtype)
    return logits, (new_caches if kv_caches is not None else None)
