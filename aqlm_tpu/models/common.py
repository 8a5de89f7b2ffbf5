"""Shared model components: linear wrapper, RMSNorm, RoPE, GQA attention.

Pure functions over parameter pytrees — no module framework. Sharding is
applied externally (NamedSharding on the params pytree + jit); everything
here must therefore be shape-polymorphic in batch/sequence and free of
data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.ops.runtime import (
    IndexedFusedCodesLinear,
    IndexedQuantizedLinear,
    QuantizedLinear,
    fused_codes_matmul_indexed,
    quantized_matmul,
    quantized_matmul_indexed,
)

__all__ = [
    "DenseLinear",
    "LoraLinear",
    "apply_linear",
    "rms_norm",
    "rope",
    "attention",
    "attention_headmajor",
    "make_causal_mask",
    "rope_inv_freq",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["weight", "bias"],
    meta_fields=[],
)
@dataclasses.dataclass
class DenseLinear:
    """Unquantized linear: weight [OUT, IN] (torch convention), optional bias."""

    weight: jax.Array
    bias: jax.Array | None

    @property
    def out_features(self):
        return self.weight.shape[0]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base", "lora_a", "lora_b"],
    meta_fields=["scale"],
)
@dataclasses.dataclass
class LoraLinear:
    """Low-rank adapter on a frozen base linear: y = base(x) + scale·(x Aᵀ) Bᵀ.

    The PEFT recipe of the reference's 2-bit-training notebook
    (/root/reference/notebooks/aqlm_2bit_training.ipynb): adapters train
    through the quantized matmul's custom VJP while codes/codebooks stay
    frozen. lora_a [r, IN] (normal init), lora_b [OUT, r] (zeros — the
    wrapped model starts exactly equal to the base model)."""

    base: object  # DenseLinear | QuantizedLinear
    lora_a: jax.Array
    lora_b: jax.Array
    scale: float  # alpha / r

    @property
    def out_features(self):
        return self.lora_b.shape[0]


def apply_linear(x: jax.Array, lin) -> jax.Array:
    """x [..., IN] @ W^T for a DenseLinear, QuantizedLinear, or indexed view."""
    if isinstance(lin, LoraLinear):
        y = apply_linear(x, lin.base)
        delta = jnp.einsum("...i,ri->...r", x, lin.lora_a.astype(x.dtype))
        delta = jnp.einsum("...r,or->...o", delta, lin.lora_b.astype(x.dtype))
        return y + jnp.asarray(lin.scale, y.dtype) * delta.astype(y.dtype)
    if isinstance(lin, IndexedQuantizedLinear):
        return quantized_matmul_indexed(x, lin)
    if isinstance(lin, IndexedFusedCodesLinear):
        return fused_codes_matmul_indexed(x, lin)
    if isinstance(lin, QuantizedLinear):
        return quantized_matmul(x, lin)
    if callable(getattr(lin, "apply", None)) and not hasattr(lin, "weight"):
        # weightless functional linear (e.g. pv.straight_through's
        # checkpointed dequant+ST projection): delegates the matmul so the
        # dense weight never becomes a saved residual
        return lin.apply(x)
    y = jnp.einsum(
        "...i,oi->...o", x, lin.weight.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if lin.bias is not None:
        y = y + lin.bias.astype(y.dtype)
    return y


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5, plus_one: bool = False) -> jax.Array:
    """RMSNorm in f32 (matches HF Llama); gemma uses (1 + w) via plus_one."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    return (xf * w).astype(x.dtype)


def rope_inv_freq(d: int, theta: float, scaling=None) -> jax.Array:
    """Per-pair inverse frequencies, with optional HF rope_scaling.

    scaling is the normalized tuple from ModelConfig.rope_scaling:
    ("linear", factor) divides all frequencies (position interpolation);
    ("llama3", factor, low_freq_factor, high_freq_factor, original_max_pos)
    is the llama-3.1 profile — high-frequency (short-wavelength) components
    keep their resolution, low-frequency components stretch by `factor`,
    with a smooth band in between (matches transformers' llama3 rope_type).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if scaling is None:
        return inv_freq
    kind = scaling[0]
    if kind == "linear":
        return inv_freq / scaling[1]
    if kind == "llama3":
        _, factor, low_f, high_f, orig = scaling
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (orig / wavelen - low_f) / (high_f - low_f)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        return jnp.where(
            wavelen > orig / low_f, inv_freq / factor,
            jnp.where(wavelen < orig / high_f, inv_freq, smoothed),
        )
    raise ValueError(f"unknown rope scaling {kind!r}")


def rope(q: jax.Array, k: jax.Array, positions: jax.Array, theta: float = 10000.0,
         scaling=None):
    """Rotary embeddings, HF 'half-split' layout. q,k: [B, T, H, D]."""
    d = q.shape[-1]
    inv_freq = rope_inv_freq(d, theta, scaling)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)

    return rot(q).astype(q.dtype), rot(k).astype(k.dtype)


def make_causal_mask(
    q_positions: jax.Array, k_positions: jax.Array, window: int | None = None
) -> jax.Array:
    """[B, 1, Tq, Tk] boolean mask: query may attend to keys with pos <= its
    own; with `window`, only to keys in (q - window, q] (mistral's sliding
    window — HF masks q - k >= sliding_window)."""
    mask = k_positions[:, None, None, :] <= q_positions[:, None, :, None]
    if window is not None:
        mask &= k_positions[:, None, None, :] > q_positions[:, None, :, None] - window
    return mask


def attention(q, k, v, mask, *, scale: float | None = None):
    """GQA attention. q: [B,Tq,Hq,D], k/v: [B,Tk,Hkv,D], mask: [B,1,Tq,Tk] bool.

    Operands stay in their storage dtype (bf16 on the serving path) with f32
    MXU accumulation — casting K/V to f32 would materialize the whole cache
    in f32 every decode step (measured ~1.3 ms/step at 2k context, 8 layers).
    Softmax itself runs in f32.
    """
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b, tq, hkv, rep, d)
    logits = jnp.einsum(
        "bqhrd,bkhd->bhrqk", qs, k, preferred_element_type=jnp.float32
    )
    logits = jnp.where(mask[:, :, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhrqk,bkhd->bqhrd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def attention_headmajor(q, k_hm, v_hm, mask, *, scale: float | None = None):
    """GQA attention over a head-major KV cache.

    q: [B,Tq,Hq,D]; k_hm/v_hm: [B,Hkv,S,D] (the serving cache layout —
    contiguous per head, which both the flash-decode kernel's BlockSpecs and
    the cache-write DMAs want); mask: [B,1,Tq,S] bool.
    """
    b, tq, hq, d = q.shape
    hkv = k_hm.shape[1]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b, tq, hkv, rep, d)
    logits = jnp.einsum(
        "bqhrd,bhkd->bhrqk", qs, k_hm, preferred_element_type=jnp.float32
    )
    logits = jnp.where(mask[:, :, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhrqk,bhkd->bqhrd", probs.astype(v_hm.dtype), v_hm, preferred_element_type=jnp.float32
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)
