"""Token sampling: greedy / temperature / top-k / top-p, jit-friendly.

The reference delegates sampling to HF `model.generate`
(/root/reference/benchmark/generate_benchmark.py:97-106); a serving stack
needs its own. Per-row temperature/top_p are traced arrays so one compiled
step serves heterogeneous requests in the same continuous batch; top_k is a
static bound (0 = off).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_tokens", "filter_logits"]


def filter_logits(
    logits: jax.Array,  # [B, V]
    temperature: jax.Array,  # [B]
    top_p: jax.Array,  # [B]
    top_k: int = 0,
) -> jax.Array:
    """Temperature-scaled, top-k/top-p-masked logits [B, V] (f32, -inf at
    masked entries). softmax of the result IS the sampling distribution —
    shared by `sample_tokens` and speculative verify so that draft/target
    probabilities refer to the same filtered distributions."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    if top_k and top_k < v:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    # top-p (nucleus): mask tokens outside the smallest set with cum prob >= p
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1)  # first index reaching p
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
    return jnp.where(scaled < cutoff, -jnp.inf, scaled)


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled (static: picks the compiled variant)
    top_p: float = 1.0
    max_new_tokens: int = 128
    eos_token_id: int | None = None


@partial(jax.jit, static_argnames=("top_k",))
def sample_tokens(
    logits: jax.Array,  # [B, V]
    key: jax.Array,
    temperature: jax.Array,  # [B] (0 => greedy for that row)
    top_p: jax.Array,  # [B]
    top_k: int = 0,
) -> jax.Array:
    """Returns next token ids [B]."""
    greedy = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    scaled = filter_logits(logits, temperature, top_p, top_k)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
