"""Distillation losses for PV-tuning.

TPU-native analogue of the reference's memory-efficient KL loss
(/root/reference/src/memory_efficient_loss.py:15-58): teacher->student KL
over next-token distributions, computed in token chunks with rematerialization
so the full [B, T, V] logits for student+teacher never coexist in HBM.

On TPU the chunking is a `lax.map` over sequence chunks of the *hidden states*
with the lm_head matmul inside the remat'd chunk — same trick, expressed as
compiler-friendly static-shape control flow instead of a Python loop with
``torch.utils.checkpoint``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kl_divergence_loss", "chunked_kl_loss", "cross_entropy_loss"]


def kl_divergence_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean KL(teacher || student) per token. Logits [..., V], mask [...]."""
    sl = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    tl = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(tl) * (tl - sl), axis=-1)  # [...]
    if mask is None:
        return jnp.mean(kl)
    mask = mask.astype(jnp.float32)
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _project(hidden, head_weight, embed, softcap, logit_scale=None):
    if head_weight is not None:
        logits = jnp.einsum(
            "bth,vh->btv", hidden, head_weight.astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = jnp.einsum(
            "bth,vh->btv", hidden, embed.astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
    if logit_scale is not None:  # cohere tied-head scaling
        logits = logits * logit_scale
    if softcap:
        logits = jnp.tanh(logits / softcap) * softcap
    return logits


def chunked_kl_loss(
    student_hidden: jax.Array,
    teacher_hidden: jax.Array,
    student_head: jax.Array | None,
    teacher_head: jax.Array | None,
    *,
    student_embed: jax.Array | None = None,
    teacher_embed: jax.Array | None = None,
    mask: jax.Array | None = None,
    chunk_tokens: int = 256,
    softcap: float | None = None,
    logit_scale: float | None = None,
) -> jax.Array:
    """KL loss from final hidden states, lm_head applied per chunk under remat.

    student_hidden/teacher_hidden: [B, T, H]; heads: [V, H] (or None with
    embed for tied embeddings); mask: [B, T] valid-token mask.
    Equivalent to projecting everything then `kl_divergence_loss`, but peak
    memory is O(B * chunk * V) instead of O(B * T * V) — the exact contract
    the reference tests in its inline `test_kl_divergence`
    (/root/reference/src/memory_efficient_loss.py:77-114).
    """
    b, t, h = student_hidden.shape
    chunk = min(chunk_tokens, t)
    while t % chunk:
        chunk -= 1
    n_chunks = t // chunk

    if mask is None:
        mask = jnp.ones((b, t), jnp.float32)
    mask = mask.astype(jnp.float32)

    sh = student_hidden.reshape(b, n_chunks, chunk, h).transpose(1, 0, 2, 3)
    th = teacher_hidden.reshape(b, n_chunks, chunk, h).transpose(1, 0, 2, 3)
    mk = mask.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_loss(args):
        s, tt, m = args
        s_logits = _project(s, student_head, student_embed, softcap, logit_scale)
        t_logits = _project(tt, teacher_head, teacher_embed, softcap, logit_scale)
        sl = jax.nn.log_softmax(s_logits, axis=-1)
        tl = jax.nn.log_softmax(t_logits, axis=-1)
        kl = jnp.sum(jnp.exp(tl) * (tl - sl), axis=-1)
        return jnp.sum(kl * m), jnp.sum(m)

    sums, counts = jax.lax.map(chunk_loss, (sh, th, mk))
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Mean next-token NLL. logits [B, T, V]; labels [B, T] (already shifted)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
