"""Speculative decoding: a small draft model proposes, the AQLM target
verifies k tokens in ONE forward.

AQLM's economics make this a natural fit on TPU: a 2-bit (or 1x8 ~1.3-bit)
draft of the same model is nearly free in HBM next to the target, and the
target's batched verify forward costs roughly one decode step (decode is
weights-bandwidth-bound, so scoring k+1 tokens reads the weights once). The
reference has no speculative path (serving is delegated to HF generate,
SURVEY.md §1); this is part of the serving layer built beyond it.

Greedy verification is EXACT: emitted tokens equal the target's own greedy
decode (accept the longest prefix where the target's argmax agrees with the
draft, then emit the target's argmax at the first disagreement — the
classic Leviathan et al. 2023 scheme specialized to temperature 0).

Cache discipline: both models keep stacked KV caches; rejected draft
positions leave stale cache rows BEYOND the accepted offset, which are
masked out by the position-based causal mask and overwritten by the next
chunk's writes — no rollback copies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import llama
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params

__all__ = ["SpeculativeDecoder"]


def _make_prefill(cfg):
    @partial(jax.jit, donate_argnums=(1,), static_argnames=("length",))
    def prefill(params, cache, ids, true_len, length):
        logits, cache = forward_stacked(
            params, cfg, ids[None, :length], cache=cache,
            cache_offset=jnp.zeros((1,), jnp.int32),
        )
        last = jax.lax.dynamic_slice_in_dim(logits[0], true_len - 1, 1, axis=0)
        return jnp.argmax(last[0], axis=-1).astype(jnp.int32), cache

    return prefill


def _make_draft_chunk(cfg, k):
    @partial(jax.jit, donate_argnums=(1,))
    def draft_chunk(params, cache, prev_tok, last_tok, offset):
        """k greedy draft tokens, one decode step each (scan).

        The chunk starts one position EARLY, re-processing ``prev_tok`` at
        ``offset-1`` with a forced continuation of ``last_tok``: when a
        verify round accepts all k proposals, the k-th draft token's KV was
        never written (the scan writes positions off..off+k-1 for tokens
        [last, d_1..d_{k-1}]), so the next chunk's backfill of position
        offset-1 closes that hole. Re-writing an already-correct row is a
        no-op by value.
        """

        def step(carry, forced):
            tok, cache, off = carry
            logits, cache = forward_stacked(
                params, cfg, tok[None, None], cache=cache, cache_offset=off[None]
            )
            nxt = jnp.argmax(logits[0, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(forced >= 0, forced, nxt)
            return (nxt, cache, off + 1), nxt

        forced = jnp.concatenate([last_tok[None], jnp.full((k,), -1, jnp.int32)])
        (_, cache, _), toks = jax.lax.scan(step, (prev_tok, cache, offset - 1), forced)
        return toks[1:], cache  # [d_1..d_k]

    return draft_chunk


def _make_verify_chunk(cfg, k):
    @partial(jax.jit, donate_argnums=(1,))
    def verify_chunk(params, cache, last_tok, draft_toks, offset):
        """ONE target forward over [last_tok, d_1..d_k]; returns the number
        of accepted draft tokens and the bonus/correction token."""
        ids = jnp.concatenate([last_tok[None], draft_toks])[None, :]  # [1, k+1]
        logits, cache = forward_stacked(params, cfg, ids, cache=cache, cache_offset=offset[None])
        preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k+1]
        agree = preds[:k] == draft_toks  # target argmax vs proposal
        # first disagreement index == count of leading Trues (sentinel False
        # makes the all-accepted case return k)
        n_accept = jnp.argmin(jnp.concatenate([agree, jnp.array([False])])).astype(jnp.int32)
        bonus = preds[n_accept]  # correction (or extension when all agree)
        return n_accept, bonus, cache

    return verify_chunk


class SpeculativeDecoder:
    """Greedy draft-and-verify decoding for batch-1 requests.

    target/draft params are any runtime mode (dense, int8, codes); they are
    stacked at construction. `k` draft tokens are proposed per verify step.
    """

    def __init__(
        self,
        target_params: dict,
        target_cfg: llama.ModelConfig,
        draft_params: dict,
        draft_cfg: llama.ModelConfig,
        *,
        k: int = 4,
        max_len: int = 2048,
        kv_quantized: bool = False,
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size, "vocabularies must match"
        self.tcfg, self.dcfg, self.k = target_cfg, draft_cfg, k
        self.max_len = max_len
        self.tparams = stack_layer_params(target_params)
        self.dparams = stack_layer_params(draft_params)
        self.tcache = init_kv_cache(target_cfg, 1, max_len, quantized=kv_quantized)
        self.dcache = init_kv_cache(draft_cfg, 1, max_len, quantized=kv_quantized)
        self._prefill_t = _make_prefill(target_cfg)
        self._prefill_d = _make_prefill(draft_cfg)
        self._draft = _make_draft_chunk(draft_cfg, k)
        self._verify = _make_verify_chunk(target_cfg, k)

    def generate(self, prompt_ids, max_new_tokens: int) -> tuple[list, dict]:
        """Greedy decode; returns (tokens, stats). Exact vs target greedy."""
        prompt = np.asarray(prompt_ids, np.int32)
        n = len(prompt)
        pad = 1 << max(3, (n - 1).bit_length())  # prefill bucket
        ids = np.zeros(pad, np.int32)
        ids[:n] = prompt
        ids_j = jnp.asarray(ids)
        tok, self.tcache = self._prefill_t(self.tparams, self.tcache, ids_j, n, length=pad)
        _, self.dcache = self._prefill_d(self.dparams, self.dcache, ids_j, n, length=pad)

        out = [int(tok)]
        offset = n  # out[-1] sits at sequence position `offset`
        proposed = accepted = 0
        while len(out) < max_new_tokens and offset + self.k + 1 < self.max_len:
            last = jnp.asarray(out[-1], jnp.int32)
            # token at position offset-1: closes the draft-cache hole left by
            # an all-accepted round (see _make_draft_chunk)
            prev = jnp.asarray(out[-2] if len(out) >= 2 else int(prompt[-1]), jnp.int32)
            draft_toks, self.dcache = self._draft(
                self.dparams, self.dcache, prev, last, jnp.asarray(offset, jnp.int32)
            )
            n_acc, bonus, self.tcache = self._verify(
                self.tparams, self.tcache, last, draft_toks, jnp.asarray(offset, jnp.int32)
            )
            n_acc = int(n_acc)
            out.extend([int(t) for t in np.asarray(draft_toks[:n_acc])] + [int(bonus)])
            proposed += self.k
            accepted += n_acc
            # accepted prefix + bonus advance the offset; stale cache rows
            # beyond it are position-masked and overwritten by the next chunk
            offset += n_acc + 1
        stats = {
            "proposed": proposed,
            "accepted": accepted,
            "acceptance": accepted / max(proposed, 1),
            "tokens": len(out[:max_new_tokens]),
        }
        return out[:max_new_tokens], stats
