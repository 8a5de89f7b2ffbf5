"""Speculative decoding: a small draft model proposes, the AQLM target
verifies k tokens in ONE forward.

AQLM's economics make this a natural fit on TPU: a 2-bit (or 1x8 ~1.3-bit)
draft of the same model is nearly free in HBM next to the target, and the
target's batched verify forward costs roughly one decode step (decode is
weights-bandwidth-bound, so scoring k+1 tokens reads the weights once). The
reference has no speculative path (serving is delegated to HF generate,
SURVEY.md §1); this is part of the serving layer built beyond it.

Verification is EXACT in both modes:
- temperature 0 (greedy): emitted tokens equal the target's own greedy
  decode (accept the longest prefix where the target's argmax agrees with
  the draft, then emit the target's argmax at the first disagreement).
- temperature > 0: the full Leviathan et al. 2023 accept/resample scheme —
  accept draft token d_i with prob min(1, p(d_i)/q(d_i)), resample the
  first rejection from normalize(max(p - q, 0)) — whose output is
  distributed EXACTLY as target sampling (property-tested in
  tests/test_speculative.py against the target distribution). p and q are
  the same temperature/top-k/top-p-filtered distributions the engine's
  sampler uses (serve/sampler.py::filter_logits).

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
from aqlm_tpu.serve.sampler import filter_logits

__all__ = ["SpeculativeDecoder", "speculative_accept", "batched_accept"]


def batched_accept(logits, q_rows, draft_toks, temps, top_ps, rkeys, *, k, top_k):
    """Vectorized accept over slots (engine spec steps, single-chip and TP).

    logits [b, k+1, V] (target verify forward), q_rows [b, k, V] (draft
    distributions), draft_toks [b, k]. Greedy agree-prefix rule for
    temperature-0 rows, Leviathan accept/resample for sampled rows. Returns
    (n_acc [b], bonus [b], lp_d [b, k], lp_bonus [b]) where lp_* are RAW
    model logprobs of the proposals/bonus (for Request.logprobs).
    """

    def accept_row(lg_row, q_row, d_row, temp, top_p, rkey):
        preds = jnp.argmax(lg_row.astype(jnp.float32), axis=-1).astype(jnp.int32)
        agree = preds[:k] == d_row
        n_g = jnp.argmin(jnp.concatenate([agree, jnp.array([False])])).astype(jnp.int32)
        bonus_g = preds[n_g]
        scaled = filter_logits(
            lg_row, jnp.full((k + 1,), temp), jnp.full((k + 1,), top_p), top_k
        )
        n_s, bonus_s = speculative_accept(
            jax.nn.softmax(scaled, axis=-1), q_row, d_row, rkey
        )
        sampled = temp > 0
        n_acc = jnp.where(sampled, n_s, n_g)
        bonus = jnp.where(sampled, bonus_s, bonus_g)
        # raw model logprobs of the emitted chunk: d_i from row i-1, bonus
        # from row n_acc
        logp = jax.nn.log_softmax(lg_row.astype(jnp.float32), axis=-1)
        lp_d = jnp.take_along_axis(logp[:k], d_row[:, None], axis=-1)[:, 0]
        lp_bonus = logp[n_acc, bonus]
        return n_acc, bonus, lp_d, lp_bonus

    return jax.vmap(accept_row)(logits, q_rows, draft_toks, temps, top_ps, rkeys)


def speculative_accept(p_probs, q_probs, draft_toks, key):
    """Leviathan accept/resample on filtered distributions (pure, jittable).

    p_probs [k+1, V]: target distribution at each of the k+1 scored
    positions; q_probs [k, V]: draft distribution each proposal was drawn
    from; draft_toks [k]. Returns (n_accept, bonus): accept draft token i
    w.p. min(1, p_i(d_i)/q_i(d_i)); the first rejection resamples from
    normalize(max(p_i - q_i, 0)); all-accepted samples the bonus from
    p_{k+1}. The emitted prefix+bonus is then distributed exactly as k+1
    sequential draws from the target (Leviathan et al. 2023, thm. 1).
    """
    k = draft_toks.shape[0]
    key_u, key_r = jax.random.split(key)
    p_tok = jnp.take_along_axis(p_probs[:k], draft_toks[:, None], axis=1)[:, 0]
    q_tok = jnp.take_along_axis(q_probs, draft_toks[:, None], axis=1)[:, 0]
    u = jax.random.uniform(key_u, (k,))
    accept = u * q_tok < p_tok  # u < p/q, robust to q == 0
    n_accept = jnp.argmin(jnp.concatenate([accept, jnp.array([False])])).astype(jnp.int32)
    # residual at the first rejected position (rows padded so index k is valid)
    q_pad = jnp.concatenate([q_probs, jnp.zeros_like(q_probs[:1])], axis=0)
    residual = jnp.maximum(p_probs[n_accept] - q_pad[n_accept], 0.0)
    # numerically-empty residual (p==q) degrades to sampling from p itself
    safe = jnp.where(residual.sum() > 1e-9, residual, p_probs[n_accept])
    bonus = jax.random.categorical(key_r, jnp.log(safe + 1e-30)).astype(jnp.int32)
    return n_accept, bonus


def _make_prefill(cfg, sampling):
    temperature, top_p, top_k = sampling

    @partial(jax.jit, donate_argnums=(1,), static_argnames=("length",))
    def prefill(params, cache, ids, true_len, key, length):
        logits, cache = forward_stacked(
            params, cfg, ids[None, :length], cache=cache,
            cache_offset=jnp.zeros((1,), jnp.int32),
        )
        last = jax.lax.dynamic_slice_in_dim(logits[0], true_len - 1, 1, axis=0)
        if temperature > 0.0:
            scaled = filter_logits(last, jnp.full((1,), temperature), jnp.full((1,), top_p), top_k)
            tok = jax.random.categorical(key, scaled[0]).astype(jnp.int32)
        else:
            tok = jnp.argmax(last[0], axis=-1).astype(jnp.int32)
        return tok, cache

    return prefill


def _make_draft_chunk(cfg, k, sampling):
    temperature, top_p, top_k = sampling

    @partial(jax.jit, donate_argnums=(1,))
    def draft_chunk(params, cache, prev_tok, last_tok, offset, key):
        """k draft tokens, one decode step each (scan); greedy when
        temperature == 0, else sampled from the filtered draft distribution
        (whose prob rows are returned for the verify accept test).

        The chunk starts one position EARLY, re-processing ``prev_tok`` at
        ``offset-1`` with a forced continuation of ``last_tok``: when a
        verify round accepts all k proposals, the k-th draft token's KV was
        never written (the scan writes positions off..off+k-1 for tokens
        [last, d_1..d_{k-1}]), so the next chunk's backfill of position
        offset-1 closes that hole. Re-writing an already-correct row is a
        no-op by value.
        """

        def step(carry, xs):
            tok, cache, off = carry
            forced, i = xs
            logits, cache = forward_stacked(
                params, cfg, tok[None, None], cache=cache, cache_offset=off[None]
            )
            if temperature > 0.0:
                scaled = filter_logits(
                    logits[0, -1:], jnp.full((1,), temperature), jnp.full((1,), top_p), top_k
                )
                q_row = jax.nn.softmax(scaled[0])
                nxt = jax.random.categorical(jax.random.fold_in(key, i), scaled[0]).astype(jnp.int32)
            else:
                q_row = jnp.zeros((logits.shape[-1],), jnp.float32)
                nxt = jnp.argmax(logits[0, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(forced >= 0, forced, nxt)
            return (nxt, cache, off + 1), (nxt, q_row)

        forced = jnp.concatenate([last_tok[None], jnp.full((k,), -1, jnp.int32)])
        steps = jnp.arange(k + 1)
        (_, cache, _), (toks, q_rows) = jax.lax.scan(
            step, (prev_tok, cache, offset - 1), (forced, steps)
        )
        return toks[1:], q_rows[1:], cache  # [d_1..d_k], their q distributions

    return draft_chunk


def _make_verify_chunk(cfg, k, sampling):
    temperature, top_p, top_k = sampling

    @partial(jax.jit, donate_argnums=(1,))
    def verify_chunk(params, cache, last_tok, draft_toks, q_rows, offset, key):
        """ONE target forward over [last_tok, d_1..d_k]; returns the number
        of accepted draft tokens and the bonus/correction token."""
        ids = jnp.concatenate([last_tok[None], draft_toks])[None, :]  # [1, k+1]
        logits, cache = forward_stacked(params, cfg, ids, cache=cache, cache_offset=offset[None])
        if temperature > 0.0:
            scaled = filter_logits(
                logits[0], jnp.full((k + 1,), temperature), jnp.full((k + 1,), top_p), top_k
            )
            p_probs = jax.nn.softmax(scaled, axis=-1)  # [k+1, V]
            n_accept, bonus = speculative_accept(p_probs, q_rows, draft_toks, key)
            return n_accept, bonus, cache
        preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [k+1]
        agree = preds[:k] == draft_toks  # target argmax vs proposal
        # first disagreement index == count of leading Trues (sentinel False
        # makes the all-accepted case return k)
        n_accept = jnp.argmin(jnp.concatenate([agree, jnp.array([False])])).astype(jnp.int32)
        bonus = preds[n_accept]  # correction (or extension when all agree)
        return n_accept, bonus, cache

    return verify_chunk


class SpeculativeDecoder:
    """Draft-and-verify decoding for batch-1 requests.

    target/draft params are any runtime mode (dense, int8, codes); they are
    stacked at construction. `k` draft tokens are proposed per verify step.
    temperature 0 (default) = greedy; temperature > 0 = exact target
    sampling via accept/resample (top_p/top_k filter both distributions).
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
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        seed: int = 0,
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size, "vocabularies must match"
        self.tcfg, self.dcfg, self.k = target_cfg, draft_cfg, k
        self.max_len = max_len
        self.tparams = stack_layer_params(target_params)
        self.dparams = stack_layer_params(draft_params)
        self.tcache = init_kv_cache(target_cfg, 1, max_len, quantized=kv_quantized)
        self.dcache = init_kv_cache(draft_cfg, 1, max_len, quantized=kv_quantized)
        sampling = (float(temperature), float(top_p), int(top_k))
        self._key = jax.random.PRNGKey(seed)
        self._round = 0
        self._prefill_t = _make_prefill(target_cfg, sampling)
        self._prefill_d = _make_prefill(draft_cfg, sampling)
        self._draft = _make_draft_chunk(draft_cfg, k, sampling)
        self._verify = _make_verify_chunk(target_cfg, k, sampling)

    def generate(self, prompt_ids, max_new_tokens: int) -> tuple[list, dict]:
        """Greedy decode; returns (tokens, stats). Exact vs target greedy."""
        prompt = np.asarray(prompt_ids, np.int32)
        n = len(prompt)
        pad = 1 << max(3, (n - 1).bit_length())  # prefill bucket
        ids = np.zeros(pad, np.int32)
        ids[:n] = prompt
        ids_j = jnp.asarray(ids)
        pkey = jax.random.fold_in(self._key, self._round)
        self._round += 1
        tok, self.tcache = self._prefill_t(self.tparams, self.tcache, ids_j, n, pkey, length=pad)
        _, self.dcache = self._prefill_d(self.dparams, self.dcache, ids_j, n, pkey, length=pad)

        out = [int(tok)]
        offset = n  # out[-1] sits at sequence position `offset`
        proposed = accepted = 0
        while len(out) < max_new_tokens and offset + self.k + 1 < self.max_len:
            last = jnp.asarray(out[-1], jnp.int32)
            # token at position offset-1: closes the draft-cache hole left by
            # an all-accepted round (see _make_draft_chunk)
            prev = jnp.asarray(out[-2] if len(out) >= 2 else int(prompt[-1]), jnp.int32)
            rkey = jax.random.fold_in(self._key, self._round)
            self._round += 1
            dkey, vkey = jax.random.split(rkey)
            draft_toks, q_rows, self.dcache = self._draft(
                self.dparams, self.dcache, prev, last, jnp.asarray(offset, jnp.int32), dkey
            )
            n_acc, bonus, self.tcache = self._verify(
                self.tparams, self.tcache, last, draft_toks, q_rows,
                jnp.asarray(offset, jnp.int32), vkey,
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
