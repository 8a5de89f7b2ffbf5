"""Sequence scoring (loglikelihood) + lm-eval harness adapter.

Covers the reference's lmeval.py surface (/root/reference/lmeval.py:150-237):
instead of monkeypatching from_pretrained to a dequantized torch model, the
harness talks to our params/forward directly. The scoring primitives work
standalone (no lm_eval needed); `make_lm_eval_adapter` returns an
`lm_eval.api.model.LM` subclass instance when the package is available.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import llama

__all__ = ["score_loglikelihood", "score_batch", "make_lm_eval_adapter"]


def _pad_to(arr, length, value=0):
    out = np.full((length,), value, np.int32)
    out[: len(arr)] = arr
    return out


def score_batch(
    params,
    cfg: llama.ModelConfig,
    contexts: list,
    continuations: list,
    *,
    forward_fn=llama.forward,
    pad_len: int | None = None,
):
    """Loglikelihood of each continuation given its context.

    Returns [(logprob_sum, is_greedy), ...] — the lm-eval `loglikelihood`
    contract. Sequences are padded to a shared length; one jitted forward
    scores the batch.
    """
    assert len(contexts) == len(continuations)
    n = len(contexts)
    totals = [len(c) + len(t) for c, t in zip(contexts, continuations)]
    max_len = pad_len or max(totals)

    ids = np.stack([_pad_to(np.concatenate([c, t]), max_len) for c, t in zip(contexts, continuations)])
    ids = jnp.asarray(ids, jnp.int32)

    @jax.jit
    def logprobs(params, ids):
        logits, _ = forward_fn(params, cfg, ids)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    lp = np.asarray(logprobs(params, ids))  # [n, max_len, V]
    results = []
    for i in range(n):
        c_len, t_len = len(contexts[i]), len(continuations[i])
        # token at position p is predicted by logits at p-1
        token_lp = lp[i, c_len - 1 : c_len + t_len - 1]
        cont = np.asarray(continuations[i], np.int64)
        ll = float(token_lp[np.arange(t_len), cont].sum())
        greedy = bool((token_lp.argmax(-1) == cont).all())
        results.append((ll, greedy))
    return results


def score_loglikelihood(params, cfg, context_ids, continuation_ids, *, forward_fn=llama.forward):
    """Single-sequence convenience wrapper."""
    return score_batch(params, cfg, [context_ids], [continuation_ids], forward_fn=forward_fn)[0]


def make_lm_eval_adapter(params, cfg, tokenizer, *, forward_fn=llama.forward, batch_size: int = 4):
    """Build an lm-eval-harness LM over our params (requires `lm_eval`)."""
    from lm_eval.api.model import LM

    class AqlmTpuLM(LM):
        def __init__(self):
            super().__init__()
            self._batch = batch_size

        def _encode_pair(self, context: str, continuation: str):
            whole = tokenizer(context + continuation, add_special_tokens=False).input_ids
            ctx = tokenizer(context, add_special_tokens=False).input_ids
            if not ctx:
                ctx = [tokenizer.bos_token_id or 0]
                whole = ctx + whole
            return np.asarray(ctx, np.int32), np.asarray(whole[len(ctx):], np.int32)

        def loglikelihood(self, requests):
            out = []
            pairs = [self._encode_pair(r.args[0], r.args[1]) for r in requests]
            for start in range(0, len(pairs), self._batch):
                chunk = pairs[start : start + self._batch]
                out += score_batch(
                    params, cfg, [c for c, _ in chunk], [t for _, t in chunk],
                    forward_fn=forward_fn,
                )
            return out

        def loglikelihood_rolling(self, requests):
            # Documents longer than the model context are scored in rolling
            # windows of max_position_embeddings tokens, each continuing from
            # the previous window's last token (lm-eval's rolling-window
            # protocol with context_len=1) — one unbounded forward would
            # overflow positions/HBM on long documents.
            max_len = cfg.max_position_embeddings
            out = []
            for r in requests:
                ids = np.asarray(tokenizer(r.args[0]).input_ids, np.int32)
                total, start = 0.0, 1
                while start < len(ids):
                    end = min(start + max_len - 1, len(ids))
                    ll, _ = score_loglikelihood(
                        params, cfg, ids[start - 1 : start], ids[start:end],
                        forward_fn=forward_fn,
                    )
                    total += ll
                    start = end
                out.append((total,))
            return out

        def generate_until(self, requests):
            from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig

            engine = Engine(params, cfg, ServeConfig(max_batch=self._batch, fuse_projections=False))
            outs = []
            for r in requests:
                prompt = np.asarray(tokenizer(r.args[0]).input_ids, np.int32)
                gen_kwargs = r.args[1] if len(r.args) > 1 else {}
                tokens = engine.generate(
                    [prompt],
                    SamplingParams(
                        max_new_tokens=gen_kwargs.get("max_gen_toks", 128),
                        temperature=gen_kwargs.get("temperature", 0.0),
                        eos_token_id=tokenizer.eos_token_id,
                    ),
                )[0]
                text = tokenizer.decode(tokens)
                for stop in gen_kwargs.get("until", []):
                    text = text.split(stop)[0]
                outs.append(text)
            return outs

    return AqlmTpuLM()
