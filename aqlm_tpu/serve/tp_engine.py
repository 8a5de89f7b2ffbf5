"""Tensor-parallel continuous-batching engine.

The BASELINE north star serves a big AQLM model across a v5e slice; the
single-chip Engine provides the scheduler (continuous batching, chunked
prefill, prefix caching, speculative decoding) and this subclass swaps its
compiled pieces for the shard_map'd TP programs (serve/tp.py): params
column/row-sharded, KV heads sharded, lm_head vocab-sharded, ONE (llama) or
HALF (cohere parallel block) all-reduce pair per block. The scheduler,
bookkeeping, and API are shared — a TPEngine is a drop-in Engine for the
HTTP daemon and CLIs, including --draft_model speculative serving.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqlm_tpu.models import llama
from aqlm_tpu.serve.engine import Engine, ServeConfig
from aqlm_tpu.serve.sampler import filter_logits, sample_tokens
from aqlm_tpu.serve.tp import (
    make_tp_decode_step,
    make_tp_prefill_step,
    tp_kv_cache_spec,
    tp_serving_param_specs,
)

__all__ = ["TPEngine"]


class TPEngine(Engine):
    """Engine whose prefill/decode/speculative steps run under shard_map
    over `mesh`. All Engine features (chunked prefill, prefix caching,
    sampling, batched speculative decoding) work unchanged — the draft
    model, when given, is sharded over the same mesh."""

    def __init__(
        self,
        params: dict,
        cfg: llama.ModelConfig,
        serve: ServeConfig = ServeConfig(),
        *,
        mesh: Mesh,
        model_axis: str = "model",
        draft_params: dict | None = None,
        draft_cfg: llama.ModelConfig | None = None,
        spec_k: int = 4,
    ):
        tp = mesh.shape[model_axis]
        super().__init__(
            params, cfg, serve,
            draft_params=draft_params, draft_cfg=draft_cfg, spec_k=spec_k,
            _fuse_tp=tp,
        )
        self.mesh, self.ma = mesh, model_axis

        # shard the stacked params + cache over the mesh
        place = lambda x, s: None if x is None else jax.device_put(x, NamedSharding(mesh, s))
        self.params = jax.tree.map(
            place, self.params, tp_serving_param_specs(self.params, model_axis),
            is_leaf=lambda x: x is None,
        )
        cache_spec = tp_kv_cache_spec(model_axis)
        self.cache = jax.tree.map(
            place, self.cache, cache_spec, is_leaf=lambda x: x is None
        )

        tp_step = make_tp_decode_step(
            cfg, mesh, model_axis, use_flash_decode=serve.use_flash_decode
        )
        tp_prefill = make_tp_prefill_step(cfg, mesh, model_axis)
        B = serve.max_batch

        def _sub(cache, bucket):
            """Slot-prefix sub-cache (batch bucketing, same as the single-chip
            decode_step): the batch axis is unsharded, so the slice is local
            on every device."""
            if bucket == B:
                return cache
            return jax.tree.map(
                lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, bucket, axis=1),
                cache, is_leaf=lambda a: a is None,
            )

        def _put(cache, sub, bucket):
            if bucket == B:
                return sub
            return jax.tree.map(
                lambda full, part: None if full is None
                else jax.lax.dynamic_update_slice_in_dim(full, part, 0, axis=1),
                cache, sub, is_leaf=lambda a: a is None,
            )

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("bucket",))
        def decode_step(params, cache, tokens, offsets, key, temps, top_ps, bucket=B):
            sub = _sub(cache, bucket)
            logits, sub = tp_step(params, sub, tokens, offsets)
            next_tokens = sample_tokens(
                logits[:, -1, :], key, temps, top_ps, top_k=serve.top_k
            )
            logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
            lps = jnp.take_along_axis(logp, next_tokens[:, None], axis=-1)[:, 0]
            return next_tokens, lps, _put(cache, sub, bucket)

        self._decode = decode_step

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("bucket", "n"))
        def decode_chunk(params, cache, tokens, offsets, key, temps, top_ps, bucket=B, n=1):
            """n TP decode steps per host sync (Engine._chunk_step contract)."""
            sub0 = _sub(cache, bucket)

            def body(i, carry):
                tok, sub, off, toks, lps = carry
                logits, sub = tp_step(params, sub, tok, off)
                nxt = sample_tokens(
                    logits[:, -1, :], jax.random.fold_in(key, i), temps, top_ps,
                    top_k=serve.top_k,
                )
                logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
                lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
                return (
                    nxt[:, None], sub, off + 1,
                    jax.lax.dynamic_update_index_in_dim(toks, nxt, i, axis=0),
                    jax.lax.dynamic_update_index_in_dim(lps, lp, i, axis=0),
                )

            toks0 = jnp.zeros((n, bucket), jnp.int32)
            lps0 = jnp.zeros((n, bucket), jnp.float32)
            _, sub, _, toks, lps = jax.lax.fori_loop(
                0, n, body, (tokens, sub0, offsets, toks0, lps0)
            )
            return toks, lps, _put(cache, sub, bucket)

        self._decode_chunk = decode_chunk

        def make_prefill(tp_prefill_fn):
            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, cache, ids, slot, start, true_len, key, temp, top_p):
                logits, cache = tp_prefill_fn(params, cache, ids, slot, start, true_len)
                tok = sample_tokens(
                    logits[None, :], key, temp[None], top_p[None], top_k=serve.top_k
                )[0]
                logp = jax.nn.log_softmax(logits.astype(jnp.float32))
                return tok, logp[tok], cache

            return prefill

        self._tp_prefill = make_prefill(tp_prefill)

        if self._spec is not None:
            dcfg = self._dcfg
            self._dparams = jax.tree.map(
                place, self._dparams, tp_serving_param_specs(self._dparams, model_axis),
                is_leaf=lambda x: x is None,
            )
            self._dcache = jax.tree.map(
                place, self._dcache, tp_kv_cache_spec(model_axis),
                is_leaf=lambda x: x is None,
            )
            tp_dstep = make_tp_decode_step(
                dcfg, mesh, model_axis, use_flash_decode=serve.use_flash_decode
            )
            self._tp_prefill_draft = make_prefill(make_tp_prefill_step(dcfg, mesh, model_axis))
            self._spec = self._make_tp_spec_step(spec_k, tp_step, tp_dstep)

    def _make_tp_spec_step(self, k: int, tp_step, tp_dstep):
        """TP analogue of Engine._make_spec_step: the draft scan and the
        [B, k+1] verify run through the shard_map'd TP steps; the accept
        math is replicated (logits are all-gathered and tiny at decode)."""
        serve = self.serve
        B = serve.max_batch
        from aqlm_tpu.serve.speculative import batched_accept

        def _sub(cache, bucket):
            if bucket == B:
                return cache
            return jax.tree.map(
                lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, bucket, axis=1),
                cache, is_leaf=lambda a: a is None,
            )

        def _put(cache, sub, bucket):
            if bucket == B:
                return sub
            return jax.tree.map(
                lambda full, part: None if full is None
                else jax.lax.dynamic_update_slice_in_dim(full, part, 0, axis=1),
                cache, sub, is_leaf=lambda a: a is None,
            )

        @partial(jax.jit, donate_argnums=(2, 3), static_argnames=("bucket",))
        def spec_step(
            tparams, dparams, tcache, dcache, prev, last, offsets, key,
            temps, top_ps, bucket=B,
        ):
            tsub, dsub = _sub(tcache, bucket), _sub(dcache, bucket)

            def dstep(carry, xs):
                tok, dc, off = carry
                forced, i = xs
                logits, dc = tp_dstep(dparams, dc, tok[:, None], off)
                lg = logits[:, -1, :]
                scaled = filter_logits(lg, temps, top_ps, serve.top_k)
                q_row = jax.nn.softmax(scaled, axis=-1)
                samp = jax.random.categorical(jax.random.fold_in(key, i), scaled, axis=-1)
                greedy = jnp.argmax(lg, axis=-1)
                nxt = jnp.where(temps > 0, samp, greedy).astype(jnp.int32)
                nxt = jnp.where(forced >= 0, forced, nxt)
                return (nxt, dc, off + 1), (nxt, q_row)

            forced = jnp.concatenate(
                [last[None, :], jnp.full((k, bucket), -1, jnp.int32)], axis=0
            )
            (_, dsub, _), (toks, q_rows) = jax.lax.scan(
                dstep, (prev, dsub, offsets - 1), (forced, jnp.arange(k + 1))
            )
            draft_toks = toks[1:].T  # [bucket, k]
            q_rows = jnp.moveaxis(q_rows[1:], 1, 0)

            ids = jnp.concatenate([last[:, None], draft_toks], axis=1)
            logits, tsub = tp_step(tparams, tsub, ids, offsets)

            rkeys = jax.random.split(jax.random.fold_in(key, k + 1), bucket)
            n_acc, bonus, lp_d, lp_bonus = batched_accept(
                logits, q_rows, draft_toks, temps, top_ps, rkeys,
                k=k, top_k=serve.top_k,
            )
            return (
                draft_toks, n_acc, bonus, lp_d, lp_bonus,
                _put(tcache, tsub, bucket), _put(dcache, dsub, bucket),
            )

        return spec_step

    def _get_prefill(self, bucket: int, draft: bool = False):
        return self._tp_prefill_draft if draft else self._tp_prefill
