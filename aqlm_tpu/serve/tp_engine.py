"""Tensor-parallel continuous-batching engine.

The BASELINE north star serves a big AQLM model across a v5e slice; the
single-chip Engine provides the scheduler (continuous batching, chunked
prefill, prefix caching) and this subclass swaps its compiled pieces for the
shard_map'd TP programs (serve/tp.py): params column/row-sharded, KV heads
sharded, lm_head vocab-sharded, ONE (llama) or HALF (cohere parallel block)
all-reduce pair per block. The scheduler, bookkeeping, and API are shared
— a TPEngine is a drop-in Engine for the HTTP daemon and CLIs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqlm_tpu.models import llama
from aqlm_tpu.serve.engine import Engine, ServeConfig
from aqlm_tpu.serve.sampler import sample_tokens
from aqlm_tpu.serve.tp import (
    make_tp_decode_step,
    make_tp_prefill_step,
    tp_kv_cache_spec,
    tp_serving_param_specs,
)

__all__ = ["TPEngine"]


class TPEngine(Engine):
    """Engine whose prefill/decode run under shard_map over `mesh`.

    Speculative decoding is not yet wired through TP (pass no draft); all
    other Engine features (chunked prefill, prefix caching, bucketing of
    requests, sampling) work unchanged.
    """

    def __init__(
        self,
        params: dict,
        cfg: llama.ModelConfig,
        serve: ServeConfig = ServeConfig(),
        *,
        mesh: Mesh,
        model_axis: str = "model",
    ):
        super().__init__(params, cfg, serve, _fuse_tp=mesh.shape[model_axis])
        assert self._spec is None, "speculative TP serving is not supported yet"
        self.mesh, self.ma = mesh, model_axis

        # shard the stacked params + cache over the mesh
        specs = tp_serving_param_specs(self.params, model_axis)
        place = lambda x, s: None if x is None else jax.device_put(x, NamedSharding(mesh, s))
        self.params = jax.tree.map(place, self.params, specs, is_leaf=lambda x: x is None)
        cache_spec = tp_kv_cache_spec(model_axis)
        self.cache = jax.tree.map(
            place, self.cache, cache_spec, is_leaf=lambda x: x is None
        )

        tp_step = make_tp_decode_step(cfg, mesh, model_axis)
        tp_prefill = make_tp_prefill_step(cfg, mesh, model_axis)
        B = serve.max_batch

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("bucket",))
        def decode_step(params, cache, tokens, offsets, key, temps, top_ps, bucket=B):
            logits, cache = tp_step(params, cache, tokens, offsets)
            next_tokens = sample_tokens(
                logits[:, -1, :], key, temps, top_ps, top_k=serve.top_k
            )
            logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
            lps = jnp.take_along_axis(logp, next_tokens[:, None], axis=-1)[:, 0]
            return next_tokens, lps, cache

        self._decode = decode_step

        @partial(jax.jit, donate_argnums=(1,))
        def prefill(params, cache, ids, slot, start, true_len, key, temp, top_p):
            logits, cache = tp_prefill(params, cache, ids, slot, start, true_len)
            tok = sample_tokens(
                logits[None, :], key, temp[None], top_p[None], top_k=serve.top_k
            )[0]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return tok, logp[tok], cache

        self._tp_prefill = prefill

    def _decode_bucket(self) -> int:
        return self.serve.max_batch  # TP step runs the full slot batch

    def _get_prefill(self, bucket: int, draft: bool = False):
        assert not draft
        return self._tp_prefill
