"""Continuous-batching decode engine.

The serving layer the reference lacks (SURVEY.md §1: "no server/scheduler
layer — serving is delegated to HF model.generate and vLLM"). Design:

- one compiled decode step for the whole slot batch (scan-over-layers model,
  donated KV cache — the XLA equivalent of the reference's CUDA-graph static
  cache trick, notebooks/aqlm_cuda_graph.ipynb);
- per-request prefill into a free slot, bucketed by prompt length so only a
  handful of prefill programs ever compile;
- requests join/leave the batch between steps (continuous batching); sampling
  params are per-slot traced arrays, so heterogeneous requests share the step.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import llama
from aqlm_tpu.models.stacked import KVCache, forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve.sampler import SamplingParams, sample_tokens

__all__ = ["ServeConfig", "Engine", "Request"]


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    max_batch: int = 4
    max_len: int = 2048
    prefill_buckets: tuple = (64, 256, 1024)
    kv_quantized: bool = False  # int8 KV cache
    top_k: int = 0  # static top-k bound for the sampler
    fuse_projections: bool = True  # QKV / gate+up fusion for int8-mode layers
    lm_head_int8: bool = False  # int8-quantize the output head
    donate_params: bool = False  # free caller's params during load (big models)
    use_flash_decode: bool | None = None  # None = stacked.forward default (flash on)


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray
    sampling: SamplingParams
    generated: list = dataclasses.field(default_factory=list)
    slot: int | None = None
    done: bool = False


class Engine:
    """Continuous-batching engine over any params runtime mode.

    params: llama-family params (projections dense or QuantizedLinear in any
    mode); they are stacked once at construction.
    """

    def __init__(self, params: dict, cfg: llama.ModelConfig, serve: ServeConfig = ServeConfig()):
        self.cfg = cfg
        self.serve = serve
        if serve.fuse_projections or serve.lm_head_int8:
            from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8

            if serve.fuse_projections:
                from aqlm_tpu.serve.fuse import fuse_projections_codes

                params = fuse_projections(params, cfg, donate=serve.donate_params)
                params = fuse_projections_codes(params, cfg, donate=serve.donate_params)
            if serve.lm_head_int8:
                params = quantize_lm_head_int8(params)
        # MoE with int8 experts: stack experts into all-expert kernel operands
        # (one launch per projection instead of a per-expert loop)
        layers = params.get("layers")
        if layers and "moe_gate" in layers[0]:
            from aqlm_tpu.models import mixtral
            from aqlm_tpu.ops.runtime import QuantizedLinear as _QL

            e0 = layers[0].get("experts.0.gate_proj")
            if isinstance(e0, _QL) and e0.mode == "int8":
                params = dict(params)
                params["layers"] = [mixtral.stack_experts(l, cfg) for l in layers]
        self.params = stack_layer_params(params, donate=serve.donate_params)
        self.cache = init_kv_cache(
            cfg, serve.max_batch, serve.max_len, quantized=serve.kv_quantized
        )
        # lowest-first slot allocation keeps active slots in a prefix so
        # decode batch bucketing stays tight (see decode_step)
        self._free_slots = list(range(serve.max_batch))
        import heapq as _hq

        _hq.heapify(self._free_slots)
        self._active: dict[int, Request] = {}
        self._pending: deque[Request] = deque()
        self.requests: dict[int, Request] = {}
        self._next_rid = 0
        self._offsets = np.zeros(serve.max_batch, np.int32)  # next write position per slot
        self._last_token = np.zeros(serve.max_batch, np.int32)
        self._temps = np.zeros(serve.max_batch, np.float32)
        self._top_ps = np.ones(serve.max_batch, np.float32)
        self._budgets = np.zeros(serve.max_batch, np.int32)
        self._key = jax.random.PRNGKey(0)

        B = serve.max_batch

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("bucket",))
        def decode_step(params, cache: KVCache, tokens, offsets, key, temps, top_ps, bucket=B):
            """One decode step over slot prefix [0:bucket] (batch bucketing:
            with few active requests, computing all max_batch slots wastes
            batch width — and pushes small-batch codes decode off the LUT
            kernels). Slots are allocated lowest-first so active requests
            cluster in a prefix; the sub-cache is sliced out, decoded, and
            written back (prefix-cache copy traffic only)."""
            if bucket == B:
                sub = cache
            else:
                sub = jax.tree.map(
                    lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, bucket, axis=1),
                    cache, is_leaf=lambda a: a is None,
                )
            logits, sub = forward_stacked(
                params, cfg, tokens, cache=sub, cache_offset=offsets,
                use_flash_decode=serve.use_flash_decode,
            )
            next_tokens = sample_tokens(
                logits[:, -1, :], key, temps, top_ps, top_k=serve.top_k
            )
            if bucket != B:
                cache = jax.tree.map(
                    lambda full, part: None if full is None
                    else jax.lax.dynamic_update_slice_in_dim(full, part, 0, axis=1),
                    cache, sub, is_leaf=lambda a: a is None,
                )
            else:
                cache = sub
            return next_tokens, cache

        self._decode = decode_step
        self._prefill_fns = {}

    def _decode_bucket(self) -> int:
        """Smallest power-of-two slot prefix covering every active slot."""
        hi = max(self._active) + 1
        b = 1
        while b < hi:
            b *= 2
        return min(b, self.serve.max_batch)

    def _bucket(self, n: int) -> int:
        for b in self.serve.prefill_buckets:
            if n <= b:
                return b
        # longer prompts prefill in chunks of the largest bucket (_admit)
        return max(self.serve.prefill_buckets)

    def _prefill_chunks(self, n: int):
        """(start, length, bucket) chunks covering an n-token prompt."""
        big = max(self.serve.prefill_buckets)
        chunks, start = [], 0
        while n - start > big:
            chunks.append((start, big, big))
            start += big
        rem = n - start
        chunks.append((start, rem, self._bucket(rem)))
        return chunks

    def _get_prefill(self, bucket: int):
        if bucket in self._prefill_fns:
            return self._prefill_fns[bucket]
        cfg, serve = self.cfg, self.serve

        @partial(jax.jit, donate_argnums=(1,), static_argnames=())
        def prefill(params, cache: KVCache, ids, slot, start, true_len, key, temp, top_p):
            """Prefill one chunk (batch 1, padded to `bucket`) into `slot` at
            cache offset `start` — prompts longer than the largest bucket
            chunk through this with increasing offsets (chunked prefill)."""
            # slice this slot's cache rows (batch of 1)
            take = lambda x: jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=1) if x is not None else None
            slot_cache = KVCache(
                k=take(cache.k), v=take(cache.v),
                k_scale=take(cache.k_scale), v_scale=take(cache.v_scale),
            )
            logits, slot_cache = forward_stacked(
                params, cfg, ids[None, :], cache=slot_cache,
                cache_offset=jnp.full((1,), start, jnp.int32),
            )
            put = lambda full, part: (
                jax.lax.dynamic_update_slice_in_dim(full, part, slot, axis=1)
                if full is not None
                else None
            )
            cache = KVCache(
                k=put(cache.k, slot_cache.k), v=put(cache.v, slot_cache.v),
                k_scale=put(cache.k_scale, slot_cache.k_scale),
                v_scale=put(cache.v_scale, slot_cache.v_scale),
            )
            last_logits = jax.lax.dynamic_slice_in_dim(logits[0], true_len - 1, 1, axis=0)
            tok = sample_tokens(
                last_logits, key, temp[None], top_p[None], top_k=serve.top_k
            )[0]
            return tok, cache

        self._prefill_fns[bucket] = prefill
        return prefill

    # ---- public API --------------------------------------------------------

    def submit(self, prompt_ids, sampling: SamplingParams = SamplingParams()) -> int:
        rid = self._next_rid
        self._next_rid += 1
        req = Request(rid=rid, prompt=np.asarray(prompt_ids, np.int32), sampling=sampling)
        self._pending.append(req)
        self.requests[rid] = req
        return rid

    def get_request(self, rid: int) -> Request:
        return self.requests[rid]

    def _admit(self):
        import heapq as _hq

        while self._pending and self._free_slots:
            req = self._pending.popleft()
            slot = _hq.heappop(self._free_slots)
            req.slot = slot
            self._key, sub = jax.random.split(self._key)
            for start, length, bucket in self._prefill_chunks(len(req.prompt)):
                ids = np.zeros(bucket, np.int32)
                ids[:length] = req.prompt[start : start + length]
                prefill = self._get_prefill(bucket)
                tok, self.cache = prefill(
                    self.params, self.cache, jnp.asarray(ids), slot,
                    start, length, sub,
                    jnp.float32(req.sampling.temperature), jnp.float32(req.sampling.top_p),
                )
            tok = int(tok)  # sampled from the final chunk's last position
            req.generated.append(tok)
            self._active[slot] = req
            self._offsets[slot] = len(req.prompt)
            self._last_token[slot] = tok
            self._temps[slot] = req.sampling.temperature
            self._top_ps[slot] = req.sampling.top_p
            self._budgets[slot] = req.sampling.max_new_tokens - 1
            self._maybe_finish(slot)

    def _maybe_finish(self, slot: int):
        req = self._active.get(slot)
        if req is None:
            return
        eos = req.sampling.eos_token_id
        if self._budgets[slot] <= 0 or (eos is not None and req.generated and req.generated[-1] == eos):
            req.done = True
            del self._active[slot]
            import heapq as _hq

            _hq.heappush(self._free_slots, slot)

    def step(self) -> dict:
        """Admit pending requests, run one batched decode step.
        Returns {rid: new_token} for tokens produced this step."""
        self._admit()
        if not self._active:
            return {}
        self._key, sub = jax.random.split(self._key)
        bucket = self._decode_bucket()
        tokens, self.cache = self._decode(
            self.params,
            self.cache,
            jnp.asarray(self._last_token[:bucket, None]),
            jnp.asarray(self._offsets[:bucket]),
            sub,
            jnp.asarray(self._temps[:bucket]),
            jnp.asarray(self._top_ps[:bucket]),
            bucket=bucket,
        )
        tokens = np.asarray(tokens)
        emitted = {}
        for slot, req in list(self._active.items()):
            tok = int(tokens[slot])
            req.generated.append(tok)
            emitted[req.rid] = tok
            self._offsets[slot] += 1
            self._last_token[slot] = tok
            self._budgets[slot] -= 1
            if self._offsets[slot] >= self.serve.max_len - 1:
                self._budgets[slot] = 0
            self._maybe_finish(slot)
        return emitted

    def generate(self, prompts, sampling: SamplingParams = SamplingParams()) -> list:
        """Blocking batch generate: returns a list of generated-token lists."""
        rids = [self.submit(p, sampling) for p in prompts]
        while self._pending or self._active:
            self.step()
        return [self.requests[rid].generated for rid in rids]
