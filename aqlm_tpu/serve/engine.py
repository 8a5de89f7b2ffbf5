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
from aqlm_tpu.serve.sampler import SamplingParams, filter_logits, sample_tokens

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
    prefix_cache: bool = True  # reuse KV rows for shared prompt prefixes
    min_prefix: int = 16  # smallest prefix worth a copy instead of recompute
    # Adaptive draft drop: permanently disable speculation when the measured
    # acceptance (after spec_warmup proposals) falls below this. Default set
    # from the r4 on-chip economics (experiments/spec_probe.py): a SAME-SIZE
    # requant draft (1x8 vs 2x8 target) costs ~0.85 target-steps per draft
    # step and a (k+1)-token verify ~2.9 steps on the VPU-bound codes path,
    # so a k=4 round costs ~6.3 step-equivalents for at most 5 tokens —
    # speculation loses at ANY acceptance with such drafts. 0.7 keeps only
    # genuinely cheaper drafts (e.g. a small separate model) alive.
    spec_min_acceptance: float = 0.7
    spec_warmup: int = 64
    decode_chunk: int = 1  # >1: emit this many tokens per compiled step (one
    # host sync per chunk; a request finishing mid-chunk wastes its tail steps)


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray
    sampling: SamplingParams
    generated: list = dataclasses.field(default_factory=list)
    logprobs: list = dataclasses.field(default_factory=list)  # raw model logprob per token
    slot: int | None = None
    done: bool = False


class Engine:
    """Continuous-batching engine over any params runtime mode.

    params: llama-family params (projections dense or QuantizedLinear in any
    mode); they are stacked once at construction.
    """

    def __init__(
        self,
        params: dict,
        cfg: llama.ModelConfig,
        serve: ServeConfig = ServeConfig(),
        *,
        draft_params: dict | None = None,
        draft_cfg: llama.ModelConfig | None = None,
        spec_k: int = 4,
        _fuse_tp: int = 1,  # TPEngine: shard-interleaved fused layout
    ):
        self.cfg = cfg
        # a prefill bucket wider than the KV cache would dynamic-update-slice
        # a [.., bucket] window into a [.., max_len] cache (out-of-bounds at
        # trace time); clamp buckets to max_len so short-cache engines work
        # with the default bucket list
        if max(serve.prefill_buckets) > serve.max_len:
            serve = dataclasses.replace(
                serve,
                prefill_buckets=tuple(
                    sorted({min(b, serve.max_len) for b in serve.prefill_buckets})
                ),
            )
        self.serve = serve
        if serve.fuse_projections or serve.lm_head_int8:
            from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8

            if serve.fuse_projections:
                from aqlm_tpu.serve.fuse import fuse_projections_codes

                params = fuse_projections(params, cfg, donate=serve.donate_params, tp=_fuse_tp)
                params = fuse_projections_codes(
                    params, cfg, donate=serve.donate_params, tp=_fuse_tp
                )
            if serve.lm_head_int8:
                params = quantize_lm_head_int8(params)
        # MoE with int8 experts: stack experts into all-expert kernel operands
        # (one launch per projection instead of a per-expert loop)
        layers = params.get("layers")
        if layers and "moe_gate" in layers[0]:
            from aqlm_tpu.models import mixtral
            from aqlm_tpu.ops.runtime import QuantizedLinear as _QL

            e0 = layers[0].get("experts.0.gate_proj")
            # expert-parallel TP always needs the stacked [E, ...] layout
            if (isinstance(e0, _QL) and e0.mode in ("int8", "int4")) or (
                _fuse_tp > 1 and e0 is not None
            ):
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
        self._prev_token = np.zeros(serve.max_batch, np.int32)  # token at offset-1 (spec)
        self._temps = np.zeros(serve.max_batch, np.float32)
        self._top_ps = np.ones(serve.max_batch, np.float32)
        self._budgets = np.zeros(serve.max_batch, np.int32)
        self._key = jax.random.PRNGKey(0)
        # prefix cache: per slot, the prompt whose KV occupies rows [0:len)
        # (positions are absolute from 0, so prefix KV is slot-portable)
        self._slot_prompts: dict[int, np.ndarray] = {}
        self.prefix_stats = {"hits": 0, "tokens_reused": 0}

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
            logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
            lps = jnp.take_along_axis(logp, next_tokens[:, None], axis=-1)[:, 0]
            if bucket != B:
                cache = jax.tree.map(
                    lambda full, part: None if full is None
                    else jax.lax.dynamic_update_slice_in_dim(full, part, 0, axis=1),
                    cache, sub, is_leaf=lambda a: a is None,
                )
            else:
                cache = sub
            return next_tokens, lps, cache

        self._decode = decode_step

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("bucket", "n"))
        def decode_chunk(params, cache: KVCache, tokens, offsets, key, temps, top_ps,
                         bucket=B, n=1):
            """n decode steps in ONE compiled loop (one host sync per chunk):
            the serving-loop form of the bench's fori_loop chaining. Slots
            that hit EOS/budget mid-chunk keep decoding (their tail tokens
            are discarded at ingest; their extra KV writes land beyond the
            finished request and are overwritten on slot reuse)."""
            if bucket == B:
                sub = cache
            else:
                sub = jax.tree.map(
                    lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, bucket, axis=1),
                    cache, is_leaf=lambda a: a is None,
                )

            def body(i, carry):
                tok, sub, off, toks, lps = carry
                logits, sub = forward_stacked(
                    params, cfg, tok, cache=sub, cache_offset=off,
                    use_flash_decode=serve.use_flash_decode,
                )
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
                0, n, body, (tokens, sub, offsets, toks0, lps0)
            )
            if bucket != B:
                cache = jax.tree.map(
                    lambda full, part: None if full is None
                    else jax.lax.dynamic_update_slice_in_dim(full, part, 0, axis=1),
                    cache, sub, is_leaf=lambda a: a is None,
                )
            else:
                cache = sub
            return toks, lps, cache

        self._decode_chunk = decode_chunk
        self._prefill_fns = {}

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("rows",))
        def copy_prefix(cache_tree, src, dst, rows):
            """Copy rows [0:rows) of slot `src` to slot `dst` (prefix reuse).
            rows is bucketed static (pow2) so only a few programs compile;
            surplus rows beyond the true prefix are overwritten/masked by the
            destination's own prefill+decode writes."""

            def cp(a):
                if a is None:
                    return None
                part = jax.lax.dynamic_slice_in_dim(a, src, 1, axis=1)
                part = jax.lax.slice_in_dim(part, 0, rows, axis=3)
                return jax.lax.dynamic_update_slice(
                    a, part, (0, dst, 0, 0, 0)
                )

            return jax.tree.map(cp, cache_tree, is_leaf=lambda a: a is None)

        self._copy_prefix = copy_prefix

        # ---- batched speculative decoding (continuous batching + draft) ----
        self._spec = None
        if draft_params is not None:
            dcfg = draft_cfg or cfg
            assert dcfg.vocab_size == cfg.vocab_size, "draft vocab must match"
            assert "moe_gate" not in (draft_params.get("layers") or [{}])[0], (
                "MoE draft models are not supported"
            )
            dp = draft_params
            if serve.fuse_projections:
                from aqlm_tpu.serve.fuse import fuse_projections, fuse_projections_codes

                dp = fuse_projections(dp, dcfg, donate=serve.donate_params, tp=_fuse_tp)
                dp = fuse_projections_codes(dp, dcfg, donate=serve.donate_params, tp=_fuse_tp)
            self._dcfg = dcfg
            self._dparams = stack_layer_params(dp, donate=serve.donate_params)
            self._dcache = init_kv_cache(
                dcfg, serve.max_batch, serve.max_len, quantized=serve.kv_quantized
            )
            self.spec_k = spec_k
            self._spec = self._make_spec_step(spec_k)
            self.spec_stats = {"proposed": 0, "accepted": 0}
            self.spec_disabled = False  # adaptive: see spec_min_acceptance

    def _make_spec_step(self, k: int):
        """Batched draft-and-verify step over the slot prefix [0:bucket].

        Same exactness contract as serve/speculative.py, vectorized over
        slots with per-slot offsets and sampling params: the draft chunk
        re-processes each slot's prev token at offset-1 (forced continuation
        of last) so an all-accepted round leaves no KV hole; the verify is
        ONE [bucket, k+1] target forward; acceptance is the greedy
        agree-prefix rule for temperature-0 rows and Leviathan
        accept/resample for sampled rows."""
        cfg, dcfg, serve = self.cfg, self._dcfg, self.serve
        B = serve.max_batch
        from aqlm_tpu.serve.speculative import batched_accept

        def sub_cache(cache, bucket):
            if bucket == B:
                return cache
            return jax.tree.map(
                lambda a: None if a is None else jax.lax.slice_in_dim(a, 0, bucket, axis=1),
                cache, is_leaf=lambda a: a is None,
            )

        def put_cache(cache, sub, bucket):
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
            b = bucket
            tsub, dsub = sub_cache(tcache, b), sub_cache(dcache, b)

            def dstep(carry, xs):
                tok, dc, off = carry
                forced, i = xs
                logits, dc = forward_stacked(
                    dparams, dcfg, tok[:, None], cache=dc, cache_offset=off,
                    use_flash_decode=serve.use_flash_decode,
                )
                lg = logits[:, -1, :]
                scaled = filter_logits(lg, temps, top_ps, serve.top_k)
                q_row = jax.nn.softmax(scaled, axis=-1)
                samp = jax.random.categorical(jax.random.fold_in(key, i), scaled, axis=-1)
                greedy = jnp.argmax(lg, axis=-1)
                nxt = jnp.where(temps > 0, samp, greedy).astype(jnp.int32)
                nxt = jnp.where(forced >= 0, forced, nxt)
                return (nxt, dc, off + 1), (nxt, q_row)

            forced = jnp.concatenate(
                [last[None, :], jnp.full((k, b), -1, jnp.int32)], axis=0
            )  # [k+1, b]
            (_, dsub, _), (toks, q_rows) = jax.lax.scan(
                dstep, (prev, dsub, offsets - 1), (forced, jnp.arange(k + 1))
            )
            draft_toks = toks[1:].T  # [b, k]
            q_rows = jnp.moveaxis(q_rows[1:], 1, 0)  # [b, k, V]

            ids = jnp.concatenate([last[:, None], draft_toks], axis=1)  # [b, k+1]
            logits, tsub = forward_stacked(
                tparams, cfg, ids, cache=tsub, cache_offset=offsets,
                use_flash_decode=serve.use_flash_decode,
            )

            rkeys = jax.random.split(jax.random.fold_in(key, k + 1), b)
            n_acc, bonus, lp_d, lp_bonus = batched_accept(
                logits, q_rows, draft_toks, temps, top_ps, rkeys,
                k=k, top_k=serve.top_k,
            )
            return (
                draft_toks, n_acc, bonus, lp_d, lp_bonus,
                put_cache(tcache, tsub, b), put_cache(dcache, dsub, b),
            )

        return spec_step

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

    def _get_prefill(self, bucket: int, draft: bool = False):
        if (bucket, draft) in self._prefill_fns:
            return self._prefill_fns[bucket, draft]
        cfg, serve = (self._dcfg if draft else self.cfg), self.serve

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
            logp = jax.nn.log_softmax(last_logits[0].astype(jnp.float32))
            return tok, logp[tok], cache

        self._prefill_fns[bucket, draft] = prefill
        return prefill

    # ---- public API --------------------------------------------------------

    def submit(self, prompt_ids, sampling: SamplingParams = SamplingParams()) -> int:
        prompt = np.asarray(prompt_ids, np.int32)
        room = self.serve.max_len - (self.spec_k + 2 if self._spec is not None else 2)
        if len(prompt) > room:
            raise ValueError(
                f"prompt of {len(prompt)} tokens leaves no decode room at "
                f"max_len={self.serve.max_len} (limit {room})"
            )
        rid = self._next_rid
        self._next_rid += 1
        req = Request(rid=rid, prompt=prompt, sampling=sampling)
        self._pending.append(req)
        self.requests[rid] = req
        return rid

    def get_request(self, rid: int) -> Request:
        return self.requests[rid]

    def abort(self, rid: int) -> bool:
        """Cancel a request: pending ones leave the queue, active ones free
        their slot after the current step. Returns False if already done."""
        req = self.requests.get(rid)
        if req is None or req.done:
            return False
        req.done = True
        if req.slot is not None and req.slot in self._active:
            import heapq as _hq

            del self._active[req.slot]
            _hq.heappush(self._free_slots, req.slot)
        else:
            try:
                self._pending.remove(req)
            except ValueError:
                pass
        return True

    def _find_prefix(self, slot: int, prompt: np.ndarray) -> int:
        """Longest reusable prompt prefix materialized in another slot's
        cache rows; 0 if below min_prefix. Capped at len(prompt)-1 so the
        final prompt token always prefills (its logits seed generation)."""
        best_slot, best_len = None, 0
        for s, toks in self._slot_prompts.items():
            m = min(len(toks), len(prompt))
            eq = toks[:m] == prompt[:m]
            l = int(eq.argmin()) if not eq.all() else m
            # same-slot reuse is free (rows already in place): prefer it on ties
            if l > best_len or (l == best_len and s == slot):
                best_slot, best_len = s, l
        best_len = min(best_len, len(prompt) - 1)
        if best_slot is None or best_len < self.serve.min_prefix:
            return 0
        if best_slot != slot:
            rows = 1 << (best_len - 1).bit_length()  # pow2 bucket: few programs
            rows = min(rows, self.serve.max_len)
            self.cache = self._copy_prefix(
                self.cache, jnp.int32(best_slot), jnp.int32(slot), rows=rows
            )
            if self._spec is not None:
                self._dcache = self._copy_prefix(
                    self._dcache, jnp.int32(best_slot), jnp.int32(slot), rows=rows
                )
        self.prefix_stats["hits"] += 1
        self.prefix_stats["tokens_reused"] += best_len
        return best_len

    def _chunks_from(self, start: int, n: int):
        """(start, length, bucket) chunks covering prompt[start:n]."""
        return [(start + s, l, b) for s, l, b in self._prefill_chunks(n - start)]

    def _admit(self):
        import heapq as _hq

        while self._pending and self._free_slots:
            req = self._pending.popleft()
            slot = _hq.heappop(self._free_slots)
            req.slot = slot
            self._key, sub = jax.random.split(self._key)
            reused = self._find_prefix(slot, req.prompt) if self.serve.prefix_cache else 0
            self._slot_prompts[slot] = req.prompt.copy()
            for start, length, bucket in self._chunks_from(reused, len(req.prompt)):
                ids = np.zeros(bucket, np.int32)
                ids[:length] = req.prompt[start : start + length]
                prefill = self._get_prefill(bucket)
                tok, lp, self.cache = prefill(
                    self.params, self.cache, jnp.asarray(ids), slot,
                    start, length, sub,
                    jnp.float32(req.sampling.temperature), jnp.float32(req.sampling.top_p),
                )
            if self._spec is not None and not self.spec_disabled:
                for start, length, bucket in self._chunks_from(reused, len(req.prompt)):
                    ids = np.zeros(bucket, np.int32)
                    ids[:length] = req.prompt[start : start + length]
                    dprefill = self._get_prefill(bucket, draft=True)
                    _, _, self._dcache = dprefill(
                        self._dparams, self._dcache, jnp.asarray(ids), slot,
                        start, length, sub, jnp.float32(0.0), jnp.float32(1.0),
                    )
                self._prev_token[slot] = req.prompt[-1]
            tok = int(tok)  # sampled from the final chunk's last position
            req.generated.append(tok)
            req.logprobs.append(float(lp))
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

    def _spec_step(self) -> dict:
        """One batched draft-and-verify round; emits up to spec_k+1 tokens
        per active slot."""
        self._key, sub = jax.random.split(self._key)
        bucket = self._decode_bucket()
        k = self.spec_k
        draft_toks, n_acc, bonus, lp_d, lp_bonus, self.cache, self._dcache = self._spec(
            self.params, self._dparams, self.cache, self._dcache,
            jnp.asarray(self._prev_token[:bucket]),
            jnp.asarray(self._last_token[:bucket]),
            jnp.asarray(self._offsets[:bucket]),
            sub,
            jnp.asarray(self._temps[:bucket]),
            jnp.asarray(self._top_ps[:bucket]),
            bucket=bucket,
        )
        draft_toks, n_acc, bonus, lp_d, lp_bonus = map(
            np.asarray, (draft_toks, n_acc, bonus, lp_d, lp_bonus)
        )
        emitted = {}
        for slot, req in list(self._active.items()):
            na = int(n_acc[slot])
            chunk = [int(t) for t in draft_toks[slot, :na]] + [int(bonus[slot])]
            chunk_lps = [float(l) for l in lp_d[slot, :na]] + [float(lp_bonus[slot])]
            self.spec_stats["proposed"] += k
            self.spec_stats["accepted"] += na
            # cache rows advanced by the full accepted+bonus chunk
            before_last = [self._last_token[slot]] + chunk
            self._offsets[slot] += na + 1
            self._budgets[slot] -= na + 1
            eos = req.sampling.eos_token_id
            if eos is not None and eos in chunk:
                chunk = chunk[: chunk.index(eos) + 1]
                self._budgets[slot] = 0
            if self._budgets[slot] < 0:  # budget truncation ends the request
                chunk = chunk[: self._budgets[slot]]
                self._budgets[slot] = 0
            req.generated.extend(chunk)
            req.logprobs.extend(chunk_lps[: len(chunk)])
            emitted[req.rid] = chunk
            self._last_token[slot] = before_last[len(chunk)]
            self._prev_token[slot] = before_last[len(chunk) - 1]
            if self._offsets[slot] >= self.serve.max_len - (k + 2):
                self._budgets[slot] = 0
            self._maybe_finish(slot)
        return emitted

    def _chunk_step(self, bucket: int, n: int, key) -> dict:
        toks, lps, self.cache = self._decode_chunk(
            self.params, self.cache,
            jnp.asarray(self._last_token[:bucket, None]),
            jnp.asarray(self._offsets[:bucket]),
            key,
            jnp.asarray(self._temps[:bucket]),
            jnp.asarray(self._top_ps[:bucket]),
            bucket=bucket, n=n,
        )
        toks, lps = np.asarray(toks), np.asarray(lps)  # [n, bucket]
        emitted = {}
        for slot, req in list(self._active.items()):
            take = min(n, int(self._budgets[slot]))
            sub = [int(t) for t in toks[:take, slot]]
            eos = req.sampling.eos_token_id
            if eos is not None and eos in sub:
                sub = sub[: sub.index(eos) + 1]
                self._budgets[slot] = 0
            req.generated.extend(sub)
            req.logprobs.extend(float(l) for l in lps[: len(sub), slot])
            emitted[req.rid] = sub
            self._offsets[slot] += n  # the cache advanced n rows regardless
            self._budgets[slot] -= n
            self._last_token[slot] = toks[-1, slot]
            self._prev_token[slot] = toks[-2, slot] if n >= 2 else self._last_token[slot]
            if self._offsets[slot] >= self.serve.max_len - 1:
                self._budgets[slot] = 0
            self._maybe_finish(slot)
        return emitted

    def step(self) -> dict:
        """Admit pending requests, run one batched decode step.
        Returns {rid: new_token} for tokens produced this step
        ({rid: [tokens]} chunks in speculative or decode_chunk mode)."""
        self._admit()
        if not self._active:
            return {}
        if self._spec is not None and not self.spec_disabled:
            emitted = self._spec_step()
            # adaptive speculation: a draft that rarely agrees costs k extra
            # forwards per round for nothing — drop it (permanently: the
            # draft cache goes stale the moment we stop maintaining it)
            if (
                self.serve.spec_min_acceptance > 0.0
                and self.spec_stats["proposed"] >= self.serve.spec_warmup
                and self.spec_stats["accepted"]
                < self.serve.spec_min_acceptance * self.spec_stats["proposed"]
            ):
                self.spec_disabled = True
            return emitted
        self._key, sub = jax.random.split(self._key)
        bucket = self._decode_bucket()
        if self.serve.decode_chunk > 1 and not self._pending:
            # chunked decode: n steps per host sync; don't run steps past the
            # longest remaining budget or anyone's cache room
            room = min(
                self.serve.max_len - 1 - int(self._offsets[s]) for s in self._active
            )
            n = max(1, min(self.serve.decode_chunk, room,
                           max(int(self._budgets[s]) for s in self._active)))
            if n > 1:
                return self._chunk_step(bucket, n, sub)
        tokens, lps, self.cache = self._decode(
            self.params,
            self.cache,
            jnp.asarray(self._last_token[:bucket, None]),
            jnp.asarray(self._offsets[:bucket]),
            sub,
            jnp.asarray(self._temps[:bucket]),
            jnp.asarray(self._top_ps[:bucket]),
            bucket=bucket,
        )
        tokens, lps = np.asarray(tokens), np.asarray(lps)
        emitted = {}
        for slot, req in list(self._active.items()):
            tok = int(tokens[slot])
            req.generated.append(tok)
            req.logprobs.append(float(lps[slot]))
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
