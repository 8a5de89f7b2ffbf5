"""Engine prefix caching: KV rows of a shared prompt prefix are copied
between slots instead of recomputed. Exactness bar: greedy outputs with the
prefix cache on must equal the outputs with it off, across concurrent
admissions, slot reuse after free, and speculative mode."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def _cfg_params():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32
    )
    return cfg, params


SYSTEM = np.arange(1, 25, dtype=np.int32)  # 24-token shared "system prompt"
PROMPTS = [
    np.concatenate([SYSTEM, np.asarray([101, 102, 103], np.int32)]),
    np.concatenate([SYSTEM, np.asarray([55], np.int32)]),
    np.concatenate([SYSTEM, np.asarray([7, 7, 9, 9], np.int32)]),
]


def test_prefix_cache_exact_concurrent_and_reused_slots():
    cfg, params = _cfg_params()
    base = ServeConfig(max_batch=2, max_len=128, prefill_buckets=(8, 32), min_prefix=8)
    sampling = SamplingParams(max_new_tokens=8)

    off = Engine(params, cfg, dataclasses_replace(base, prefix_cache=False))
    ref = off.generate(PROMPTS, sampling)

    on = Engine(params, cfg, base)
    got = on.generate(PROMPTS, sampling)
    assert got == ref, (got, ref)
    # 3 requests through 2 slots: at least the 2nd and 3rd hit the prefix
    assert on.prefix_stats["hits"] >= 2, on.prefix_stats
    assert on.prefix_stats["tokens_reused"] >= 2 * (len(SYSTEM) - 1)


def test_prefix_cache_sequential_freed_slot():
    """Reuse from a slot that already finished (rows persist until reuse)."""
    cfg, params = _cfg_params()
    serve = ServeConfig(max_batch=1, max_len=128, prefill_buckets=(8, 32), min_prefix=8)
    sampling = SamplingParams(max_new_tokens=6)

    off = Engine(params, cfg, dataclasses_replace(serve, prefix_cache=False))
    ref = [off.generate([p], sampling)[0] for p in PROMPTS[:2]]

    on = Engine(params, cfg, serve)
    got = [on.generate([p], sampling)[0] for p in PROMPTS[:2]]
    assert got == ref, (got, ref)
    # one slot: the 2nd request reuses the SAME slot's rows in place (no copy)
    assert on.prefix_stats["hits"] == 1, on.prefix_stats


def test_prefix_cache_speculative_mode():
    cfg, params = _cfg_params()
    draft = llama.init_random_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=128, prefill_buckets=(8, 32), min_prefix=8)
    sampling = SamplingParams(max_new_tokens=8)

    plain = Engine(params, cfg, dataclasses_replace(serve, prefix_cache=False))
    ref = plain.generate(PROMPTS, sampling)
    eng = Engine(params, cfg, serve, draft_params=draft, draft_cfg=cfg, spec_k=2)
    got = eng.generate(PROMPTS, sampling)
    assert got == ref, (got, ref)
    assert eng.prefix_stats["hits"] >= 2


def test_no_false_prefix_reuse():
    """Disjoint prompts must not reuse anything and stay exact."""
    cfg, params = _cfg_params()
    serve = ServeConfig(max_batch=2, max_len=128, prefill_buckets=(8, 32), min_prefix=8)
    prompts = [np.asarray([3, 1, 4, 1, 5], np.int32), np.asarray([9, 8, 7, 6, 5, 4], np.int32)]
    sampling = SamplingParams(max_new_tokens=6)
    ref = Engine(params, cfg, dataclasses_replace(serve, prefix_cache=False)).generate(
        prompts, sampling
    )
    on = Engine(params, cfg, serve)
    assert on.generate(prompts, sampling) == ref
    assert on.prefix_stats["hits"] == 0


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)
