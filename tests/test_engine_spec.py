"""Batched speculative decoding inside the continuous-batching Engine.

Exactness contract: with temperature 0 a speculative Engine must emit
token-for-token what the plain Engine emits, for every request, including
staggered admissions through fewer slots — regardless of draft quality.
A self-draft accepts everything."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def _cfg_params():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    # f32: the CPU backend cannot execute bf16xbf16 dots (batch>1 decode)
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32
    )
    return cfg, params


def test_spec_engine_matches_plain_engine_greedy():
    cfg, params = _cfg_params()
    draft = llama.init_random_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=96, prefill_buckets=(8,))
    prompts = [np.asarray([3, 1, 4], np.int32), np.asarray([2, 7, 1, 8, 2, 8], np.int32)]
    sampling = SamplingParams(max_new_tokens=12)

    plain = Engine(params, cfg, serve).generate(prompts, sampling)
    eng = Engine(params, cfg, serve, draft_params=draft, draft_cfg=cfg, spec_k=3)
    spec = eng.generate(prompts, sampling)
    assert spec == plain, (spec, plain)
    assert all(len(t) == 12 for t in spec)
    assert eng.spec_stats["proposed"] > 0


def test_spec_engine_staggered_admission():
    """3 requests through 2 slots: slot reuse must not corrupt the draft or
    target caches (stale rows from the previous occupant)."""
    cfg, params = _cfg_params()
    draft = llama.init_random_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=96, prefill_buckets=(8,))
    prompts = [
        np.asarray([3, 1, 4], np.int32),
        np.asarray([2, 7, 1, 8], np.int32),
        np.asarray([5, 5, 5], np.int32),
    ]
    sampling = SamplingParams(max_new_tokens=9)
    plain = Engine(params, cfg, serve).generate(prompts, sampling)
    spec = Engine(params, cfg, serve, draft_params=draft, draft_cfg=cfg, spec_k=2).generate(
        prompts, sampling
    )
    assert spec == plain, (spec, plain)


def test_spec_engine_self_draft_accepts_all():
    cfg, params = _cfg_params()
    eng = Engine(
        params, cfg, ServeConfig(max_batch=2, max_len=96, prefill_buckets=(8,)),
        draft_params=params, draft_cfg=cfg, spec_k=3,
    )
    outs = eng.generate([np.asarray([3, 1, 4], np.int32)], SamplingParams(max_new_tokens=10))
    assert len(outs[0]) == 10
    assert eng.spec_stats["accepted"] == eng.spec_stats["proposed"], eng.spec_stats


def test_adaptive_speculation_disables_bad_draft():
    """A draft that never agrees gets dropped after the warmup, and the
    output stays exact (the engine continues on the plain decode path)."""
    import dataclasses

    cfg, params = _cfg_params()
    draft = llama.init_random_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=1, max_len=160, prefill_buckets=(8,),
                        spec_min_acceptance=0.3, spec_warmup=12)
    prompts = [np.asarray([3, 1, 4], np.int32)]
    sampling = SamplingParams(max_new_tokens=30)
    ref = Engine(params, cfg, dataclasses.replace(serve, spec_min_acceptance=0.0)).generate(
        prompts, sampling
    )
    eng = Engine(params, cfg, serve, draft_params=draft, draft_cfg=cfg, spec_k=3)
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)
    assert eng.spec_disabled
    # proposals stopped shortly after the warmup threshold
    assert eng.spec_stats["proposed"] <= serve.spec_warmup + 3


def test_spec_engine_eos_mid_chunk():
    """An EOS accepted inside a chunk must end the request at the EOS."""
    cfg, params = _cfg_params()
    # run once to learn the greedy stream, then set eos to the 4th token
    plain = Engine(params, cfg, ServeConfig(max_batch=1, max_len=96, prefill_buckets=(8,)))
    ref = plain.generate([np.asarray([3, 1, 4], np.int32)], SamplingParams(max_new_tokens=10))[0]
    eos = ref[3]
    if eos in ref[:3]:  # make sure position 3 is the FIRST occurrence
        import pytest

        pytest.skip("random stream repeats the eos token earlier")
    eng = Engine(
        params, cfg, ServeConfig(max_batch=1, max_len=96, prefill_buckets=(8,)),
        draft_params=params, draft_cfg=cfg, spec_k=3,
    )
    out = eng.generate(
        [np.asarray([3, 1, 4], np.int32)],
        SamplingParams(max_new_tokens=10, eos_token_id=int(eos)),
    )[0]
    assert out == ref[:4], (out, ref)
