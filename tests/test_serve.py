"""Serving tests: stacked forward == unrolled forward, KV-cache decode ==
full-context forward, int8 KV sanity, sampler semantics, and the continuous
batching engine against a straightforward reference decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig, sample_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_stacked_matches_unrolled(setup):
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    ref, _ = llama.forward(params, cfg, ids)
    stacked = stack_layer_params(params)
    got, _ = forward_stacked(stacked, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_stacked_quantized_params(setup):
    cfg, _ = setup
    qparams = random_quantized_params(jax.random.PRNGKey(2), cfg, SCHEME_2X8, mode="reference")
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    ref, _ = llama.forward(qparams, cfg, ids)
    got, _ = forward_stacked(stack_layer_params(qparams), cfg, ids)
    # bf16 params: scan and unrolled programs round differently at bf16 ULP
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.06, rtol=0.05
    )


@pytest.mark.parametrize("quantized_kv,flash", [(False, False), (True, False), (False, True), (True, True)])
def test_cached_decode_matches_full_forward(setup, quantized_kv, flash):
    cfg, params = setup
    stacked = stack_layer_params(params)
    t = 10
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, cfg.vocab_size)

    full_logits, _ = forward_stacked(stacked, cfg, ids)

    cache = init_kv_cache(cfg, 1, 32, quantized=quantized_kv)
    # prefill first 6, then decode one at a time
    logits, cache = forward_stacked(
        stacked, cfg, ids[:, :6], cache=cache, cache_offset=jnp.zeros((1,), jnp.int32)
    )
    step_logits = [logits[:, i] for i in range(6)]
    for pos in range(6, t):
        logits, cache = forward_stacked(
            stacked, cfg, ids[:, pos : pos + 1], cache=cache,
            cache_offset=jnp.full((1,), pos, jnp.int32),
            use_flash_decode=flash,
        )
        step_logits.append(logits[:, 0])
    got = jnp.stack(step_logits, axis=1)
    # padded-cache attention sums in a different order than the exact-length
    # forward; int8 KV additionally quantizes -> looser bound
    atol = 0.3 if quantized_kv else 0.03
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(full_logits, np.float32), atol=atol, rtol=0.05
    )


def test_sampler_greedy_and_topp(key):
    logits = jnp.asarray([[1.0, 5.0, 2.0, 0.0], [0.1, 0.2, 9.0, 8.9]])
    toks = sample_tokens(logits, key, jnp.zeros(2), jnp.ones(2))
    np.testing.assert_array_equal(np.asarray(toks), [1, 2])
    # top_p=tiny -> only the argmax survives even at high temperature
    toks = sample_tokens(logits, key, jnp.full(2, 5.0), jnp.full(2, 1e-6))
    np.testing.assert_array_equal(np.asarray(toks), [1, 2])
    # top_k=1 same
    toks = sample_tokens(logits, key, jnp.full(2, 5.0), jnp.ones(2), top_k=1)
    np.testing.assert_array_equal(np.asarray(toks), [1, 2])


@pytest.mark.slow
def test_engine_matches_manual_greedy(setup):
    cfg, params = setup
    engine = Engine(params, cfg, ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16)))
    prompt = np.asarray([3, 17, 5, 9], np.int32)
    out = engine.generate([prompt], SamplingParams(max_new_tokens=6))[0]
    assert len(out) == 6

    # manual greedy decode with the plain forward
    ids = list(prompt)
    manual = []
    for _ in range(6):
        logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        manual.append(tok)
        ids.append(tok)
    assert out == manual, (out, manual)


@pytest.mark.slow
def test_engine_continuous_batching(setup):
    cfg, params = setup
    engine = Engine(params, cfg, ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,)))
    prompts = [np.asarray([1, 2, 3], np.int32), np.asarray([7, 8], np.int32),
               np.asarray([4, 4, 4, 4], np.int32)]  # 3 requests, 2 slots
    outs = engine.generate(prompts, SamplingParams(max_new_tokens=4))
    assert [len(o) for o in outs] == [4, 4, 4]
    # each prompt's output equals its solo run (batching must not cross-talk)
    for p, o in zip(prompts, outs):
        solo_engine = Engine(params, cfg, ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,)))
        solo = solo_engine.generate([p], SamplingParams(max_new_tokens=4))[0]
        assert o == solo, (o, solo)


@pytest.mark.slow
def test_engine_eos_stops(setup):
    cfg, params = setup
    engine = Engine(params, cfg, ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,)))
    prompt = np.asarray([3, 17, 5, 9], np.int32)
    ref = engine.generate([prompt], SamplingParams(max_new_tokens=8))[0]
    eos = ref[2]
    engine2 = Engine(params, cfg, ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,)))
    out = engine2.generate([prompt], SamplingParams(max_new_tokens=8, eos_token_id=eos))[0]
    assert out == ref[:3]


def test_chunked_prefill_long_prompt(key):
    """Prompts longer than the largest prefill bucket chunk through; output
    must equal a manual greedy rollout."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    engine = Engine(
        params, cfg,
        ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,), fuse_projections=False,
                    use_flash_decode=False),  # f32 dense model: flash's bf16
        # compute flips greedy argmax on near-ties; chunking is what's under test
    )
    prompt = np.asarray(jax.random.randint(jax.random.PRNGKey(5), (21,), 0, cfg.vocab_size), np.int32)
    outs = engine.generate([prompt], SamplingParams(max_new_tokens=4))

    ids = list(prompt)
    manual = []
    for _ in range(4):
        logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        manual.append(tok)
        ids.append(tok)
    assert outs[0] == manual, (outs[0], manual)


def test_decode_batch_bucketing(key):
    """max_batch=8 engine with 1 request decodes over a width-1 bucket and
    still matches manual greedy; a second staggered request works too."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32)
    engine = Engine(
        params, cfg,
        ServeConfig(max_batch=8, max_len=32, prefill_buckets=(8,), fuse_projections=False),
    )
    assert engine._free_slots[0] == 0  # lowest-first allocation
    p1 = np.asarray([1, 2, 3], np.int32)
    outs = engine.generate([p1], SamplingParams(max_new_tokens=4))

    ids = list(p1)
    manual = []
    for _ in range(4):
        logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        manual.append(tok)
        ids.append(tok)
    assert outs[0] == manual, (outs[0], manual)

    # staggered: submit one, step once, submit another (slots 0 and 1)
    r1 = engine.submit(p1, SamplingParams(max_new_tokens=3))
    engine.step()
    r2 = engine.submit(np.asarray([4, 5], np.int32), SamplingParams(max_new_tokens=3))
    while not (engine.get_request(r1).done and engine.get_request(r2).done):
        engine.step()
    assert engine.get_request(r1).generated[:4] == manual[:3] + engine.get_request(r1).generated[3:4]
    assert len(engine.get_request(r2).generated) == 3


def test_submit_rejects_oversized_prompt():
    import pytest

    from aqlm_tpu.models import llama as _llama

    cfg = _llama.ModelConfig.tiny(num_layers=1)
    params = _llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    eng = Engine(params, cfg, ServeConfig(max_batch=1, max_len=32, prefill_buckets=(8,)))
    with pytest.raises(ValueError, match="decode room"):
        eng.submit(np.arange(31, dtype=np.int32))
    eng.submit(np.arange(16, dtype=np.int32))  # fits


def test_engine_logprobs_match_direct_forward():
    """req.logprobs must equal the raw model log-softmax of each emitted
    token (greedy), in both plain and speculative engines."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 1, 4], np.int32)
    serve = ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,))

    eng = Engine(params, cfg, serve)
    rid = eng.submit(prompt, SamplingParams(max_new_tokens=5))
    while eng._pending or eng._active:
        eng.step()
    req = eng.get_request(rid)
    assert len(req.logprobs) == len(req.generated) == 5

    ids = list(prompt)
    for tok, lp in zip(req.generated, req.logprobs):
        logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        ref = float(jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))[tok])
        assert abs(ref - lp) < 2e-2, (tok, ref, lp)  # flash-decode vs XLA numerics
        ids.append(tok)

    spec = Engine(params, cfg, serve, draft_params=params, draft_cfg=cfg, spec_k=2)
    rid2 = spec.submit(prompt, SamplingParams(max_new_tokens=5))
    while spec._pending or spec._active:
        spec.step()
    req2 = spec.get_request(rid2)
    assert req2.generated == req.generated
    np.testing.assert_allclose(req2.logprobs, req.logprobs, atol=2e-2)


def test_abort_frees_slot_and_stops_generation():
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    eng = Engine(params, cfg, ServeConfig(max_batch=1, max_len=64, prefill_buckets=(8,)))
    r1 = eng.submit(np.asarray([1, 2, 3], np.int32), SamplingParams(max_new_tokens=50))
    r2 = eng.submit(np.asarray([4, 5], np.int32), SamplingParams(max_new_tokens=4))
    eng.step(); eng.step()
    n_before = len(eng.get_request(r1).generated)
    assert eng.abort(r1)
    assert not eng.abort(r1)  # idempotent
    # r2 (queued behind the aborted request) now runs to completion
    while eng._pending or eng._active:
        eng.step()
    assert len(eng.get_request(r1).generated) == n_before
    assert len(eng.get_request(r2).generated) == 4


def test_decode_chunk_matches_single_step():
    """decode_chunk=4 must emit exactly the single-step engine's tokens,
    including a budget that is not a multiple of the chunk, an EOS inside a
    chunk, and admissions queued behind full slots."""
    import dataclasses

    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=96, prefill_buckets=(8,))
    prompts = [np.asarray([3, 1, 4], np.int32), np.asarray([2, 7], np.int32),
               np.asarray([5, 5, 5, 5], np.int32)]
    sampling = SamplingParams(max_new_tokens=11)  # 11 % 4 != 0

    ref = Engine(params, cfg, serve).generate(prompts, sampling)
    chunked = Engine(params, cfg, dataclasses.replace(serve, decode_chunk=4))
    got = chunked.generate(prompts, sampling)
    assert got == ref, (got, ref)

    # eos inside a chunk
    eos = ref[0][4]
    if eos not in ref[0][:4]:
        s2 = SamplingParams(max_new_tokens=11, eos_token_id=int(eos))
        ref_e = Engine(params, cfg, serve).generate([prompts[0]], s2)
        got_e = Engine(params, cfg, dataclasses.replace(serve, decode_chunk=4)).generate(
            [prompts[0]], s2
        )
        assert got_e == ref_e, (got_e, ref_e)
        assert got_e[0][-1] == eos


def test_sampled_generation_deterministic_given_seed():
    """Engine RNG plumbing: identical engines produce identical SAMPLED
    streams (per-step keys derive from the engine key, not wall state)."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,))
    prompts = [np.asarray([3, 1, 4], np.int32), np.asarray([8, 8], np.int32)]
    sampling = SamplingParams(max_new_tokens=8, temperature=0.9, top_p=0.9)

    a = Engine(params, cfg, serve).generate(prompts, sampling)
    b = Engine(params, cfg, serve).generate(prompts, sampling)
    assert a == b, (a, b)
    # temperature actually does something (not silently greedy)
    g = Engine(params, cfg, serve).generate(prompts, SamplingParams(max_new_tokens=8))
    assert a != g


def test_default_buckets_clamped_to_short_max_len(setup):
    """Regression: ServeConfig's default prefill_buckets (64/256/1024) with a
    max_len shorter than the widest bucket used to trace a prefill whose
    dynamic-update-slice window exceeded the KV cache bound (found by
    bench --engine at AQLM_ENGINE_ML=512). The engine must clamp buckets to
    max_len and still serve a prompt that lands in the clamped bucket."""
    cfg, params = setup
    engine = Engine(params, cfg, ServeConfig(max_batch=1, max_len=48))
    assert max(engine.serve.prefill_buckets) == 48, engine.serve.prefill_buckets
    prompt = np.arange(40, dtype=np.int32) % cfg.vocab_size
    out = engine.generate([prompt], SamplingParams(max_new_tokens=4))[0]
    assert len(out) == 4
