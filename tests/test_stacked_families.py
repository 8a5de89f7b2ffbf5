"""Stacked serving path for the non-llama families (cohere / falcon / opt):
scan-over-layers forward == the family's unrolled forward, KV-cached decode
== full-context forward, and the continuous-batching Engine produces the
same greedy tokens as a manual decode loop.

The reference serves these families through HF generate (its dispatch tables
at /root/reference/src/modelutils.py:140-176); here they share ONE scan
program with llama (models/stacked.py::model_family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.models import cohere, falcon, opt
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, model_family, stack_layer_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig

FAMILIES = {
    "cohere": (cohere, cohere.CohereConfig.tiny(num_layers=2)),
    "cohere_qk": (cohere, cohere.CohereConfig.tiny(num_layers=2, use_qk_norm=True)),
    "falcon": (falcon, falcon.FalconConfig.tiny(num_layers=2)),
    "opt": (opt, opt.OptConfig.tiny(num_layers=2)),
}


def _setup(name):
    mod, cfg = FAMILIES[name]
    params = mod.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return mod, cfg, params


def test_family_dispatch():
    assert model_family(FAMILIES["cohere"][1]) == "cohere"
    assert model_family(FAMILIES["falcon"][1]) == "falcon"
    assert model_family(FAMILIES["opt"][1]) == "opt"
    from aqlm_tpu.models import llama

    assert model_family(llama.ModelConfig.tiny()) == "llama"


@pytest.mark.parametrize("name", list(FAMILIES))
def test_stacked_matches_unrolled(name):
    mod, cfg, params = _setup(name)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    ref, _ = mod.forward(params, cfg, ids)
    got, _ = forward_stacked(stack_layer_params(params), cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("name", ["cohere_qk", "falcon", "opt"])
@pytest.mark.parametrize("quantized_kv", [False, True])
def test_cached_decode_matches_full_forward(name, quantized_kv):
    mod, cfg, params = _setup(name)
    stacked = stack_layer_params(params)
    t = 10
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, cfg.vocab_size)

    full_logits, _ = forward_stacked(stacked, cfg, ids)

    cache = init_kv_cache(cfg, 1, 32, quantized=quantized_kv)
    logits, cache = forward_stacked(
        stacked, cfg, ids[:, :6], cache=cache, cache_offset=jnp.zeros((1,), jnp.int32)
    )
    step_logits = [logits[:, i] for i in range(6)]
    for pos in range(6, t):
        logits, cache = forward_stacked(
            stacked, cfg, ids[:, pos : pos + 1], cache=cache,
            cache_offset=jnp.full((1,), pos, jnp.int32),
        )
        step_logits.append(logits[:, 0])
    got = jnp.stack(step_logits, axis=1)
    atol = 0.3 if quantized_kv else 0.03
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(full_logits, np.float32), atol=atol, rtol=0.05
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", ["cohere", "falcon", "opt"])
def test_engine_matches_manual_greedy(name):
    mod, cfg, params = _setup(name)
    engine = Engine(params, cfg, ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16)))
    prompt = np.asarray([3, 17, 5, 9], np.int32)
    out = engine.generate([prompt], SamplingParams(max_new_tokens=6))[0]
    assert len(out) == 6

    ids = list(prompt)
    manual = []
    for _ in range(6):
        logits, _ = mod.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        manual.append(tok)
        ids.append(tok)
    assert out == manual, (out, manual)
