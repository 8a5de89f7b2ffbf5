"""Tiny-model tests: forward shapes, cache consistency, quantized swap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models.llama import ModelConfig, forward, init_kv_cache, init_random_params
from aqlm_tpu.models.quantize import random_quantized_params

CFG = ModelConfig.tiny()


def test_forward_shapes(key):
    params = init_random_params(key, CFG)
    ids = jax.random.randint(key, (2, 10), 0, CFG.vocab_size)
    logits, _ = forward(params, CFG, ids)
    assert logits.shape == (2, 10, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_cache_matches_full_forward(key):
    """Prefill+decode through the KV cache must match the uncached forward."""
    params = init_random_params(key, CFG, dtype=jnp.float32)
    b, t = 2, 9
    ids = jax.random.randint(key, (b, t), 0, CFG.vocab_size)
    full_logits, _ = forward(params, CFG, ids)

    caches = init_kv_cache(CFG, b, max_len=16, dtype=jnp.float32)
    # prefill first 5 tokens
    logits_p, caches = forward(
        params, CFG, ids[:, :5], kv_caches=caches, cache_offset=jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(logits_p, np.float32), np.asarray(full_logits[:, :5], np.float32),
        rtol=2e-3, atol=2e-3,
    )
    # decode the rest one token at a time
    for i in range(5, t):
        step_logits, caches = forward(
            params, CFG, ids[:, i : i + 1], kv_caches=caches, cache_offset=jnp.int32(i)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0], np.float32),
            np.asarray(full_logits[:, i], np.float32),
            rtol=5e-3, atol=5e-3,
        )


def test_gqa_and_tied_embeddings(key):
    cfg = ModelConfig.tiny(num_kv_heads=1, tie_embeddings=True)
    params = init_random_params(key, cfg)
    ids = jax.random.randint(key, (1, 6), 0, cfg.vocab_size)
    logits, _ = forward(params, cfg, ids)
    assert logits.shape == (1, 6, cfg.vocab_size)


@pytest.mark.parametrize("mode", ["reference", "codes", "int8"])
def test_quantized_model_forward(key, mode):
    scheme = AqlmScheme.parse("2x8g8")
    params = random_quantized_params(key, CFG, scheme, mode=mode)
    ids = jax.random.randint(key, (1, 4), 0, CFG.vocab_size)
    logits, _ = forward(params, CFG, ids)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_quantized_modes_agree(key):
    """codes/int8/reference modes of the same weights give close logits."""
    scheme = AqlmScheme.parse("2x8g8")
    ids = jax.random.randint(key, (1, 4), 0, CFG.vocab_size)
    outs = {}
    for mode in ("reference", "codes", "int8"):
        params = random_quantized_params(key, CFG, scheme, mode=mode)
        logits, _ = forward(params, CFG, ids)
        outs[mode] = np.asarray(logits, np.float32)
    np.testing.assert_allclose(outs["codes"], outs["reference"], rtol=0.1, atol=0.15)
    np.testing.assert_allclose(outs["int8"], outs["reference"], rtol=0.1, atol=0.15)


def test_jit_forward(key):
    params = init_random_params(key, CFG)

    @jax.jit
    def f(params, ids):
        return forward(params, CFG, ids)[0]

    ids = jax.random.randint(key, (1, 4), 0, CFG.vocab_size)
    logits = f(params, ids)
    assert logits.shape == (1, 4, CFG.vocab_size)
