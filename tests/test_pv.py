"""PV-tuning tests: loss correctness (chunked == direct, the reference's own
inline test contract, src/memory_efficient_loss.py:77-114) and the P-phase
distillation trainer (codes frozen, codebooks/scales move, loss decreases)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv import (
    chunked_kl_loss,
    init_train_state,
    kl_divergence_loss,
    make_distill_step,
    merge_trainable,
    split_trainable,
)


def test_chunked_kl_matches_direct(key):
    b, t, h, v = 2, 64, 16, 50
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sh = jax.random.normal(k1, (b, t, h))
    th = jax.random.normal(k2, (b, t, h))
    s_head = jax.random.normal(k3, (v, h)) * 0.1
    t_head = jax.random.normal(k4, (v, h)) * 0.1
    mask = (jnp.arange(t)[None, :] < jnp.array([[40], [64]])).astype(jnp.float32)

    direct = kl_divergence_loss(sh @ s_head.T, th @ t_head.T, mask)
    for chunk in (16, 64, 100):
        chunked = chunked_kl_loss(
            sh, th, s_head, t_head, mask=mask, chunk_tokens=chunk
        )
        np.testing.assert_allclose(float(chunked), float(direct), rtol=1e-5)


def test_chunked_kl_grads_match(key):
    b, t, h, v = 1, 32, 8, 20
    k1, k2, k3 = jax.random.split(key, 3)
    sh = jax.random.normal(k1, (b, t, h))
    th = jax.random.normal(k2, (b, t, h))
    head = jax.random.normal(k3, (v, h)) * 0.1

    g_direct = jax.grad(lambda w: kl_divergence_loss(sh @ w.T, th @ head.T))(head)
    g_chunked = jax.grad(
        lambda w: chunked_kl_loss(sh, th, w, head, chunk_tokens=8)
    )(head)
    np.testing.assert_allclose(np.asarray(g_chunked), np.asarray(g_direct), atol=1e-5)


def test_split_merge_roundtrip(key):
    cfg = llama.ModelConfig.tiny()
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    trainable, frozen = split_trainable(params)
    # codes (uint8) must be frozen
    codes = frozen["layers"][0]["q_proj"].codes
    assert codes is not None and codes.dtype == jnp.uint8
    assert trainable["layers"][0]["q_proj"].codes is None
    assert trainable["layers"][0]["q_proj"].codebooks is not None

    merged = merge_trainable(trainable, frozen)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distill_step_reduces_loss(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    teacher = llama.init_random_params(jax.random.PRNGKey(7), cfg)

    optimizer = optax.adam(3e-3)
    state = init_train_state(student, optimizer)
    step = jax.jit(make_distill_step(cfg, cfg, optimizer))

    input_ids = jax.random.randint(jax.random.PRNGKey(3), (2, 32), 0, cfg.vocab_size)
    codes_before = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    losses = []
    for _ in range(8):
        state, loss = step(state, teacher, input_ids)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # codes untouched, codebooks moved
    np.testing.assert_array_equal(
        np.asarray(state.frozen["layers"][0]["q_proj"].codes), codes_before
    )
