"""Straight-through PV optimizer tests on a tiny quantized model."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv.straight_through import (
    PVConfig,
    init_pv_state,
    make_pv_step,
    materialize_st_params,
)
from aqlm_tpu.pv.trainer import merge_trainable
import optax


def _setup(key, **pv_kwargs):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg)
    pv = PVConfig(lr=1e-3, code_lr=3e-3, **pv_kwargs)
    grad_step, code_step = make_pv_step(cfg, cfg, pv)
    cont_opt = optax.adamw(pv.lr, b1=0.9, b2=0.95)
    st_opt = optax.adam(pv.code_lr, b1=0.9, b2=0.95)
    state = init_pv_state(student, cont_opt, st_opt)
    return cfg, student, teacher, state, jax.jit(grad_step), code_step


def test_st_materialization_value_equals_dequant(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    import optax as _o

    state = init_pv_state(params, _o.adam(1e-3), _o.adam(1e-3))
    eff = materialize_st_params(params, state.st_buffers)
    ids = jnp.ones((1, 8), jnp.int32)
    ref_logits, _ = llama.forward(params, cfg, ids)
    eff_logits, _ = llama.forward(eff, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(eff_logits, np.float32), np.asarray(ref_logits, np.float32), atol=1e-2
    )


def test_pv_grad_step_moves_st_buffers(key):
    cfg, student, teacher, state, grad_step, _ = _setup(key)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    before = np.asarray(state.st_buffers[0]["q_proj"])
    state, loss = grad_step(state, teacher, ids)
    after = np.asarray(state.st_buffers[0]["q_proj"])
    assert np.isfinite(float(loss))
    assert not np.allclose(before, after)  # straight-through grads reached the buffer


def test_pv_full_alternation_reduces_loss(key):
    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.25, delta_decay=0.3
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(6):
        for _ in range(3):
            state, loss = grad_step(state, teacher, ids)
            losses.append(float(loss))
        rng, sub = jax.random.split(rng)
        state = code_step(state, sub)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # code dtype preserved through the V steps
    assert np.asarray(state.frozen["layers"][0]["q_proj"].codes).dtype == np.uint8


def test_v_step_tracks_buffer(key):
    """When the ST buffer moves far from dequant(codes), the V step must
    re-assign codes (up to max_code_change_per_step) toward the buffer."""
    import dataclasses

    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.25
    )
    st = state.st_buffers
    st[0]["q_proj"] = st[0]["q_proj"] + 5.0 * jax.random.normal(
        jax.random.PRNGKey(1), st[0]["q_proj"].shape
    )
    state = dataclasses.replace(state, st_buffers=st)
    before = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    state = code_step(state, jax.random.PRNGKey(2))
    after = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    frac = np.any(before != after, axis=-1).mean()
    assert 0.2 <= frac <= 0.25 + 1e-6, frac  # capped by max_code_change


def test_max_code_change_respected_in_v_step(key):
    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.1
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    state, _ = grad_step(state, teacher, ids)
    before = {
        name: np.asarray(q.codes)
        for name, q in state.frozen["layers"][0].items()
        if hasattr(q, "codes") and q.codes is not None
    }
    state = code_step(state, jax.random.PRNGKey(0))
    for name, prev in before.items():
        new = np.asarray(state.frozen["layers"][0][name].codes)
        frac = np.any(prev != new, axis=-1).mean()
        assert frac <= 0.1 + 1e-6, (name, frac)
