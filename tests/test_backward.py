"""Backward-pass tests for the serving-mode kernels: grad w.r.t. activations
through int8/codes layouts must match the dense-dequantized matmul's grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8, AqlmScheme
from aqlm_tpu.ops.dequant import dequantize_weight, random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul


@pytest.mark.parametrize("mode", ["int8", "codes"])
def test_activation_grads_match_dense(key, mode):
    scheme = SCHEME_2X8
    w = random_aqlm_weight(key, scheme, 64, 128)
    q = QuantizedLinear.from_aqlm(w, mode=mode)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)

    def loss(x):
        y = quantized_matmul(x.astype(jnp.bfloat16), q)
        return jnp.sum(y.astype(jnp.float32) * v)

    gx = jax.grad(loss)(x)

    # dense-path grad through whatever weight the mode actually realizes
    wt = np.asarray(q.dense_weight_t(jnp.float32), np.float32)[:128]  # [IN, OUT]
    expected = np.asarray(v) @ wt.T
    np.testing.assert_allclose(np.asarray(gx), expected, atol=0.25, rtol=0.05)


def test_int8_grad_under_jit_and_vmap(key):
    w = random_aqlm_weight(key, AqlmScheme(1, 5, 4), 32, 64)
    q = QuantizedLinear.from_aqlm(w, mode="int8")

    @jax.jit
    def g(x):
        return jax.grad(lambda x: jnp.sum(quantized_matmul(x, q) ** 2))(x)

    out = g(jnp.ones((2, 64), jnp.float32))
    assert out.shape == (2, 64)
    assert bool(jnp.isfinite(out).all())


def test_peft_style_training_through_int8(key):
    """Train a dense adapter stacked on a frozen int8 projection."""
    import optax

    w = random_aqlm_weight(key, AqlmScheme(1, 5, 4), 32, 32)
    q = QuantizedLinear.from_aqlm(w, mode="int8")
    adapter = jnp.zeros((32, 32), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    target = jax.random.normal(jax.random.PRNGKey(2), (8, 32))

    opt = optax.adam(1e-1)
    state = opt.init(adapter)

    @jax.jit
    def step(adapter, state):
        def loss_fn(a):
            h = x + x @ a.T
            y = quantized_matmul(h.astype(jnp.bfloat16), q).astype(jnp.float32)
            return jnp.mean((y - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(adapter)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(adapter, updates), state, loss

    losses = []
    for _ in range(20):
        adapter, state, loss = step(adapter, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
