"""Kernel-vs-reference equivalence tests (the reference repo's own test
pattern: fast kernel vs dequantize+matmul fallback, matmul_benchmark.py:99-109).
Runs on CPU with Pallas interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import aqlm_matmul_reference, dequantize_weight, random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul

OUT, IN = 128, 256


def _mk(key, scheme_name, **kw):
    scheme = AqlmScheme.parse(scheme_name)
    return random_aqlm_weight(key, scheme, OUT, IN, **kw)


@pytest.mark.parametrize("scheme_name", ["2x8g8", "1x8g8", "8x8g8", "2x8g16"])
@pytest.mark.parametrize("batch", [1, 4])
def test_codes_mode_onehot_matches_reference(key, scheme_name, batch):
    w = _mk(key, scheme_name, with_bias=True)
    q = QuantizedLinear.from_aqlm(w, mode="codes")
    x = jax.random.normal(jax.random.PRNGKey(7), (batch, IN), dtype=jnp.float32).astype(
        jnp.bfloat16
    )
    got = quantized_matmul(x, q)
    ref = aqlm_matmul_reference(x, w.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("scheme_name", ["1x16g8", "1x16g16"])
def test_codes_mode_gather16_matches_reference(key, scheme_name):
    w = _mk(key, scheme_name, with_bias=True)
    q = QuantizedLinear.from_aqlm(w, mode="codes")
    x = jax.random.normal(jax.random.PRNGKey(7), (3, IN), dtype=jnp.bfloat16)
    got = quantized_matmul(x, q)
    ref = aqlm_matmul_reference(x, w.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )


def test_int8_mode_close_to_reference(key):
    w = _mk(key, "1x16g8")
    q = QuantizedLinear.from_aqlm(w, mode="int8")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, IN), dtype=jnp.bfloat16)
    got = np.asarray(quantized_matmul(x, q), np.float32)
    ref = np.asarray(aqlm_matmul_reference(x, w.astype(jnp.bfloat16)), np.float32)
    # int8 requantization error is small but nonzero
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.05


def test_reference_mode_is_exact(key):
    w = _mk(key, "2x8g8", with_bias=True)
    q = QuantizedLinear.from_aqlm(w, mode="reference")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, IN), dtype=jnp.float32)
    got = quantized_matmul(x, q)
    ref = aqlm_matmul_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_dense_weight_t_consistency(key):
    w = _mk(key, "2x8g8")
    dense_t = dequantize_weight(w, dtype=jnp.float32).T
    for mode in ("codes", "reference"):
        q = QuantizedLinear.from_aqlm(w, mode=mode)
        got = np.asarray(q.dense_weight_t(dtype=jnp.float32), np.float32)
        np.testing.assert_allclose(got, np.asarray(dense_t), rtol=0.02, atol=0.02)
    q16 = QuantizedLinear.from_aqlm(_mk(key, "1x16g8"), mode="codes")
    d16 = dequantize_weight(_mk(key, "1x16g8"), dtype=jnp.float32).T
    np.testing.assert_allclose(
        np.asarray(q16.dense_weight_t(jnp.float32), np.float32), np.asarray(d16),
        rtol=0.02, atol=0.02,
    )


def test_codes_mode_jit_and_grad_to_x(key):
    w = _mk(key, "2x8g8")
    q = QuantizedLinear.from_aqlm(w, mode="codes")

    @jax.jit
    def f(x, q):
        return quantized_matmul(x, q).sum()

    x = jax.random.normal(jax.random.PRNGKey(3), (2, IN), dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(f(x, q), np.float32))


def test_reference_mode_grads_flow_to_codebooks(key):
    w = _mk(key, "2x8g8")
    q = QuantizedLinear.from_aqlm(w, mode="reference")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, IN), dtype=jnp.float32)

    def loss(cb):
        q2 = jax.tree_util.tree_map(lambda t: t, q)
        q2.codebooks = cb
        return (quantized_matmul(x, q2) ** 2).sum()

    g = jax.grad(loss)(q.codebooks)
    assert np.asarray(jnp.abs(g).max()) > 0
