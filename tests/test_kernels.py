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


@pytest.mark.parametrize("K,S,G,g", [(2, 256, 4096, 8), (1, 16, 130, 4),
                                     (3, 256, 5000, 8), (2, 128, 4096 * 2 + 64, 8)])
def test_cb_grad_segment_matches_segment_sum(K, S, G, g):
    """Batched one-hot-MXU codebook-grad kernel == per-codebook segment_sum
    (the scatter formulation it replaces on real TPUs)."""
    from aqlm_tpu.ops.kernels import _cb_grad_call

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, S, (G, K)), jnp.int32)
    data = jnp.asarray(rng.standard_normal((G, g)), jnp.float32)
    got = _cb_grad_call(codes.T, data, num_segments=S, interpret=True)
    want = jnp.stack([
        jax.ops.segment_sum(data, codes[:, k], num_segments=S) for k in range(K)
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_manual_st_proj_cb_grads_match_xla(key):
    """The manual-VJP projection's codebook/scale grads (kernel dequant +
    cb_grad path) must match autodiff through the XLA dequant."""
    from aqlm_tpu.pv.straight_through import _make_manual_st_proj

    scheme = AqlmScheme.parse("2x8g8")
    w = _mk(key, scheme.name if hasattr(scheme, "name") else "2x8g8")
    x = jax.random.normal(jax.random.PRNGKey(3), (4, IN), jnp.float32)
    st = jnp.zeros((1, OUT, IN), jnp.float32)
    li = jnp.asarray(0, jnp.int32)
    start = jnp.asarray(0, jnp.int32)

    def run(impl):
        f = _make_manual_st_proj(scheme, jnp.float32, True, 1, False,
                                 dequant_impl=impl)

        def loss(cbs, scales, stb):
            y = f(x, w.codes, cbs, scales, None, stb, li, start)
            return jnp.sum(y * y)

        return jax.grad(loss, argnums=(0, 1, 2))(w.codebooks, w.scales, st)

    g_xla = run("xla")
    g_ker = run("kernel")
    # kernel forward dequantizes through bf16 one-hot selection (the serving
    # default), so grads carry ~0.2% bf16 noise — compare by norm
    for a, b in zip(g_xla, g_ker):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 0.01, rel


def test_cb_grad_segment_fast_precision():
    """precise=False (single-pass bf16 selection dot, the PV path) stays
    within ~0.5% of the exact scatter result."""
    from aqlm_tpu.ops.kernels import _cb_grad_call

    rng = np.random.default_rng(1)
    K, S, G, g = 2, 256, 8192, 8
    codes = jnp.asarray(rng.integers(0, S, (G, K)), jnp.int32)
    data = jnp.asarray(rng.standard_normal((G, g)), jnp.float32)
    got = _cb_grad_call(codes.T, data, num_segments=S, interpret=True,
                        precise=False)
    want = jnp.stack([
        jax.ops.segment_sum(data, codes[:, k], num_segments=S) for k in range(K)
    ])
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 5e-3, rel
