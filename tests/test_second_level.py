"""Second-level quantization tests: per-group scales (scale_nbits) and
codebook-value quantization (codebook_value_nbits)."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.calib import CalibConfig, compute_mse, init_quantized_weight, quantize_weight
from aqlm_tpu.calib.engine import effective_codebooks, effective_scales, quantize_values_1d_st
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight


def test_per_group_scales_dequant(key):
    scheme = AqlmScheme(1, 4, in_group_size=4)
    w = random_aqlm_weight(key, scheme, 8, 16)
    # 2-D scales: scale in-group 2 of every row by 3x
    scales2d = jnp.ones((8, 4)).at[:, 2].set(3.0)
    w2 = AqlmWeight(codes=w.codes, codebooks=w.codebooks, scales=scales2d, bias=None, scheme=scheme)
    dense = dequantize_weight(w2)
    w1 = AqlmWeight(codes=w.codes, codebooks=w.codebooks, scales=jnp.ones((8,)), bias=None, scheme=scheme)
    base = dequantize_weight(w1)
    np.testing.assert_allclose(np.asarray(dense[:, 8:12]), np.asarray(base[:, 8:12]) * 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dense[:, :8]), np.asarray(base[:, :8]), rtol=1e-6)


def test_quantize_values_st_grads(key):
    vals = jax.random.normal(key, (4, 32))
    out = quantize_values_1d_st(vals, 3)
    # forward: at most 8 distinct values per row
    for row in np.asarray(out):
        assert len(np.unique(row)) <= 8
    # straight-through: gradient of sum is all-ones
    g = jax.grad(lambda v: jnp.sum(quantize_values_1d_st(v, 3)))(vals)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_effective_codebooks_snaps_values(key):
    cfg = CalibConfig(codebook_value_nbits=4)
    cbs = jax.random.normal(key, (2, 16, 1, 4))
    eff = effective_codebooks(cbs, cfg)
    assert eff.shape == cbs.shape
    # each (codebook, out, in) slice has at most 16 distinct values
    for k in range(2):
        for i in range(4):
            assert len(np.unique(np.asarray(eff[k, :, 0, i]))) <= 16
    # identity when nbits >= 16
    np.testing.assert_array_equal(
        np.asarray(effective_codebooks(cbs, CalibConfig())), np.asarray(cbs)
    )


def test_effective_scales_lossless_and_lossy(key):
    scales = jax.random.uniform(key, (8, 32), minval=0.5, maxval=2.0)
    lossless = effective_scales(scales, CalibConfig(scale_nbits=6))  # 2^6 >= 32
    np.testing.assert_array_equal(np.asarray(lossless), np.asarray(scales))
    lossy = effective_scales(scales, CalibConfig(scale_nbits=2))
    for row in np.asarray(lossy):
        assert len(np.unique(row)) <= 4


def test_quantize_weight_with_second_level(key):
    scheme = AqlmScheme(1, 5, in_group_size=4)
    kw, kx = jax.random.split(key)
    ref_w = jax.random.normal(kw, (16, 16), jnp.float32)
    X = jax.random.normal(kx, (64, 16), jnp.float32)
    XTX = X.T @ X / 64
    cfg = CalibConfig(
        lr=1e-3, beam_size=1, max_epochs=2, steps_per_epoch=10,
        relative_mse_tolerance=None, init_max_iter=20,
        scale_nbits=3, codebook_value_nbits=8,
    )
    final, stats = quantize_weight(ref_w, XTX, scheme, cfg)
    assert final.scales.shape == (16, 4)  # per-group scales
    assert np.isfinite(stats["final_mse"])
    # codebook values are snapped to at most 2^8 distinct values per column
    for i in range(4):
        assert len(np.unique(np.asarray(final.codebooks[0, :, 0, i]))) <= 256
    # bits accounting includes the scale overhead
    bits = scheme.estimate_nbits_per_parameter(16, 16, scale_nbits=3, codebook_value_nbits=8)
    assert bits > scheme.estimate_nbits_per_parameter(16, 16)


def test_beam_searches_accept_2d_scales(key):
    from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2
    from aqlm_tpu.calib.beam_search_xtx import beam_search_optimal_codes

    scheme = AqlmScheme(1, 4, in_group_size=4)
    w = random_aqlm_weight(key, scheme, 8, 16)
    scales2d = jax.random.uniform(jax.random.PRNGKey(5), (8, 4), minval=0.5, maxval=1.5)
    ref_w = jax.random.normal(jax.random.PRNGKey(6), (8, 16), jnp.float32)
    X = jax.random.normal(jax.random.PRNGKey(7), (32, 16), jnp.float32)
    XTX = X.T @ X / 32

    w2 = AqlmWeight(codes=w.codes, codebooks=w.codebooks, scales=scales2d, bias=None, scheme=scheme)
    before = compute_mse(w2, ref_w, XTX)
    codes, losses = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, scales2d, beam_size=2, out_chunk=8
    )
    w3 = AqlmWeight(codes=codes, codebooks=w.codebooks, scales=scales2d, bias=None, scheme=scheme)
    after = compute_mse(w3, ref_w, XTX)
    assert float(after) <= float(before) + 1e-6
    # invariant: incremental losses match recomputation with 2-D scales
    resid = dequantize_weight(w3) - ref_w
    true = jnp.sum((resid @ XTX) * resid, axis=-1)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(true), rtol=2e-4, atol=1e-4)

    codes_l2 = beam_search_optimal_codes_l2(ref_w, w.codebooks, w.codes, scales2d, group_chunk=8)
    w4 = AqlmWeight(codes=codes_l2, codebooks=w.codebooks, scales=scales2d, bias=None, scheme=scheme)
    l2_before = jnp.sum((dequantize_weight(w2) - ref_w) ** 2)
    l2_after = jnp.sum((dequantize_weight(w4) - ref_w) ** 2)
    assert float(l2_after) <= float(l2_before) + 1e-6
