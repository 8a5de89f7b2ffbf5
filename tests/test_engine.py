"""Calibration-engine tests: XTX accumulator precision, k-means init quality,
and the full Adam/beam-search alternation on a tiny layer."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.calib import (
    CalibConfig,
    XTXAccumulator,
    compute_mse,
    init_quantized_weight,
    quantize_weight,
)
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import dequantize_weight


def test_xtx_accumulator_matches_float64(key):
    d = 16
    acc = XTXAccumulator.zeros(d)
    ref = np.zeros((d, d), np.float64)
    n = 0
    for i in range(50):
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(i), (33, d)), np.float32)
        # mix in wildly different magnitudes to stress the compensation
        x = x * (10.0 ** ((i % 7) - 3))
        acc = acc.add(jnp.asarray(x))
        ref += x.astype(np.float64).T @ x.astype(np.float64)
        n += x.shape[0]
    got = np.asarray(acc.mean, np.float64)
    np.testing.assert_allclose(got, ref / n, rtol=1e-5)
    assert int(acc.nsamples) == n


def test_init_quantized_weight_reconstructs(key):
    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=6, in_group_size=4)
    ref_w = jax.random.normal(key, (16, 32), jnp.float32)
    w = init_quantized_weight(ref_w, scheme, max_iter=50)
    assert w.codes.shape == scheme.codes_shape(16, 32)
    rel = float(jnp.linalg.norm(dequantize_weight(w) - ref_w) / jnp.linalg.norm(ref_w))
    assert rel < 0.5, rel  # 2x64 entries on 4-dim groups: coarse but sane
    # more codebooks must reconstruct better
    w1 = init_quantized_weight(ref_w, AqlmScheme(1, 6, 4), max_iter=50)
    rel1 = float(jnp.linalg.norm(dequantize_weight(w1) - ref_w) / jnp.linalg.norm(ref_w))
    assert rel < rel1


def test_quantize_weight_end_to_end(key):
    scheme = AqlmScheme(num_codebooks=1, nbits_per_codebook=5, in_group_size=4)
    kw, kx = jax.random.split(key)
    ref_w = jax.random.normal(kw, (16, 16), jnp.float32)
    X = jax.random.normal(kx, (64, 16), jnp.float32)
    XTX = X.T @ X / 64

    cfg = CalibConfig(
        lr=1e-3, beam_size=2, max_epochs=4, steps_per_epoch=25,
        relative_mse_tolerance=None, init_max_iter=30,
    )
    init_w = init_quantized_weight(ref_w, scheme, key=jax.random.PRNGKey(0), max_iter=30)
    init_mse = float(compute_mse(init_w, ref_w, XTX))

    final, stats = quantize_weight(ref_w, XTX, scheme, cfg)
    assert stats["final_mse"] < init_mse * 0.9, (stats, init_mse)
    # loss history decreases across epochs
    hist = stats["loss_history"]
    assert hist[-1] < hist[0]


def test_quantize_weight_early_stop(key):
    scheme = AqlmScheme(num_codebooks=1, nbits_per_codebook=5, in_group_size=4)
    kw, kx = jax.random.split(key)
    ref_w = jax.random.normal(kw, (8, 8), jnp.float32)
    X = jax.random.normal(kx, (32, 8), jnp.float32)
    XTX = X.T @ X / 32
    cfg = CalibConfig(
        lr=1e-3, beam_size=1, max_epochs=100, steps_per_epoch=10,
        relative_mse_tolerance=0.01, init_max_iter=20,
    )
    final, stats = quantize_weight(ref_w, XTX, scheme, cfg)
    assert len(stats["loss_history"]) < 100  # early stopping kicked in
