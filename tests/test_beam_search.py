"""Beam-search tests.

The central invariant: the incrementally-maintained beam losses must equal
the loss recomputed from scratch for the returned codes — this pins the
square-of-difference bookkeeping (reference beam_search_xtx.py:179-190)
against our rank-g incremental-update redesign."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.calib.beam_search_xtx import beam_search_optimal_codes, channelwise_squared_error
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight


def _setup(key, scheme, out_f, in_f, nsamples=128):
    kw, kx, kc = jax.random.split(key, 3)
    w = random_aqlm_weight(kw, scheme, out_f, in_f)
    X = jax.random.normal(kx, (nsamples, in_f), jnp.float32)
    XTX = X.T @ X / nsamples
    ref_w = jax.random.normal(kc, (out_f, in_f), jnp.float32)
    return w, XTX, ref_w


def _true_loss(codes, w, XTX, ref_w):
    wq = AqlmWeight(codes=codes, codebooks=w.codebooks, scales=w.scales, bias=None, scheme=w.scheme)
    return channelwise_squared_error(XTX, dequantize_weight(wq), ref_w)


@pytest.mark.parametrize("scheme_name,beam", [("1x4g4", 1), ("1x4g4", 4), ("2x3g4", 2)])
def test_losses_match_recomputation(key, scheme_name, beam):
    scheme = AqlmScheme.parse(scheme_name)
    w, XTX, ref_w = _setup(key, scheme, out_f=24, in_f=32)
    codes, losses = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=beam, out_chunk=16
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(_true_loss(codes, w, XTX, ref_w)), rtol=2e-4, atol=1e-4
    )


def test_beam_search_improves_loss(key):
    scheme = AqlmScheme.parse("2x4g4")
    w, XTX, ref_w = _setup(key, scheme, out_f=32, in_f=32)
    before = _true_loss(w.codes.astype(jnp.int32), w, XTX, ref_w)
    codes, losses = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=2, out_chunk=16
    )
    after = _true_loss(codes, w, XTX, ref_w)
    assert float(after.sum()) <= float(before.sum()) + 1e-6
    # per-row: beam search never worsens any independent row
    assert np.all(np.asarray(after) <= np.asarray(before) + 1e-5)


def test_single_group_matches_bruteforce(key):
    """One in_group, one codebook: the search must find the global optimum."""
    scheme = AqlmScheme(num_codebooks=1, nbits_per_codebook=4, in_group_size=8)
    w, XTX, ref_w = _setup(key, scheme, out_f=16, in_f=8)
    codes, losses = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=1, out_chunk=16
    )
    # brute force: loss for every possible code per row
    all_losses = []
    for s in range(scheme.codebook_size):
        cand = jnp.full_like(w.codes.astype(jnp.int32), s)
        all_losses.append(np.asarray(_true_loss(cand, w, XTX, ref_w)))
    best = np.stack(all_losses).min(axis=0)
    np.testing.assert_allclose(np.asarray(losses), best, rtol=1e-4, atol=1e-5)


def test_larger_beam_no_worse(key):
    scheme = AqlmScheme.parse("2x4g4")
    w, XTX, ref_w = _setup(key, scheme, out_f=16, in_f=32)
    results = {}
    for beam in (1, 4):
        _, losses = beam_search_optimal_codes(
            XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=beam, out_chunk=16
        )
        results[beam] = float(jnp.sum(losses))
    assert results[4] <= results[1] + 1e-5


def test_weight_mse_mode(key):
    """XTX = I reduces the objective to plain weight MSE."""
    scheme = AqlmScheme.parse("1x4g4")
    w, _, ref_w = _setup(key, scheme, out_f=16, in_f=16)
    eye = jnp.eye(16, dtype=jnp.float32)
    codes, losses = beam_search_optimal_codes(
        eye, ref_w, w.codebooks, w.codes, w.scales, beam_size=2, out_chunk=16
    )
    wq = AqlmWeight(codes=codes, codebooks=w.codebooks, scales=w.scales, bias=None, scheme=scheme)
    direct = jnp.sum((dequantize_weight(wq) - ref_w) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(direct), rtol=1e-4, atol=1e-5)


def test_out_group_size_two(key):
    """og=2: losses are per out-GROUP; invariant vs recomputation holds and
    the search improves the grouped activation MSE."""
    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=4, in_group_size=4, out_group_size=2)
    w, XTX, ref_w = _setup(key, scheme, out_f=16, in_f=32)
    before = _true_loss(w.codes.astype(jnp.int32), w, XTX, ref_w).reshape(8, 2).sum(-1)
    codes, losses = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=2, out_chunk=8
    )
    assert losses.shape == (8,)
    after = _true_loss(codes, w, XTX, ref_w).reshape(8, 2).sum(-1)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(after), rtol=2e-4, atol=1e-4)
    assert np.all(np.asarray(after) <= np.asarray(before) + 1e-5)
