"""L2 (weight-space) beam search tests: brute-force optimality, monotone
improvement, and the PV constraint toolkit (force_update, max_update_fraction,
trust_ratio, stochastic rounding)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2, find_optimal_codebooks
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight


def _weight_mse(codes, w, ref_w):
    wq = AqlmWeight(codes=codes.astype(w.codes.dtype), codebooks=w.codebooks, scales=w.scales, bias=None, scheme=w.scheme)
    return float(jnp.sum((dequantize_weight(wq) - ref_w) ** 2))


def test_single_codebook_exact(key):
    """K=1: result must equal the per-group argmin over all codebook entries."""
    scheme = AqlmScheme(1, 4, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 16, 16)
    ref_w = jax.random.normal(kr, (16, 16), jnp.float32)
    codes = beam_search_optimal_codes_l2(ref_w, w.codebooks, w.codes, w.scales, group_chunk=16)

    # brute force per group
    groups = (ref_w.reshape(16, 1, 4, 4).transpose(0, 2, 1, 3) / w.scales[:, None, None, None]).reshape(64, 4)
    cb = np.asarray(w.codebooks[0, :, 0, :])
    d2 = np.linalg.norm(np.asarray(groups)[:, None, :] - cb[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(codes).reshape(64), d2.argmin(1))


def test_two_codebooks_beats_greedy_sometimes_and_never_worse(key):
    scheme = AqlmScheme(2, 3, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 8, 16)
    ref_w = jax.random.normal(kr, (8, 16), jnp.float32)
    before = _weight_mse(w.codes.astype(jnp.int32), w, ref_w)
    for beam in (1, 4, 8):
        codes = beam_search_optimal_codes_l2(
            ref_w, w.codebooks, w.codes, w.scales, beam_size=beam, group_chunk=8
        )
        after = _weight_mse(codes, w, ref_w)
        assert after <= before + 1e-6
    # beam = S*S brute-force check on a single group
    g_ref = ref_w[:1, :4]
    w_small = random_aqlm_weight(jax.random.PRNGKey(3), scheme, 1, 4)
    best = min(
        float(jnp.sum((w_small.scales[0] * (w_small.codebooks[0, a, 0] + w_small.codebooks[1, b, 0]) - g_ref[0]) ** 2))
        for a, b in itertools.product(range(8), range(8))
    )
    codes = beam_search_optimal_codes_l2(
        g_ref, w_small.codebooks, w_small.codes, w_small.scales, beam_size=8, group_chunk=1
    )
    got = _weight_mse(codes, w_small, g_ref)
    assert got <= best * (1 + 1e-5) + 1e-7


def test_force_update_changes_codes(key):
    scheme = AqlmScheme(1, 4, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 8, 8)
    # make reference exactly dequantized weight -> optimum is current codes
    ref_w = dequantize_weight(w)
    stay = beam_search_optimal_codes_l2(ref_w, w.codebooks, w.codes, w.scales, group_chunk=8)
    np.testing.assert_array_equal(np.asarray(stay), np.asarray(w.codes.astype(jnp.int32)))
    forced = beam_search_optimal_codes_l2(
        ref_w, w.codebooks, w.codes, w.scales, force_update=True, beam_size=2, group_chunk=8
    )
    assert np.all(np.any(np.asarray(forced) != np.asarray(w.codes), axis=-1))


def test_max_update_fraction(key):
    scheme = AqlmScheme(1, 4, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 16, 16)
    ref_w = jax.random.normal(kr, (16, 16), jnp.float32)
    codes = beam_search_optimal_codes_l2(
        ref_w, w.codebooks, w.codes, w.scales, max_update_fraction=0.25, group_chunk=16
    )
    changed = np.any(np.asarray(codes) != np.asarray(w.codes), axis=-1)
    assert changed.sum() <= int(np.ceil(0.25 * 64))
    # still improves
    assert _weight_mse(codes, w, ref_w) <= _weight_mse(w.codes.astype(jnp.int32), w, ref_w)


def test_trust_ratio_limits_change(key):
    scheme = AqlmScheme(1, 4, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 16, 16)
    ref_w = jax.random.normal(kr, (16, 16), jnp.float32) * 3
    prev = dequantize_weight(w)
    codes = beam_search_optimal_codes_l2(
        ref_w, w.codebooks, w.codes, w.scales, trust_ratio=0.05, group_chunk=16
    )
    wq = AqlmWeight(codes=codes.astype(w.codes.dtype), codebooks=w.codebooks, scales=w.scales, bias=None, scheme=scheme)
    new = dequantize_weight(wq)
    rel_change = float(jnp.linalg.norm(new - prev) / jnp.linalg.norm(prev))
    # one code is always allowed in excess of the budget; bound loosely
    assert rel_change < 0.5
    unconstrained = beam_search_optimal_codes_l2(ref_w, w.codebooks, w.codes, w.scales, group_chunk=16)
    n_changed_tr = np.any(np.asarray(codes) != np.asarray(w.codes), -1).sum()
    n_changed_un = np.any(np.asarray(unconstrained) != np.asarray(w.codes), -1).sum()
    assert n_changed_tr <= n_changed_un


def test_stochastic_rounding_varies(key):
    scheme = AqlmScheme(1, 4, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 16, 16)
    ref_w = jax.random.normal(kr, (16, 16), jnp.float32)
    a = beam_search_optimal_codes_l2(
        ref_w, w.codebooks, w.codes, w.scales,
        stochastic_rounding_tau=1.0, beam_size=2, key=jax.random.PRNGKey(1), group_chunk=16,
    )
    b = beam_search_optimal_codes_l2(
        ref_w, w.codebooks, w.codes, w.scales,
        stochastic_rounding_tau=1.0, beam_size=2, key=jax.random.PRNGKey(2), group_chunk=16,
    )
    assert np.any(np.asarray(a) != np.asarray(b))


def test_find_optimal_codebooks_reduces_error(key):
    scheme = AqlmScheme(2, 3, in_group_size=4)
    kw, kr = jax.random.split(key)
    w = random_aqlm_weight(kw, scheme, 8, 16)
    ref_w = jax.random.normal(kr, (8, 16), jnp.float32)
    groups = ref_w.reshape(8, 1, 4, 4).transpose(0, 2, 1, 3).reshape(32, 4)
    codes = w.codes.reshape(32, 2).astype(jnp.int32)
    cbs = w.codebooks[:, :, 0, :]
    new_cbs = find_optimal_codebooks(groups, cbs, codes)

    def err(c):
        flat = c.reshape(2 * 8, 4)
        deq = jnp.take(flat, codes + (jnp.arange(2) * 8)[None, :], axis=0).sum(1)
        return float(jnp.sum((deq - groups) ** 2))

    assert err(new_cbs) <= err(cbs) + 1e-6


def test_blocked_candidate_scoring_matches_plain(monkeypatch):
    """S-axis-blocked streaming top-k (the 65536-candidate crash mitigation)
    == the single-program scoring, both beam searches."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aqlm_tpu.calib import beam_search_l2 as bl2
    from aqlm_tpu.calib import beam_search_xtx as bxtx
    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.ops.dequant import dequantize_weight, random_aqlm_weight

    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8)
    w = random_aqlm_weight(jax.random.PRNGKey(0), scheme, 64, 64)
    target = dequantize_weight(w, dtype=jnp.float32) * 1.03 + 0.01

    plain = bl2.beam_search_optimal_codes_l2(
        target, w.codebooks, w.codes, w.scales, beam_size=2)
    jax.clear_caches()
    monkeypatch.setattr(bl2, "_SCORE_S_BLOCK", 64)
    blocked = bl2.beam_search_optimal_codes_l2(
        target, w.codebooks, w.codes, w.scales, beam_size=2)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(blocked))
    jax.clear_caches()

    xtx = jnp.eye(64, dtype=jnp.float32) + 0.01
    plain_x, _ = bxtx.beam_search_optimal_codes(
        xtx, target, w.codebooks, w.codes, w.scales, beam_size=2)
    jax.clear_caches()
    monkeypatch.setattr(bxtx, "_SCORE_S_BLOCK", 64)
    blocked_x, _ = bxtx.beam_search_optimal_codes(
        xtx, target, w.codebooks, w.codes, w.scales, beam_size=2)
    np.testing.assert_array_equal(np.asarray(plain_x), np.asarray(blocked_x))
    jax.clear_caches()
