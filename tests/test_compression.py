"""Huffman/entropy estimator tests."""

import numpy as np

from aqlm_tpu.utils.compression import (
    code_entropy,
    get_mean_nbits_by_codebook,
    huffman_mean_code_length,
)


def test_huffman_uniform_is_log2():
    # uniform over 8 symbols: optimal = exactly 3 bits
    np.testing.assert_allclose(huffman_mean_code_length([1 / 8] * 8), 3.0)


def test_huffman_bounds_entropy():
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(37))
    h = code_entropy(p)
    l = huffman_mean_code_length(p)
    assert h <= l < h + 1, (h, l)  # classic Huffman optimality bounds


def test_huffman_known_case():
    # p = [0.5, 0.25, 0.25]: codes 0, 10, 11 -> E[len] = 1.5
    np.testing.assert_allclose(huffman_mean_code_length([0.5, 0.25, 0.25]), 1.5)


def test_mean_nbits_by_codebook():
    rng = np.random.RandomState(0)
    # skewed codes: low values much more frequent
    codes = np.minimum(rng.geometric(0.3, size=(64, 32, 2)) - 1, 15).astype(np.uint8)
    lengths = get_mean_nbits_by_codebook(codes, codebook_size=16, huffman_group_size=2)
    assert len(lengths) == 1
    # joint coding of 2 codebooks of 16 symbols: < 8 bits for a skewed dist
    assert 0 < lengths[0] < 8.0
    # uniform codes should need ~8 bits for the pair
    uni = rng.randint(0, 16, size=(64, 32, 2)).astype(np.uint8)
    uni_len = get_mean_nbits_by_codebook(uni, codebook_size=16, huffman_group_size=2)
    assert uni_len[0] > lengths[0]
