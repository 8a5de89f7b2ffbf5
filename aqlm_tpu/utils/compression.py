"""Entropy-coding estimators for quantized codes.

Counterpart of the reference's Huffman code-length estimator
(/root/reference/src/utils.py:17-52, `get_mean_nbits_by_codebook`), used to
report how many bits/code an entropy coder would need on top of the fixed-
width storage. Implemented with a plain heapq Huffman builder (no external
`huffman` package), and with the histogram sized by the true codebook size —
the reference sizes its scatter buffer by num_in_groups (utils.py:27-31),
which undercounts for codes whose value exceeds the group count.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np

__all__ = ["huffman_mean_code_length", "get_mean_nbits_by_codebook", "code_entropy"]


def huffman_mean_code_length(probs) -> float:
    """Expected code length (bits/symbol) of an optimal Huffman code."""
    probs = [float(p) for p in probs if p > 0]
    if len(probs) <= 1:
        return 0.0
    heap = [(p, i, 0.0) for i, p in enumerate(probs)]  # (prob, tiebreak, E[len])
    heapq.heapify(heap)
    counter = itertools.count(len(probs))
    total = 0.0
    while len(heap) > 1:
        p1, _, l1 = heapq.heappop(heap)
        p2, _, l2 = heapq.heappop(heap)
        total += p1 + p2  # every merge adds one bit to all contained symbols
        heapq.heappush(heap, (p1 + p2, next(counter), 0.0))
    return total


def code_entropy(probs) -> float:
    p = np.asarray([x for x in probs if x > 0], np.float64)
    return float(-(p * np.log2(p)).sum())


def get_mean_nbits_by_codebook(codes, codebook_size: int, huffman_group_size: int = 2):
    """Mean Huffman bits per code group for each group of codebooks.

    codes: [num_out_groups, num_in_groups, num_codebooks] ints.
    Returns a list of num_codebooks // huffman_group_size expected lengths for
    jointly-coded groups of codebooks (product distribution, matching the
    reference's grouping at utils.py:36-50).
    """
    codes = np.asarray(codes)
    K = codes.shape[-1]
    assert K % huffman_group_size == 0
    flat = codes.reshape(-1, K)
    probs = []
    for k in range(K):
        counts = np.bincount(flat[:, k].astype(np.int64), minlength=codebook_size)
        probs.append(counts / counts.sum())

    lengths = []
    for g in range(K // huffman_group_size):
        joint = np.ones((1,), np.float64)
        for k in range(g * huffman_group_size, (g + 1) * huffman_group_size):
            joint = np.outer(joint, probs[k]).reshape(-1)
        lengths.append(huffman_mean_code_length(joint))
    return lengths
