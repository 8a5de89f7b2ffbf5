"""1x16 -> Kx8 additive codebook transcode for TPU codes-resident serving.

The reference's flagship 1x16 scheme decodes on GPU via per-code gathers
from a 1 MiB codebook in L1 (cuda_kernel.cu:7-95). The v5e VPU has only
128-lane dynamic gathers: a 65536-entry table lookup costs ~512 shuffles
per vreg, which makes exact 1x16 codes-resident decode ~0.3 tok/s (NOTES.md)
— a hardware wall, not a kernel deficiency.

The TPU-native escape: the 65536 codebook ROWS (not the 5.6M weight groups)
are re-fit as an ADDITIVE sum of two 256-entry codebooks,

    CB[c]  ~=  A[hi(c)] + B[lo(c)],

by usage-weighted alternating k-means over code assignments (a tiny problem:
65536 vectors of length g). Codes then transcode by pure table lookup into
the 2x8 layout, which the LUT-GEMM decode kernel serves at full speed. The
approximation error lives in codebook space and is weighted by actual code
usage; it is reported so callers can gate on it. (For exact serving the
int8 runtime mode remains available.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight

__all__ = ["fit_additive_split", "transcode_1x16_to_2x8", "transcode_1x16_to_2xN"]


def _assign(points, centers, w):
    """Weighted nearest-center assignment. points [N,g], centers [S,g]."""
    d = (
        jnp.sum(points * points, axis=1, keepdims=True)
        - 2.0 * points @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    return jnp.argmin(d, axis=1)


def _update(points, assign, w, n_centers, old):
    """Usage-weighted cluster means; empty clusters keep their old center."""
    wsum = jax.ops.segment_sum(w, assign, n_centers)
    psum = jax.ops.segment_sum(points * w[:, None], assign, n_centers)
    safe = jnp.maximum(wsum, 1e-12)[:, None]
    new = psum / safe
    return jnp.where((wsum > 0)[:, None], new, old)


def fit_additive_split(
    codebook: jax.Array,  # [S16, g] (typically 65536 x 8)
    usage: jax.Array | None = None,  # [S16] code-usage counts
    *,
    n_centers: int = 256,
    iters: int = 25,
    seed: int = 0,
):
    """Fit CB[c] ~= A[hi(c)] + B[lo(c)] by alternating weighted k-means.

    Returns (A [n,g], B [n,g], hi [S16] uint8, lo [S16] uint8, rel_mse):
    rel_mse = usage-weighted ||CB - A[hi] - B[lo]||^2 / ||CB||^2.
    """
    cb = jnp.asarray(codebook, jnp.float32)
    S16, g = cb.shape
    w = jnp.ones((S16,), jnp.float32) if usage is None else jnp.asarray(usage, jnp.float32)
    w = jnp.maximum(w, 1e-6)  # unused codes still count a little (stability)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    A = cb[jax.random.choice(k1, S16, (n_centers,), replace=False)]
    B = jnp.zeros((n_centers, g), jnp.float32)  # residual codebook starts at 0
    hi = _assign(cb, A, w)
    lo = jnp.zeros((S16,), jnp.int32)

    def step(carry, _):
        A, B, hi, lo = carry
        rA = cb - B[lo]
        hi = _assign(rA, A, w)
        A = _update(rA, hi, w, n_centers, A)
        rB = cb - A[hi]
        lo = _assign(rB, B, w)
        B = _update(rB, lo, w, n_centers, B)
        return (A, B, hi, lo), None

    def joint_assign(A, B, chunk=2048):
        while S16 % chunk:
            chunk //= 2
        """Exact argmin over all (hi, lo) pairs, chunked over codebook rows —
        coordinate-wise alternation stalls in local minima (each half's
        assignment is conditioned on the other); the joint pass breaks them."""
        M = (
            jnp.sum(A * A, axis=1)[:, None]
            + jnp.sum(B * B, axis=1)[None, :]
            + 2.0 * (A @ B.T)
        )  # ||A_a + B_b||^2, [n, n]

        def one_chunk(c0):
            pts = jax.lax.dynamic_slice_in_dim(cb, c0, chunk, axis=0)
            DA = pts @ A.T  # [chunk, n]
            DB = pts @ B.T
            score = M[None] - 2.0 * (DA[:, :, None] + DB[:, None, :])
            flat = jnp.argmin(score.reshape(chunk, -1), axis=1)
            return flat // B.shape[0], flat % B.shape[0]

        n_chunks = -(-S16 // chunk)
        pad = n_chunks * chunk - S16
        his, los = jax.lax.map(one_chunk, jnp.arange(n_chunks) * chunk)
        hi = his.reshape(-1)[:S16]
        lo = los.reshape(-1)[:S16]
        return hi, lo

    outer = max(1, iters // 5)
    for _ in range(outer):
        (A, B, hi, lo), _ = jax.lax.scan(step, (A, B, hi, lo), None, length=5)
        hi, lo = joint_assign(A, B)
        A = _update(cb - B[lo], hi, w, n_centers, A)
        B = _update(cb - A[hi], lo, w, n_centers, B)
    err = cb - A[hi] - B[lo]
    rel = jnp.sum(w[:, None] * err * err) / jnp.maximum(
        jnp.sum(w[:, None] * cb * cb), 1e-12
    )
    return A, B, hi.astype(jnp.uint8), lo.astype(jnp.uint8), float(rel)


def transcode_1x16_to_2xN(w: AqlmWeight, *, nbits: int = 8, iters: int = 25, seed: int = 0):
    """Transcode a 1x16 AqlmWeight into a 2-codebook additive layout.

    Returns (AqlmWeight with scheme 2xN, rel_codebook_mse). Codes transform
    by table lookup (hi/lo assignment of each 16-bit code); scales and bias
    are unchanged. The weight-level relative MSE equals the usage-weighted
    codebook-space rel_mse (dequantization is linear in the codebook rows).

    nbits=8 (2x8, 2.3 bits resident) is the quality point; nbits=7 (2x7,
    ~2.0 bits) halves the LUT-GEMV decode gathers — S=128 tables take the
    kernel's single-gather no-select path (ops/lut_gemv.py _split_lut) —
    trading fit error for decode speed.
    """
    scheme = w.scheme
    assert scheme.num_codebooks == 1 and scheme.nbits_per_codebook == 16, scheme
    assert scheme.out_group_size == 1, "transcode supports out_group_size == 1"
    assert 2 <= nbits <= 8, nbits
    g = scheme.in_group_size
    cb = jnp.asarray(w.codebooks[0, :, 0, :], jnp.float32)  # [65536, g]
    codes16 = jnp.asarray(w.codes[:, :, 0], jnp.int32) & 0xFFFF  # [OUT, IG]

    usage = jnp.zeros((cb.shape[0],), jnp.float32).at[codes16.reshape(-1)].add(1.0)
    A, B, hi, lo, rel = fit_additive_split(
        cb, usage, n_centers=2 ** nbits, iters=iters, seed=seed)

    new_codes = jnp.stack(
        [hi[codes16].astype(jnp.uint8), lo[codes16].astype(jnp.uint8)], axis=-1
    )  # [OUT, IG, 2]
    new_cbs = jnp.stack([A, B])[:, :, None, :]  # [2, 2^nbits, 1, g]
    out = AqlmWeight(
        codes=new_codes,
        codebooks=new_cbs.astype(w.codebooks.dtype),
        scales=w.scales,
        bias=w.bias,
        scheme=AqlmScheme(
            num_codebooks=2, nbits_per_codebook=nbits,
            in_group_size=g, out_group_size=1,
        ),
    )
    return out, rel


def transcode_1x16_to_2x8(w: AqlmWeight, *, iters: int = 25, seed: int = 0):
    """Back-compat wrapper: 2x8 additive transcode (see transcode_1x16_to_2xN)."""
    return transcode_1x16_to_2xN(w, nbits=8, iters=iters, seed=seed)
