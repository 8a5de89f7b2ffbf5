"""Codes-resident matmul for 16-bit codebooks (1x16 schemes) — "memory mode".

v5e's gather engine moves ~2.4 G wide rows/s but only ~0.09 G narrow rows/s
(NOTES.md), so the 65536-entry codebook is packed into 128-lane rows (16 g=8
entries per row). Dequant = wide-row gather by the code's high bits + a fused
(rows * onehot16).sum extraction by the low bits — 16.5 ms/layer honest on
Llama-2-7B gate_proj (experiments/extract16_pallas.py records why two Pallas
extraction variants lose to this XLA-fused form). This is the TPU
replacement for Code1x16MatVec's warp-gather
(/root/reference/.../cuda_kernel.cu:7-95); exact, the price of 2.2-bit HBM
residency on this hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
__all__ = ["pack_codebook_rows", "gather_matmul_16", "dequantize_gather16"]


def pack_codebook_rows(codebook: jax.Array, group: int, dtype=jnp.bfloat16) -> jax.Array:
    """[S, group] -> [S*group/128, 128] row-packed table (bf16 for serving;
    f32 for the calibration-grade differentiable path)."""
    s = codebook.shape[0]
    per_row = 128 // group
    assert s % per_row == 0
    return codebook.reshape(s * group // 128, 128).astype(dtype)


def _dequant_rows(codes, packed_cb, group: int):
    """codes [*ANY] int32 -> entries [*ANY, group] via wide-row gather +
    one-hot entry extraction.

    Extraction is a (rows * onehot16).sum over the 16 entries per row — one
    fused multiply-reduce (a roll/select ladder that rewrites the [N, 128]
    tensor log2(16) times measures 4x slower)."""
    per_row = 128 // group
    rows = jnp.take(packed_cb, codes // per_row, axis=0)  # [..., 128]
    rows = rows.reshape(*codes.shape, per_row, group)
    sel = (codes % per_row)[..., None] == jnp.arange(per_row)
    return (rows * sel[..., None].astype(rows.dtype)).sum(-2)


@functools.partial(jax.jit, static_argnames=("group", "chunk"))
def _dequant_weight_16(codes, packed_cb, *, group, chunk=None):
    """codes [OUT, IG] -> UNSCALED W [OUT, IN] bf16.

    XLA wide-row gather + fused one-hot-16 extraction (16.5 ms/layer honest
    on gate_proj; the row-read floor says ~4.5 ms is available to a fused
    gather+extract kernel, see experiments/extract16_pallas.py). Set `chunk`
    to bound transient memory on very large layers — the lax.map serializes."""
    out_features, ig = codes.shape

    def one_chunk(c):
        c = c.astype(jnp.int32)
        return _dequant_rows(c, packed_cb, group).reshape(c.shape[0], ig * group)

    if chunk is not None and out_features % chunk == 0 and out_features > chunk:
        w = jax.lax.map(one_chunk, codes.reshape(-1, chunk, ig))
        return w.reshape(out_features, ig * group)
    return one_chunk(codes)


def dequantize_gather16(codes, packed_cb, scales, *, group: int):
    """Materialize dense W [OUT, IN] bf16 from 16-bit codes."""
    w = _dequant_weight_16(codes, packed_cb, group=group)
    return w * scales[:, None].astype(w.dtype)


def gather_matmul_16(x, codes, packed_cb, scales, bias=None, *, group: int):
    """y = (x @ dequant(codes)^T) * scales + bias (weights never persist).

    Per-out-channel scales apply to the OUTPUT: scaling W pre-dot breaks
    XLA's gather->dot fusion and costs ~6x (NOTES.md)."""
    w = _dequant_weight_16(codes, packed_cb, group=group)
    y = jnp.einsum(
        "...i,oi->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    y = (y * scales.astype(y.dtype)).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
