"""Codes-resident matmul for 16-bit codebooks (1x16 schemes) — "memory mode".

v5e's gather engine moves ~2.4 wide rows/cycle but only ~0.09 narrow rows/cycle
(NOTES.md), so the 65536-entry codebook is packed into 128-lane rows (16 g=8
entries per row). Dequant = wide-row gather by the code's high bits + a
static roll/select ladder to extract the entry by the low bits. This is the
TPU replacement for Code1x16MatVec's warp-gather
(/root/reference/.../cuda_kernel.cu:7-95); exact, ~15-25x slower than dense
decode — the price of 2.2-bit HBM residency on this hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import should_interpret

__all__ = ["pack_codebook_rows", "gather_matmul_16", "dequantize_gather16"]


def pack_codebook_rows(codebook: jax.Array, group: int) -> jax.Array:
    """[S, group] -> [S*group/128, 128] row-packed table (bf16)."""
    s = codebook.shape[0]
    per_row = 128 // group
    assert s % per_row == 0
    return codebook.reshape(s * group // 128, 128).astype(jnp.bfloat16)


def _extract_kernel(rows_ref, off_ref, r_ref, out_ref, *, per_row, group):
    """[tN, 128] gathered rows + entry offsets -> [tN, group] entries.

    mask out everything but the selected entry's lanes (VPU compare+mul),
    then compact 128 lanes -> group with a constant [128, group] matmul.
    Reads the gathered rows exactly once — XLA's lowering of the same
    extraction materializes them twice (measured 16.5 -> ~4.5 ms/layer)."""
    rows = rows_ref[:]
    lane_entry = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) // group
    mask = (lane_entry == off_ref[:].reshape(-1, 1)).astype(rows.dtype)
    out_ref[:] = jax.lax.dot_general(
        rows * mask, r_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _extract16(rows, off, *, group, interpret):
    """rows [N, 128] bf16, off [N] int32 (entry index within row) -> [N, group]."""
    n = rows.shape[0]
    per_row = 128 // group
    tn = 1024
    assert n % tn == 0, n
    # constant compaction matrix: R[l, j] = 1 where l % group == j
    r = (jnp.arange(128)[:, None] % group == jnp.arange(group)[None, :]).astype(jnp.bfloat16)
    kern = functools.partial(_extract_kernel, per_row=per_row, group=group)
    return pl.pallas_call(
        kern,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, group), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, group), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group), jnp.bfloat16),
        interpret=interpret,
    )(rows, off, r)


def _dequant_rows(codes, packed_cb, group: int):
    """codes [*ANY] int32 -> entries [*ANY, group] via wide-row gather +
    one-hot entry extraction.

    Extraction is a (rows * onehot16).sum over the 16 entries per row — one
    fused multiply-reduce, vs the previous roll/select ladder that rewrote
    the [N, 128] tensor log2(16) times (measured 17 -> 5.5 ms/layer on
    Llama-2-7B gate_proj)."""
    per_row = 128 // group
    rows = jnp.take(packed_cb, codes // per_row, axis=0)  # [..., 128]
    rows = rows.reshape(*codes.shape, per_row, group)
    sel = (codes % per_row)[..., None] == jnp.arange(per_row)
    return (rows * sel[..., None].astype(rows.dtype)).sum(-2)


@functools.partial(jax.jit, static_argnames=("group", "chunk"))
def _dequant_weight_16(codes, packed_cb, *, group, chunk=None):
    """codes [OUT, IG] -> UNSCALED W [OUT, IN] bf16.

    XLA wide-row gather + fused one-hot-16 extraction (16.5 ms/layer honest
    on gate_proj). A Pallas extraction variant exists (_extract16) but its
    [N, group<128] output blocks waste 15/16 of store bandwidth and measure
    slower (29.7 ms); a 128-lane-output redesign is future work — the row
    read floor says ~4.5 ms is available. Set `chunk` to bound transient
    memory on very large layers — the lax.map serializes."""
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
