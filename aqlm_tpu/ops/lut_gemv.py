"""LUT-GEMM decode kernel for Kx8 codes-resident serving.

The TPU realization of the reference's Numba LUT strategy
(/root/reference/inference_lib/src/aqlm/inference_kernels/numba_kernel.py:38-48):
precompute lut[b, k, ig, s] = x_group[b, ig] . codebook[k, s] (a trivial MXU
einsum — S*g FLOPs per GROUP), then each output unit is a sum of per-code
table lookups:

    y[b, o] = sum_{k, ig} lut[b, k, ig, codes[k, ig, o]]

The lookup maps onto the VPU lane gather (`take_along_axis(axis=1)` lowers
to tpu.dynamic_gather, measured ~427 G gathers/s in steady state) — one
gather per CODE: g=8 fewer than any per-weight scheme and 256x fewer FLOPs
than the one-hot-MXU kernel.

TILED CODES LAYOUT (the r2 bandwidth fix): with the natural [K*IG, OUT]
layout, each grid block's DMA reads tn-byte (512 B) runs strided by OUT —
measured ~80 GB/s effective, 9x below peak, which dominated decode
(142 us vs 16 us per gate_proj call for cold vs VMEM-resident codes). Codes
are therefore stored as [NT, K*IG, tn] (NT = OUT/tn): every (out-tile,
row-block) grid block is ONE contiguous chunk. `tile_codes` does the
load-time rearrangement; prefill untiles (the copy amortizes over tokens).

Decode-path kernel (small B); the one-hot kernel remains the prefill path
where its MXU cost amortizes over many tokens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import gather_wraps, should_interpret

__all__ = [
    "lut_gemv_kx8",
    "lut_gemv_kx8_tiled",
    "lut_gemv_kx8_indexed",
    "lut_gemv_kx8_grouped_indexed",
    "lut_moe_gemv_kx8",
    "lut_moe_gemv_kx8_indexed",
    "lut_tile_n",
    "tile_codes",
    "untile_codes",
    "LUT_GEMV_MAX_BATCH",
]

LUT_GEMV_MAX_BATCH = 8


def lut_tile_n(out_features: int) -> int:
    """Output-tile width baked into the tiled codes layout."""
    return 512 if out_features % 512 == 0 else 128


def tile_codes(codes_t: jax.Array, tn: int | None = None) -> jax.Array:
    """[K, IG, OUT] -> [NT, IG*K, tn] (each grid block contiguous in HBM).

    Rows are IG-MAJOR (row = ig*K + k): contiguous row blocks then correspond
    to contiguous INPUT slices, so row-parallel tensor parallelism can shard
    the row axis directly (serve/tp.py _qlin_spec) — a k-major order would
    make a row shard a codebook split instead. `tn` overrides the default
    tile width (TP re-tiling: serve/fuse.py _retile_codes)."""
    K, IG, out = codes_t.shape
    if tn is None:
        tn = lut_tile_n(out)
    assert out % tn == 0, out
    c2 = codes_t.transpose(1, 0, 2).reshape(IG * K, out)
    return c2.reshape(IG * K, out // tn, tn).transpose(1, 0, 2)


def untile_codes(codes_tl: jax.Array, num_codebooks: int) -> jax.Array:
    """[NT, IG*K, tn] -> [K, IG, OUT] (prefill / dense materialization)."""
    nt, kig, tn = codes_tl.shape
    c2 = codes_tl.transpose(1, 0, 2).reshape(kig, nt * tn)
    return c2.reshape(kig // num_codebooks, num_codebooks, nt * tn).transpose(1, 0, 2)


def _row_tile(kig: int, batch: int = 1) -> int:
    """Row-block size: bounds the Mosaic stack (gather temporaries are
    [kr, 128] f32 per batch element; the lut blocks are [B, kr, 128] x2)."""
    kr = kig
    limit = max(128, 4096 // max(batch, 1)) if batch > 1 else 1024
    while kr > limit:
        assert kr % 2 == 0, kig
        kr //= 2
    return kr


def _split_lut(lut):
    """[B, R, S] f32 -> (lo, hi) 128-lane halves (hi None when S <= 128)."""
    S = lut.shape[-1]
    if S > 128:
        lut_lo = lut[..., :128]
        lut_hi = lut[..., 128:]
        if S < 256:
            pad = [(0, 0)] * (lut.ndim - 1) + [(0, 256 - S)]
            lut_hi = jnp.pad(lut_hi, pad)
        return lut_lo, lut_hi
    if S < 128:
        pad = [(0, 0)] * (lut.ndim - 1) + [(0, 128 - S)]
        lut = jnp.pad(lut, pad)
    return lut, None



def _gather_accum(codes_block, lo_of, hi_of, acc_ref, *, B, tn, two_halves,
                  wrap_ok=False):
    """Shared inner loop: per 128-lane chunk, gather both table halves and
    accumulate. The cross-row reduction runs on the MXU (a [1,kr]x[kr,128]
    dot with a ones vector): the kernel is VPU-op-bound and the 127 vector
    adds per chunk were ~20% of its op budget; the MXU is otherwise idle.

    wrap_ok: on real TPUs tpu.dynamic_gather WRAPS indices mod 128 (measured,
    experiments/lutgemv_oob_probe.py), so the `& 127` lane mask is redundant
    — one fewer VPU op per chunk. Interpret mode (CPU tests) clamps instead
    of wrapping, so the mask stays there."""
    kr = codes_block.shape[0]
    ones = jnp.ones((1, kr), jnp.float32)
    for c in range(tn // 128):
        idx = codes_block[:, c * 128 : (c + 1) * 128].astype(jnp.int32)  # [kr, 128]
        lane = idx if (wrap_ok or not two_halves) else (idx & 127)
        half = idx < 128
        for b in range(B):
            g_lo = jnp.take_along_axis(lo_of(b), lane, axis=1)
            if two_halves:
                g_hi = jnp.take_along_axis(hi_of(b), lane, axis=1)
                gathered = jnp.where(half, g_lo, g_hi)
            else:
                gathered = g_lo
            acc_ref[b, c * 128 : (c + 1) * 128] += jax.lax.dot_general(
                ones, gathered, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]


def _kernel(codes_ref, lo_ref, hi_ref, sc_ref, out_ref, acc_ref, *, B, tn, two_halves, wrap_ok=False):
    """grid = (out_tiles, row_tiles); the K*IG row dim accumulates innermost.

    Row tiling bounds the Mosaic stack: each chunk's gather temporaries are
    a handful of [kr, 128] f32 arrays; K*IG reaches 4096 for 8x8, which
    overflows the 16 MB scoped-vmem limit unsplit. The per-out-channel scale
    multiply + output cast run in the epilogue: a separate XLA elementwise
    kernel per projection costs more in launch overhead than the multiply."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _gather_accum(codes_ref[0], lambda b: lo_ref[b], lambda b: hi_ref[b],
                  acc_ref, B=B, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)

    @pl.when(r == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _call(codes_tl, lut_lo, lut_hi, scales, *, interpret, out_dtype=jnp.float32):
    nt, kig, tn = codes_tl.shape
    B = lut_lo.shape[0]
    two_halves = lut_hi is not None
    kr = _row_tile(kig, B)

    kern = functools.partial(_kernel, B=B, tn=tn, two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    in_specs = [
        pl.BlockSpec((1, kr, tn), lambda o, r: (o, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, kr, 128), lambda o, r: (0, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, kr, 128), lambda o, r: (0, r, 0), memory_space=pltpu.VMEM),
        # [1, 1, OUT]: leading unit dims keep the last-two-dims block rules
        pl.BlockSpec((1, 1, tn), lambda o, r: (0, 0, o), memory_space=pltpu.VMEM),
    ]
    args = [codes_tl, lut_lo, lut_hi if two_halves else lut_lo,
            scales.reshape(1, 1, -1).astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(nt, kig // kr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tn), lambda o, r: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt * tn), out_dtype),
        scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
        interpret=interpret,
    )(*args)


def _build_lut(xb, codebooks, group):
    B = xb.shape[0]
    K, S = codebooks.shape[0], codebooks.shape[1]
    IG = xb.shape[1] // group
    xg = xb.reshape(B, IG, group).astype(jnp.float32)
    # IG-major rows (row = ig*K + k), matching tile_codes' row order
    lut = jnp.einsum(
        "big,ksg->biks", xg, codebooks.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, IG * K, S)
    return _split_lut(lut)


def lut_gemv_kx8_tiled(x, codes_tl, codebooks, scales, bias=None, *, group: int):
    """y = x @ dequant(codes)^T * scales + bias over the TILED codes layout.

    x: [..., IN]; codes_tl: [NT, K*IG, tn] uint8 (tile_codes); codebooks:
    [K, S<=256, g]; scales: [OUT]. Exact (same math as the one-hot kernel).
    """
    lead = x.shape[:-1]
    xb = x.reshape(-1, x.shape[-1])
    assert codebooks.shape[1] <= 256, "lut_gemv is the Kx8 path"
    lut_lo, lut_hi = _build_lut(xb, codebooks, group)
    # scales fold into the kernel epilogue; the cast folds too unless a bias
    # add still needs f32
    out_dtype = jnp.float32 if bias is not None else x.dtype
    y = _call(codes_tl, lut_lo, lut_hi, scales,
              interpret=should_interpret(), out_dtype=out_dtype)
    if bias is not None:
        y = (y + bias[None, :].astype(y.dtype)).astype(x.dtype)
    return y.reshape(*lead, -1)


def lut_gemv_kx8(x, codes_t, codebooks, scales, bias=None, *, group: int):
    """Logical-layout convenience wrapper: tiles codes_t [K, IG, OUT] per
    call. Serving paths pre-tile at load (QuantizedLinear.from_aqlm)."""
    return lut_gemv_kx8_tiled(
        x, tile_codes(codes_t), codebooks, scales, bias, group=group
    )


# ---------------------------------------------------------------------------
# stacked-expert (MoE) variant: all experts' GEMVs in one launch
# ---------------------------------------------------------------------------


def _kernel_moe(codes_ref, lo_ref, hi_ref, sc_ref, out_ref, acc_ref, *, B, tn, two_halves, wrap_ok=False):
    """grid = (E, out_tiles, row_tiles); same inner loop as _kernel with the
    expert dim leading — each expert gathers from ITS OWN LUT block."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _gather_accum(codes_ref[0, 0], lambda b: lo_ref[0, b], lambda b: hi_ref[0, b],
                  acc_ref, B=B, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)

    @pl.when(r == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_moe(codes_tl_e, lut_lo_e, lut_hi_e, scales_e, *, interpret):
    E, nt, kig, tn = codes_tl_e.shape
    B = lut_lo_e.shape[1]
    two_halves = lut_hi_e is not None
    kr = _row_tile(kig, B)

    kern = functools.partial(_kernel_moe, B=B, tn=tn, two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    in_specs = [
        pl.BlockSpec((1, 1, kr, tn), lambda e, o, r: (e, o, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, kr, 128), lambda e, o, r: (e, 0, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, kr, 128), lambda e, o, r: (e, 0, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda e, o, r: (e, 0, o), memory_space=pltpu.VMEM),
    ]
    args = [codes_tl_e, lut_lo_e, lut_hi_e if two_halves else lut_lo_e,
            scales_e.reshape(E, 1, -1).astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(E, nt, kig // kr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, B, tn), lambda e, o, r: (e, 0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, B, nt * tn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
        interpret=interpret,
    )(*args)


def lut_moe_gemv_kx8(x, codes_tl_e, codebooks_e, scales_e, *, group: int):
    """All-expert Kx8 LUT-GEMV: y[e] = x @ dequant(codes_e)^T * scales_e.

    The codes-mode counterpart of int8_matmul.int8_moe_matmul — ONE kernel
    launch covers every expert (dense-EP: every token is scored by every
    expert; the router weights zero out non-routed contributions outside).

    x: [N, IN] shared across experts, or [E, N, IN] per-expert activations
    (the down-proj case, where each expert consumes its own gate*up);
    codes_tl_e: [E, NT, K*IG, tn] uint8 (per-expert tile_codes);
    codebooks_e: [E, K, S<=256, g]; scales_e: [E, OUT].
    Returns [E, N, OUT] f32.
    """
    assert codebooks_e.shape[2] <= 256, "lut_gemv is the Kx8 path"
    if x.ndim == 3:  # per-expert inputs
        lo, hi = jax.vmap(lambda xe, cb: _build_lut(xe, cb, group))(x, codebooks_e)
    else:
        xb = x.reshape(-1, x.shape[-1])
        lo, hi = jax.vmap(lambda cb: _build_lut(xb, cb, group))(codebooks_e)
    return _call_moe(codes_tl_e, lo, hi, scales_e, interpret=should_interpret())


def _kernel_moe_indexed(idx_ref, codes_ref, lo_ref, hi_ref, sc_ref, out_ref, acc_ref,
                        *, B, tn, two_halves, wrap_ok=False):
    """Layer-indexed all-expert kernel: grid (E, out_tiles, row_tiles); the
    codes block leads with a layer dim of 1 picked by the prefetch index."""
    del idx_ref
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _gather_accum(codes_ref[0, 0, 0], lambda b: lo_ref[0, b], lambda b: hi_ref[0, b],
                  acc_ref, B=B, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)

    @pl.when(r == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = (acc_ref[:] * sc_ref[0, 0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_moe_indexed(codes_tl_le, lut_lo_e, lut_hi_e, scales_le, layer_idx, *, interpret):
    """codes_tl_le: [L, E, NT, K*IG, tn]; layer selected via scalar prefetch
    (a dynamic slice feeding the pallas_call would copy every expert's codes
    to HBM each decode step — same rationale as _call_indexed). scales_le
    [L, E, OUT] is indexed by the same scalar + folded into the epilogue."""
    L, E, nt, kig, tn = codes_tl_le.shape
    B = lut_lo_e.shape[1]
    two_halves = lut_hi_e is not None
    kr = _row_tile(kig, B)

    kern = functools.partial(_kernel_moe_indexed, B=B, tn=tn, two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E, nt, kig // kr),
        in_specs=[
            pl.BlockSpec((1, 1, 1, kr, tn), lambda e, o, r, li: (li[0], e, o, r, 0)),
            pl.BlockSpec((1, B, kr, 128), lambda e, o, r, li: (e, 0, r, 0)),
            pl.BlockSpec((1, B, kr, 128), lambda e, o, r, li: (e, 0, r, 0)),
            pl.BlockSpec((1, 1, 1, tn), lambda e, o, r, li: (li[0], e, 0, o)),
        ],
        out_specs=pl.BlockSpec((1, B, tn), lambda e, o, r, li: (e, 0, o)),
        scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
    )
    args = [codes_tl_le, lut_lo_e, lut_hi_e if two_halves else lut_lo_e,
            scales_le.reshape(L, E, 1, -1).astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, B, nt * tn), jnp.float32),
        interpret=interpret,
    )(layer_idx.reshape(1), *args)


def lut_moe_gemv_kx8_indexed(
    x, codes_tl_le, codebooks_le, scales_le, layer_idx, *, group: int
):
    """Layer-indexed all-expert Kx8 LUT-GEMV for scan-over-layers serving.

    x: [N, IN] shared or [E, N, IN] per-expert; codes_tl_le:
    [L, E, NT, K*IG, tn]; codebooks_le: [L, E, K, S<=256, g]; scales_le:
    [L, E, OUT]. Returns [E, N, OUT] f32 for layer `layer_idx`."""
    assert codebooks_le.shape[3] <= 256, "lut_gemv is the Kx8 path"
    li = jnp.asarray(layer_idx, jnp.int32)
    cbs = jax.lax.dynamic_index_in_dim(codebooks_le, li, 0, keepdims=False)
    if x.ndim == 3:
        lo, hi = jax.vmap(lambda xe, cb: _build_lut(xe, cb, group))(x, cbs)
    else:
        xb = x.reshape(-1, x.shape[-1])
        lo, hi = jax.vmap(lambda cb: _build_lut(xb, cb, group))(cbs)
    return _call_moe_indexed(codes_tl_le, lo, hi, scales_le, li,
                             interpret=should_interpret())


# ---------------------------------------------------------------------------
# layer-indexed variant for scan-over-layers serving
# ---------------------------------------------------------------------------


def _kernel_indexed(idx_ref, codes_ref, lo_ref, hi_ref, sc_ref, out_ref, acc_ref, *, B, tn, two_halves, wrap_ok=False):
    """Same loop as _kernel; codes block leads with (layer, out-tile) dims of
    1 that the scalar-prefetch index map points at the active layer/tile."""
    del idx_ref
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _gather_accum(codes_ref[0, 0], lambda b: lo_ref[b], lambda b: hi_ref[b],
                  acc_ref, B=B, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)

    @pl.when(r == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _call_indexed(codes_tl, lut_lo, lut_hi, scales_all, layer_idx, *, interpret,
                  out_dtype=jnp.float32):
    """codes_tl: [L, NT, K*IG, tn]; the layer is selected INSIDE the kernel
    via a scalar-prefetch index map. A lax.scan-sliced (or
    dynamic_index_in_dim'd) codes operand feeding an opaque pallas_call costs
    an HBM copy of the layer's codes every step (~100 MB of traffic per 7B
    layer); indexing in the BlockSpec reads each code byte exactly once
    (same design as ops/int8_matmul._call_indexed). scales_all [L, 1, OUT]
    is layer-indexed by the same prefetch scalar and folded into the
    epilogue (a separate XLA scale kernel per projection costs more launch
    overhead than the multiply)."""
    L, nt, kig, tn = codes_tl.shape
    B = lut_lo.shape[0]
    two_halves = lut_hi is not None
    kr = _row_tile(kig, B)

    kern = functools.partial(_kernel_indexed, B=B, tn=tn, two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, kig // kr),
        in_specs=[
            pl.BlockSpec((1, 1, kr, tn), lambda o, r, li: (li[0], o, r, 0)),
            pl.BlockSpec((B, kr, 128), lambda o, r, li: (0, r, 0)),
            pl.BlockSpec((B, kr, 128), lambda o, r, li: (0, r, 0)),
            pl.BlockSpec((1, 1, tn), lambda o, r, li: (li[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda o, r, li: (0, o)),
        scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
    )
    args = [codes_tl, lut_lo, lut_hi if two_halves else lut_lo,
            scales_all.reshape(L, 1, -1).astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nt * tn), out_dtype),
        interpret=interpret,
    )(layer_idx.reshape(1), *args)


def lut_gemv_kx8_indexed(
    x, codes_tl_all, codebooks_all, scales_all, layer_idx, bias_all=None, *, group: int
):
    """Layer-indexed lut_gemv for stacked serving params.

    codes_tl_all: [L, NT, K*IG, tn] uint8 (tiled); codebooks_all:
    [L, K, S<=256, g]; scales_all: [L, OUT]; layer_idx: scalar int. The tiny
    per-layer codebooks are sliced outside; the big codes array and the
    scales are indexed inside the kernel."""
    lead = x.shape[:-1]
    xb = x.reshape(-1, x.shape[-1])
    assert codebooks_all.shape[2] <= 256, "lut_gemv is the Kx8 path"
    li = jnp.asarray(layer_idx, jnp.int32)
    cbs = jax.lax.dynamic_index_in_dim(codebooks_all, li, 0, keepdims=False)
    lut_lo, lut_hi = _build_lut(xb, cbs, group)
    out_dtype = jnp.float32 if bias_all is not None else x.dtype
    y = _call_indexed(codes_tl_all, lut_lo, lut_hi, scales_all, li,
                      interpret=should_interpret(), out_dtype=out_dtype)
    if bias_all is not None:
        bias = jax.lax.dynamic_index_in_dim(bias_all, li, 0, keepdims=False)
        y = (y + bias[None, :].astype(y.dtype)).astype(x.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# grouped (fused-projection) + layer-indexed variant
# ---------------------------------------------------------------------------


def _kernel_grouped(idx_ref, pt_ref, codes_ref, lo_ref, hi_ref, sc_ref, out_ref, acc_ref, *, B, tn, two_halves, wrap_ok=False):
    """Fused projections: the codes block is the natural OUT-concatenation of
    tiles; each out-tile gathers from ITS projection's LUT (lo/hi blocks are
    indexed by the prefetch proj-map, so q/k/v outputs see q/k/v LUTs)."""
    del idx_ref, pt_ref
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _gather_accum(codes_ref[0, 0], lambda b: lo_ref[b, 0], lambda b: hi_ref[b, 0],
                  acc_ref, B=B, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)

    @pl.when(r == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _call_grouped(codes_tl, lut_lo, lut_hi, scales_all, proj_map, layer_idx, *,
                  interpret, out_dtype=jnp.float32):
    """codes_tl: [L, NT_total, K*IG, tn]; lut_lo/hi: [B, P, K*IG, 128];
    proj_map: [NT_total] int32 prefetch array mapping out-tile -> projection;
    scales_all [L, OUT_total] layer-indexed + folded into the epilogue."""
    L, nt, kig, tn = codes_tl.shape
    B = lut_lo.shape[0]
    two_halves = lut_hi is not None
    kr = _row_tile(kig, B)

    kern = functools.partial(_kernel_grouped, B=B, tn=tn, two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, kig // kr),
        in_specs=[
            pl.BlockSpec((1, 1, kr, tn), lambda o, r, li, pt: (li[0], o, r, 0)),
            pl.BlockSpec((B, 1, kr, 128), lambda o, r, li, pt: (0, pt[o], r, 0)),
            pl.BlockSpec((B, 1, kr, 128), lambda o, r, li, pt: (0, pt[o], r, 0)),
            pl.BlockSpec((1, 1, tn), lambda o, r, li, pt: (li[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda o, r, li, pt: (0, o)),
        scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
    )
    args = [codes_tl, lut_lo, lut_hi if two_halves else lut_lo,
            scales_all.reshape(L, 1, -1).astype(jnp.float32)]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nt * tn), out_dtype),
        interpret=interpret,
    )(layer_idx.reshape(1), proj_map, *args)


def lut_gemv_kx8_grouped_indexed(
    x, codes_tl_all, codebooks_all, scales_all, out_sizes, layer_idx, *, group: int
):
    """Fused-projection Kx8 LUT-GEMM decode over stacked layers.

    Projections sharing an input (q/k/v; gate/up) are fused into ONE kernel
    launch: codes_tl_all [L, NT_total, K*IG, tn] concatenates the parts'
    TILED codes along the tile axis, codebooks_all [L, P, K, S, g] keeps
    each projection's codebooks, and every out-tile gathers from its own
    projection's LUT via a prefetch proj-map (out_sizes: static
    per-projection output widths). Cuts decode from 7 to 4 kernel launches
    per transformer block.
    """
    lead = x.shape[:-1]
    xb = x.reshape(-1, x.shape[-1])
    L, nt_total, kig, tn = codes_tl_all.shape
    P, S = codebooks_all.shape[1], codebooks_all.shape[3]
    assert S <= 256 and P == len(out_sizes) and sum(out_sizes) == nt_total * tn
    assert all(sz % tn == 0 for sz in out_sizes), (out_sizes, tn)
    li = jnp.asarray(layer_idx, jnp.int32)
    cbs = jax.lax.dynamic_index_in_dim(codebooks_all, li, 0, keepdims=False)
    B = xb.shape[0]
    IG = xb.shape[1] // group
    xg = xb.reshape(B, IG, group).astype(jnp.float32)
    # IG-major rows (row = ig*K + k), matching tile_codes' row order
    lut = jnp.einsum(
        "big,pksg->bpiks", xg, cbs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, P, kig, S)
    lut_lo, lut_hi = _split_lut(lut)

    pm = []
    for p, sz in enumerate(out_sizes):
        pm += [p] * (sz // tn)
    proj_map = jnp.asarray(pm, jnp.int32)

    y = _call_grouped(codes_tl_all, lut_lo, lut_hi, scales_all, proj_map, li,
                      interpret=should_interpret(), out_dtype=x.dtype)
    return y.reshape(*lead, -1)
