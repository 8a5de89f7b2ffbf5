"""Gather-dequant prefill kernels for Kx8 codes-resident serving.

The r3 bench exposed codes-mode prefill at 188 tok/s vs int8's 5081 on the
same prompt. The cause: the one-hot prefill kernel (ops/kernels.py) builds
its one-hot via a [IG, tn, S] compare-vs-iota on the VPU — ~S compares per
weight group per codebook = ~13G VPU element-ops per 7B layer, ~10x the MXU
dequant FLOPs it feeds — plus the prefill path untiled the whole layer's
codes per call (ops/lut_gemv.untile_codes inside the jitted forward).

This module replaces both: W^T tiles are dequantized with the decode
kernel's 128-lane table gathers (tpu.dynamic_gather, measured ~427 G/s —
g gathers per CODE instead of S compares per GROUP, a ~26x op reduction)
reading the TILED codes layout [NT, K*IG, tn] directly (contiguous DMA, no
untile), then fed straight to the MXU against the token block. Reference
counterpart: the GEMM/dequant path that exists precisely so prefill is not
GEMV-bound (cuda_kernel.cpp:249-301, Code1x16Dequant cuda_kernel.cu:98-142).

Layout contract (shared with ops/lut_gemv.tile_codes): rows are IG-major
(row = ig*K + k), so a row block of kr = tig*K rows covers input groups
[r*tig, (r+1)*tig) — the matching x columns are one contiguous slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import gather_wraps, should_interpret

__all__ = [
    "gather_prefill_matmul",
    "gather_prefill_matmul_indexed",
    "gather_prefill_matmul_grouped_indexed",
    "gather_dequant_wt",
]


def _dequant_tile(codes_blk, lo_ref, hi_ref, wt_ref, *, tig, kk, g, tn,
                  two_halves, wrap_ok=False):
    """Dequantize a [kr, tn] codes block into wt_ref [tig, g, tn] f32 via
    lane gathers; returns the [tig*g, tn] f32 W^T tile.

    codes_blk  [kr, tn] uint8 (kr = tig*kk rows, ig-major)
    lo/hi_ref  [g, kk, 128] f32 element-j codebook tables (f32: bf16 lane
               gathers crash the remote Mosaic compiler, NOTES.md)
    wt_ref     scratch [tig, g, tn] f32

    The j loop is OUTER so the [kr, 128] table broadcast (a strided
    tig-replication of the [kk, 128] row — as many element writes as the
    gathers themselves) happens once per j instead of once per (j, chunk).
    """
    kr = tig * kk
    idx = codes_blk.astype(jnp.int32)
    for j in range(g):
        tlo = jnp.broadcast_to(lo_ref[j][None], (tig, kk, 128)).reshape(kr, 128)
        thi = (
            jnp.broadcast_to(hi_ref[j][None], (tig, kk, 128)).reshape(kr, 128)
            if two_halves else None
        )
        for c in range(tn // 128):
            chunk = idx[:, c * 128 : (c + 1) * 128]
            # real TPUs: tpu.dynamic_gather wraps mod 128 (probed in
            # kernels.gather_wraps), so the lane mask is interpret-only
            lane = chunk if (wrap_ok or not two_halves) else (chunk & 127)
            glo = jnp.take_along_axis(tlo, lane, axis=1)
            if two_halves:
                ghi = jnp.take_along_axis(thi, lane, axis=1)
                gath = jnp.where(chunk < 128, glo, ghi)
            else:
                gath = glo
            # sum the K codebook contributions (adjacent rows of the ig-major
            # layout) while scattering element j into the W^T row interleave
            wt_ref[:, j, c * 128 : (c + 1) * 128] = gath.reshape(tig, kk, 128).sum(axis=1)
    return wt_ref[:].reshape(tig * g, tn)


def _accum_body(wt, x_ref, sc_ref, out_ref, acc_ref, *, first_r, last_r):
    """x_blk @ W^T accumulated over row tiles; scale epilogue at the last.

    x block is [tb, tig*g] (the row-tile search guarantees tig*g %% 128 == 0
    or tig*g == IN — Mosaic's last-dim block rule; the 3-D [tb, tig, g]
    alternative is NOT viable: tpu.matmul cannot lower a 2-contracting-dims
    dot, bench r4b)."""

    @pl.when(first_r)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(last_r)
    def _():
        out_ref[:] = (acc_ref[:] * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


def _dequant_or_reuse(codes_blk, lo_ref, hi_ref, wt_ref, wtf_ref, *, tig, kk,
                      g, tn, two_halves, wrap_ok, amortize):
    """W^T tile for this (out-tile, row-tile) grid step.

    amortize=True (multi-batch-tile grids): batch tile 0 dequantizes and
    persists the tile into the wtf_ref full-column scratch at its row
    offset; later batch tiles read it back — the dequant (>90% of the
    kernel, prefill_probe r4) runs once per out-tile instead of once per
    (out-tile, batch-tile). Scratch persists across sequential grid steps
    because the batch-tile axis is OUTSIDE the row axis in the grid."""
    if not amortize:
        return _dequant_tile(codes_blk, lo_ref, hi_ref, wt_ref, tig=tig, kk=kk,
                             g=g, tn=tn, two_halves=two_halves,
                             wrap_ok=wrap_ok).astype(jnp.bfloat16)
    bt, r = pl.program_id(1), pl.program_id(2)
    tg2 = tig * g

    @pl.when(bt == 0)
    def _():
        wt = _dequant_tile(codes_blk, lo_ref, hi_ref, wt_ref, tig=tig, kk=kk,
                           g=g, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)
        wtf_ref[pl.ds(r * tg2, tg2)] = wt.astype(jnp.bfloat16)

    return wtf_ref[pl.ds(pl.program_id(2) * tg2, tg2)]


_WT_SCRATCH_CAP = 6 * 2 ** 20  # bytes of persistent bf16 W^T column scratch


def _slab_split(kig, kk, g, tn, n_bt):
    """Row-dim slabs whose full-column W^T bf16 scratch fits the VMEM cap
    (amortized-dequant mode); [(0, kig)] with amortize=False when single
    batch tile or no legal equal split exists.

    Slabs partition the CONTRACTION (input) dim: each slab is an independent
    pallas_call over a contiguous row/x-column slice (rows are ig-major) and
    the partial outputs sum — scales are per-out-channel, so the epilogue
    distributes over the sum."""
    if n_bt <= 1:
        return [(0, kig)], False
    for n in range(1, kig + 1):
        if kig % n:
            continue
        rows = kig // n
        if rows % kk:
            continue
        if rows // kk * g * tn * 2 <= _WT_SCRATCH_CAP:
            return [(i * rows, (i + 1) * rows) for i in range(n)], True
    return [(0, kig)], False


def _row_tile(kig: int, kk: int, g: int, tn: int) -> int:
    """Row-block size: bounds the W^T scratch (tig*g*tn f32, ~<=3 MiB) while
    staying a multiple of 8 (Mosaic second-to-last block-dim rule — a 7B
    down_proj KIG=2752 halves to 172, which the TPU lowering rejects)."""

    def ok(kr):
        # codes block second-to-last dim (kr) must be a multiple of 8 and the
        # x block last dim (tig*g) a multiple of 128 — or the block equals
        # the full array dim, which Mosaic always allows (tiny-shape
        # fallback: kr == kig makes BOTH blocks full-dim)
        if kr % kk:
            return False
        if kr == kig:
            return True
        return kr % 8 == 0 and ((kr // kk) * g) % 128 == 0

    def scratch(kr):
        return (kr // kk) * g * tn * 4

    # exhaustive divisor search (kig is small): largest legal tile within
    # the scratch bound; fall back to the largest legal tile, then to the
    # full dim (always Mosaic-legal)
    divs = [d for d in range(1, kig + 1) if kig % d == 0]
    legal = [d for d in divs if ok(d)]
    in_budget = [d for d in legal if scratch(d) <= 3 * 2**20]
    if in_budget:
        kr = max(in_budget)
    elif legal:
        kr = min(legal, key=scratch)
    else:
        kr = kig
    assert kig % kr == 0, (kig, kr)
    return kr


def _batch_tile(b: int) -> int:
    """Batch tile: the second-to-last dim of the x/out blocks, so Mosaic
    requires a multiple of 8 (or the full dim). b is already padded to a
    multiple of 8 (_pad_batch), so searching downward over multiples of 8
    always terminates at a legal tile (tb=8 divides every padded b); a
    non-multiple-of-8 divisor (e.g. 328 -> 164) fails TPU lowering."""
    if b <= 256:
        return b  # full dim — always Mosaic-legal
    tb = 256
    while b % tb:
        tb -= 8
    return tb


def _tables(codebooks: jax.Array):
    """[K, S, g] -> ([g, K, 128] lo, [g, K, 128] hi, two_halves)."""
    kk, s, g = codebooks.shape
    assert s <= 256, "gather_prefill is the Kx8 path"
    cbt = codebooks.transpose(2, 0, 1).astype(jnp.float32)  # [g, K, S]
    if s < 128:
        cbt = jnp.pad(cbt, ((0, 0), (0, 0), (0, 128 - s)))
    if s > 128:
        lo = cbt[..., :128]
        hi = cbt[..., 128:]
        if s < 256:
            hi = jnp.pad(hi, ((0, 0), (0, 0), (0, 256 - s)))
        return lo, hi, True
    return cbt, cbt, False


def _pad_batch(xb: jax.Array):
    b = xb.shape[0]
    bp = (b + 7) // 8 * 8
    if bp != b:
        xb = jnp.pad(xb, ((0, bp - b), (0, 0)))
    return xb, b


# ---------------------------------------------------------------------------
# plain (single weight)
# ---------------------------------------------------------------------------


def _kernel(codes_ref, lo_ref, hi_ref, x_ref, sc_ref, out_ref, acc_ref, wt_ref,
            wtf_ref, *, tig, kk, g, tn, two_halves, wrap_ok=False,
            amortize=False):
    r = pl.program_id(2)
    wt = _dequant_or_reuse(codes_ref[0], lo_ref, hi_ref, wt_ref, wtf_ref,
                           tig=tig, kk=kk, g=g, tn=tn, two_halves=two_halves,
                           wrap_ok=wrap_ok, amortize=amortize)
    _accum_body(wt, x_ref, sc_ref, out_ref, acc_ref, first_r=r == 0,
                last_r=r == pl.num_programs(2) - 1)


def gather_prefill_matmul(x, codes_tl, codebooks, scales, bias=None, *, group: int):
    """y = x @ dequant(codes)^T * scales + bias over the TILED codes layout.

    x: [..., IN]; codes_tl: [NT, K*IG, tn] uint8 (lut_gemv.tile_codes);
    codebooks: [K, S<=256, g]; scales: [OUT]; bias: [OUT] or None.
    Exact — same math as the one-hot kernel, ~26x fewer VPU ops.
    """
    lead = x.shape[:-1]
    xb, b_orig = _pad_batch(x.reshape(-1, x.shape[-1]))
    lo, hi, two = _tables(codebooks)
    y = _call_plain(
        xb, codes_tl, lo, hi, scales, group=group, two_halves=two,
        interpret=should_interpret(),
    )[:b_orig]
    if bias is not None:
        y = (y.astype(jnp.float32) + bias[None, :]).astype(y.dtype)
    return y.reshape(*lead, -1)


@functools.partial(jax.jit, static_argnames=("group", "two_halves", "interpret"))
def _call_plain(xb, codes_tl, lo, hi, scales, *, group, two_halves, interpret):
    nt, kig, tn = codes_tl.shape
    g, kk = lo.shape[0], lo.shape[1]
    b = xb.shape[0]
    tb = _batch_tile(b)
    slabs, amortize = _slab_split(kig, kk, g, tn, b // tb)
    sc = scales.reshape(1, 1, -1).astype(jnp.float32)
    # partial sums across >1 slab stay f32; the single-slab fast path writes
    # the activation dtype directly
    out_dtype = jnp.float32 if len(slabs) > 1 else xb.dtype

    y = None
    for s0, s1 in slabs:
        skig = s1 - s0
        kr = _row_tile(skig, kk, g, tn)
        tig = kr // kk
        off = s0 // kr  # slab offset in row-block units (kr divides skig = s0 step)
        kern = functools.partial(
            _kernel, tig=tig, kk=kk, g=g, tn=tn, two_halves=two_halves,
            wrap_ok=not interpret and gather_wraps(), amortize=amortize,
        )
        # slabs enter via the index maps, NOT operand slices — slicing the
        # codes operand would materialize a partial copy of it per call
        part = pl.pallas_call(
            kern,
            grid=(nt, b // tb, skig // kr),
            in_specs=[
                pl.BlockSpec((1, kr, tn), lambda o, bt, r, _f=off: (o, r + _f, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, tig * g), lambda o, bt, r, _f=off: (bt, r + _f), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tn), lambda o, bt, r: (0, 0, o), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, tn), lambda o, bt, r: (bt, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nt * tn), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((tb, tn), jnp.float32),
                pltpu.VMEM((tig, g, tn), jnp.float32),
                pltpu.VMEM(
                    ((skig // kk) * g if amortize else 8, tn), jnp.bfloat16
                ),
            ],
            interpret=interpret,
        )(codes_tl, lo, hi, xb, sc)
        y = part if y is None else y + part
    return y.astype(xb.dtype)


# ---------------------------------------------------------------------------
# standalone dequant (dense W^T materialization: backward pass, transcoding)
# ---------------------------------------------------------------------------


def _dequant_kernel(codes_ref, lo_ref, hi_ref, sc_ref, out_ref, wt_ref,
                    *, tig, kk, g, tn, two_halves, wrap_ok=False):
    wt = _dequant_tile(codes_ref[0], lo_ref, hi_ref, wt_ref, tig=tig, kk=kk,
                       g=g, tn=tn, two_halves=two_halves, wrap_ok=wrap_ok)
    out_ref[:] = (wt * sc_ref[0, 0][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("two_halves", "dtype", "interpret"))
def _call_dequant(codes_tl, lo, hi, scales, *, two_halves, dtype, interpret):
    nt, kig, tn = codes_tl.shape
    g, kk = lo.shape[0], lo.shape[1]
    kr = _row_tile(kig, kk, g, tn)
    tig = kr // kk
    kern = functools.partial(_dequant_kernel, tig=tig, kk=kk, g=g, tn=tn,
                             two_halves=two_halves,
                             wrap_ok=not interpret and gather_wraps())
    return pl.pallas_call(
        kern,
        grid=(nt, kig // kr),
        in_specs=[
            pl.BlockSpec((1, kr, tn), lambda o, r: (o, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda o, r: (0, 0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tig * g, tn), lambda o, r: (r, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((kig // kk) * g, nt * tn), dtype),
        scratch_shapes=[pltpu.VMEM((tig, g, tn), jnp.float32)],
        interpret=interpret,
    )(codes_tl, lo, hi, scales.reshape(1, 1, -1).astype(jnp.float32))


def gather_dequant_wt(codes_tl, codebooks, scales, *, dtype=jnp.bfloat16):
    """Materialize W^T [IN, OUT] from tiled codes via lane-gather dequant
    (the gather replacement for kernels.dequantize_onehot)."""
    lo, hi, two = _tables(codebooks)
    return _call_dequant(codes_tl, lo, hi, scales, two_halves=two, dtype=dtype,
                         interpret=should_interpret())


# ---------------------------------------------------------------------------
# layer-indexed (stacked scan serving)
# ---------------------------------------------------------------------------


def _kernel_indexed(idx_ref, codes_ref, lo_ref, hi_ref, x_ref, sc_ref, out_ref,
                    acc_ref, wt_ref, wtf_ref, *, tig, kk, g, tn, two_halves,
                    wrap_ok=False, amortize=False):
    del idx_ref
    r = pl.program_id(2)
    wt = _dequant_or_reuse(codes_ref[0, 0], lo_ref, hi_ref, wt_ref, wtf_ref,
                           tig=tig, kk=kk, g=g, tn=tn, two_halves=two_halves,
                           wrap_ok=wrap_ok, amortize=amortize)
    _accum_body(wt, x_ref, sc_ref, out_ref, acc_ref, first_r=r == 0,
                last_r=r == pl.num_programs(2) - 1)


@functools.partial(jax.jit, static_argnames=("group", "two_halves", "interpret"))
def _call_indexed(xb, codes_tl_all, lo, hi, scales_all, layer_idx, *,
                  group, two_halves, interpret):
    """codes_tl_all: [L, NT, K*IG, tn]; the layer is selected INSIDE the
    kernel via scalar prefetch — a dynamic_index_in_dim'd operand feeding an
    opaque pallas_call copies the layer's codes to HBM first (same design as
    lut_gemv._call_indexed)."""
    L, nt, kig, tn = codes_tl_all.shape
    g, kk = lo.shape[0], lo.shape[1]
    b = xb.shape[0]
    tb = _batch_tile(b)
    slabs, amortize = _slab_split(kig, kk, g, tn, b // tb)
    sc = scales_all.reshape(L, 1, -1).astype(jnp.float32)
    out_dtype = jnp.float32 if len(slabs) > 1 else xb.dtype

    y = None
    for s0, s1 in slabs:
        skig = s1 - s0
        kr = _row_tile(skig, kk, g, tn)
        tig = kr // kk
        off = s0 // kr  # slab offset in row-block units
        kern = functools.partial(
            _kernel_indexed, tig=tig, kk=kk, g=g, tn=tn, two_halves=two_halves,
            wrap_ok=not interpret and gather_wraps(), amortize=amortize,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, b // tb, skig // kr),
            in_specs=[
                pl.BlockSpec((1, 1, kr, tn), lambda o, bt, r, li, _f=off: (li[0], o, r + _f, 0)),
                pl.BlockSpec((g, kk, 128), lambda o, bt, r, li: (0, 0, 0)),
                pl.BlockSpec((g, kk, 128), lambda o, bt, r, li: (0, 0, 0)),
                pl.BlockSpec((tb, tig * g), lambda o, bt, r, li, _f=off: (bt, r + _f)),
                pl.BlockSpec((1, 1, tn), lambda o, bt, r, li: (li[0], 0, o)),
            ],
            out_specs=pl.BlockSpec((tb, tn), lambda o, bt, r, li: (bt, o)),
            scratch_shapes=[
                pltpu.VMEM((tb, tn), jnp.float32),
                pltpu.VMEM((tig, g, tn), jnp.float32),
                pltpu.VMEM(
                    ((skig // kk) * g if amortize else 8, tn), jnp.bfloat16
                ),
            ],
        )
        part = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, nt * tn), out_dtype),
            interpret=interpret,
        )(layer_idx.reshape(1), codes_tl_all, lo, hi, xb, sc)
        y = part if y is None else y + part
    return y.astype(xb.dtype)


def gather_prefill_matmul_indexed(
    x, codes_tl_all, codebooks_all, scales_all, layer_idx, bias_all=None, *, group: int
):
    """Layer-indexed gather-prefill over stacked serving params.

    codes_tl_all: [L, NT, K*IG, tn] uint8; codebooks_all: [L, K, S<=256, g];
    scales_all: [L, OUT]; layer_idx: scalar int. The tiny codebooks are
    sliced outside; codes and scales are indexed inside the kernel."""
    lead = x.shape[:-1]
    xb, b_orig = _pad_batch(x.reshape(-1, x.shape[-1]))
    li = jnp.asarray(layer_idx, jnp.int32)
    cbs = jax.lax.dynamic_index_in_dim(codebooks_all, li, 0, keepdims=False)
    lo, hi, two = _tables(cbs)
    y = _call_indexed(
        xb, codes_tl_all, lo, hi, scales_all, li, group=group, two_halves=two,
        interpret=should_interpret(),
    )[:b_orig]
    if bias_all is not None:
        bias = jax.lax.dynamic_index_in_dim(bias_all, li, 0, keepdims=False)
        y = (y.astype(jnp.float32) + bias[None, :]).astype(y.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# grouped (fused-projection) + layer-indexed
# ---------------------------------------------------------------------------


def _kernel_grouped(idx_ref, pt_ref, codes_ref, lo_ref, hi_ref, x_ref, sc_ref,
                    out_ref, acc_ref, wt_ref, wtf_ref, *, tig, kk, g, tn,
                    two_halves, wrap_ok=False, amortize=False):
    del idx_ref, pt_ref
    r = pl.program_id(2)
    wt = _dequant_or_reuse(codes_ref[0, 0], lo_ref[0], hi_ref[0], wt_ref,
                           wtf_ref, tig=tig, kk=kk, g=g, tn=tn,
                           two_halves=two_halves, wrap_ok=wrap_ok,
                           amortize=amortize)
    _accum_body(wt, x_ref, sc_ref, out_ref, acc_ref, first_r=r == 0,
                last_r=r == pl.num_programs(2) - 1)


@functools.partial(jax.jit, static_argnames=("group", "two_halves", "interpret"))
def _call_grouped(xb, codes_tl_all, lo_p, hi_p, scales_all, proj_map, layer_idx,
                  *, group, two_halves, interpret):
    """lo_p/hi_p: [P, g, K, 128] per-projection tables; each out-tile reads
    ITS projection's tables via the prefetch proj-map (decode counterpart:
    lut_gemv._call_grouped)."""
    L, nt, kig, tn = codes_tl_all.shape
    P, g, kk = lo_p.shape[0], lo_p.shape[1], lo_p.shape[2]
    b = xb.shape[0]
    tb = _batch_tile(b)
    slabs, amortize = _slab_split(kig, kk, g, tn, b // tb)
    sc = scales_all.reshape(L, 1, -1).astype(jnp.float32)
    out_dtype = jnp.float32 if len(slabs) > 1 else xb.dtype

    y = None
    for s0, s1 in slabs:
        skig = s1 - s0
        kr = _row_tile(skig, kk, g, tn)
        tig = kr // kk
        off = s0 // kr  # slab offset in row-block units
        kern = functools.partial(
            _kernel_grouped, tig=tig, kk=kk, g=g, tn=tn, two_halves=two_halves,
            wrap_ok=not interpret and gather_wraps(), amortize=amortize,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, b // tb, skig // kr),
            in_specs=[
                pl.BlockSpec((1, 1, kr, tn), lambda o, bt, r, li, pt, _f=off: (li[0], o, r + _f, 0)),
                pl.BlockSpec((1, g, kk, 128), lambda o, bt, r, li, pt: (pt[o], 0, 0, 0)),
                pl.BlockSpec((1, g, kk, 128), lambda o, bt, r, li, pt: (pt[o], 0, 0, 0)),
                pl.BlockSpec((tb, tig * g), lambda o, bt, r, li, pt, _f=off: (bt, r + _f)),
                pl.BlockSpec((1, 1, tn), lambda o, bt, r, li, pt: (li[0], 0, o)),
            ],
            out_specs=pl.BlockSpec((tb, tn), lambda o, bt, r, li, pt: (bt, o)),
            scratch_shapes=[
                pltpu.VMEM((tb, tn), jnp.float32),
                pltpu.VMEM((tig, g, tn), jnp.float32),
                pltpu.VMEM(
                    ((skig // kk) * g if amortize else 8, tn), jnp.bfloat16
                ),
            ],
        )
        part = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, nt * tn), out_dtype),
            interpret=interpret,
        )(layer_idx.reshape(1), proj_map, codes_tl_all, lo_p, hi_p, xb, sc)
        y = part if y is None else y + part
    return y.astype(xb.dtype)


def gather_prefill_matmul_grouped_indexed(
    x, codes_tl_all, codebooks_all, scales_all, out_sizes, layer_idx, *, group: int
):
    """Fused-projection gather-prefill over stacked layers (prefill
    counterpart of lut_gemv_kx8_grouped_indexed — one launch for qkv or
    gate+up, reading the shard-interleaved tiled codes in place).

    codes_tl_all: [L, NT_total, K*IG, tn]; codebooks_all: [L, P, K, S, g];
    scales_all: [L, OUT_total]; out_sizes: static per-projection widths."""
    lead = x.shape[:-1]
    xb, b_orig = _pad_batch(x.reshape(-1, x.shape[-1]))
    L, nt_total, kig, tn = codes_tl_all.shape
    P, S = codebooks_all.shape[1], codebooks_all.shape[3]
    assert S <= 256 and P == len(out_sizes) and sum(out_sizes) == nt_total * tn
    assert all(sz % tn == 0 for sz in out_sizes), (out_sizes, tn)
    li = jnp.asarray(layer_idx, jnp.int32)
    cbs = jax.lax.dynamic_index_in_dim(codebooks_all, li, 0, keepdims=False)  # [P,K,S,g]
    parts = [_tables(cbs[p]) for p in range(P)]
    lo_p = jnp.stack([p[0] for p in parts])  # [P, g, K, 128]
    hi_p = jnp.stack([p[1] for p in parts])
    two = parts[0][2]

    pm = []
    for p, sz in enumerate(out_sizes):
        pm += [p] * (sz // tn)
    proj_map = jnp.asarray(pm, jnp.int32)

    y = _call_grouped(
        xb, codes_tl_all, lo_p, hi_p, scales_all, proj_map, li,
        group=group, two_halves=two, interpret=should_interpret(),
    )[:b_orig]
    return y.reshape(*lead, -1)
