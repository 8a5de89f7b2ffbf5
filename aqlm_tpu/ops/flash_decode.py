"""Flash-decode attention: single-token GQA attention over an (optionally
int8) head-major KV cache, online-softmax tiled over sequence.

The XLA path must materialize the dequantized cache in HBM every step
(int8 -> bf16 write + read triples the cache traffic); this kernel streams
int8 KV tiles into VMEM, dequantizes in-register, and keeps the flash
(m, l, acc) state in scratch — each cache byte is read exactly once.
Patterned after the paged-attention kernels in
jax.experimental.pallas.ops.tpu (see the guide's quantized variant); pages
are not needed here because the cache is a dense preallocated ring.

Layouts: q [B, Hkv, rep, D]; k/v [B, Hkv, S, D] (int8 or bf16);
scales [B, Hkv, S, 1] f32 or None; lengths [B] i32 (attend to keys < length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import should_interpret

__all__ = ["flash_decode_attention"]

NEG_INF = -1e30


def _window_start_tile(length, *, ts, window, nt_full, n_tiles):
    """First seq-tile the windowed grid visits for a row with `length` valid
    keys: the tile containing key length - window, clamped so the n_tiles
    visited tiles stay in bounds. Shared by the BlockSpec index maps and the
    in-kernel key_pos reconstruction (they MUST agree)."""
    start = jnp.maximum(length - window, 0) // ts
    return jnp.clip(start, 0, nt_full - n_tiles)


def _kernel(lengths_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref, *, ts, scale, quantized, compute_dtype, window, nt_full, n_tiles):
    b = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(compute_dtype)  # [rep, D]
    k = k_ref[0, 0]  # [ts, D] int8/bf16
    v = v_ref[0, 0]
    if quantized:
        k = k.astype(compute_dtype) * ks_ref[0, 0].astype(compute_dtype)  # [ts, 1] scale
        v = v.astype(compute_dtype) * vs_ref[0, 0].astype(compute_dtype)
    else:
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [rep, ts]

    length = lengths_ref[b]
    tile = s
    if window is not None and n_tiles < nt_full:
        # windowed grid skip: grid step s visits tile start + s (the index
        # maps fetched that block), so reconstruct the true key positions
        tile = _window_start_tile(
            length, ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        ) + s
    key_pos = tile * ts + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = key_pos < length
    if window is not None:
        # sliding window: the (single) query sits at length - 1 and may only
        # see keys in (q - window, q] (make_causal_mask's convention)
        valid &= key_pos >= length - window
    logits = jnp.where(valid, logits, NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)  # [rep, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)  # [rep, ts]
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "ts", "window"))
def _call(q, k, v, k_scale, v_scale, lengths, *, scale, interpret, ts=512, window=None):
    b, hkv, rep, d = q.shape
    s_len = k.shape[2]
    ts = min(ts, s_len)
    assert s_len % ts == 0, (s_len, ts)
    quantized = k.dtype == jnp.int8
    nt_full = s_len // ts
    # windowed grid skip: only ceil(window/ts) + 1 tiles can intersect the
    # window, so a binding window visits (and DMAs) just those — the rest of
    # the cache is never read
    n_tiles = nt_full
    if window is not None and window < s_len:
        n_tiles = min(nt_full, -(-window // ts) + 1)
    grid = (b, hkv, n_tiles)

    def stile(L, bi):
        return _window_start_tile(
            L[bi], ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        )

    if n_tiles < nt_full:
        seq_ix = lambda bi, h, si, L: (bi, h, stile(L, bi) + si, 0)
    else:
        seq_ix = lambda bi, h, si, L: (bi, h, si, 0)

    # CPU interpret mode lacks bf16xbf16->f32 dots; TPU uses bf16 on the MXU
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    kern = functools.partial(
        _kernel, ts=ts, scale=scale, quantized=quantized, compute_dtype=compute_dtype,
        window=window, nt_full=nt_full, n_tiles=n_tiles,
    )
    if not quantized:
        # dummy tiny scale operands keep one kernel signature
        k_scale = jnp.zeros((b, hkv, s_len, 1), jnp.float32) if k_scale is None else k_scale
        v_scale = jnp.zeros((b, hkv, s_len, 1), jnp.float32) if v_scale is None else v_scale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, L: (bi, h, 0, 0)),
            pl.BlockSpec((1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, ts, 1), seq_ix),
            pl.BlockSpec((1, 1, ts, 1), seq_ix),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, L: (bi, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.bfloat16),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v, k_scale, v_scale)


def flash_decode_attention(
    q: jax.Array,  # [B, T=1, Hq, D]
    k_hm: jax.Array,  # [B, Hkv, S, D] int8 or float
    v_hm: jax.Array,
    k_scale,  # [B, Hkv, S, 1] f32 or None
    v_scale,
    lengths: jax.Array,  # [B] attend to key positions < lengths[b]
    *,
    scale: float | None = None,
    window: int | None = None,  # sliding window: keys in (q - window, q]
) -> jax.Array:
    """Returns attention output [B, 1, Hq, D] bf16."""
    b, t, hq, d = q.shape
    assert t == 1, "flash decode is the single-token path"
    hkv = k_hm.shape[1]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    q_hm = q.reshape(b, 1, hkv, rep, d)[:, 0].astype(jnp.bfloat16)  # [B, Hkv, rep, D]
    out = _call(
        q_hm, k_hm, v_hm, k_scale, v_scale, lengths,
        scale=scale, interpret=should_interpret(), window=window,
    )
    return out.reshape(b, 1, hq, d)


# ---------------------------------------------------------------------------
# fused write + attend: ONE launch per layer writes the new KV row and runs
# flash attention (replaces kv_write4_inplace/kv_write_inplace + the separate
# attention launch on the decode path)
# ---------------------------------------------------------------------------


def _kernel_idx_wattn(
    scalars_ref, q_ref, nk_ref, nv_ref, nks_ref, nvs_ref,
    k_ref, v_ref, ks_ref, vs_ref,
    out_ref, ok_ref, ov_ref, oks_ref, ovs_ref,
    m_ref, l_ref, acc_ref,
    *, ts, scale, quantized, compute_dtype, window, nt_full, n_tiles,
):
    """Fused decode step for layer scalars[0]: merge the new KV row for
    b = row scalars[1+b] IN REGISTER (attention is exact regardless of when
    the HBM write lands), write back only the 32-row cache window holding the
    row (out blocks are constant over the seq grid, flushed once per (b, h)),
    and run the online-softmax loop of _kernel_idx."""
    b = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    offset = scalars_ref[1 + b]
    length = offset + 1
    tile = s
    if window is not None and n_tiles < nt_full:
        tile = _window_start_tile(
            length, ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        ) + s

    # merge the new row into the loaded tile (storage dtype, pre-dequant)
    row_pos = tile * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0)
    sel = row_pos == offset  # all-false when the row is in another tile
    nk_row, nv_row = nk_ref[0, 0], nv_ref[0, 0]  # [1, D] storage dtype
    k_raw = jnp.where(sel, nk_row, k_ref[0, 0, 0])
    v_raw = jnp.where(sel, nv_row, v_ref[0, 0, 0])
    if quantized:
        ks_raw = jnp.where(sel, nks_ref[0, 0], ks_ref[0, 0, 0])
        vs_raw = jnp.where(sel, nvs_ref[0, 0], vs_ref[0, 0, 0])
        k = k_raw.astype(compute_dtype) * ks_raw.astype(compute_dtype)
        v = v_raw.astype(compute_dtype) * vs_raw.astype(compute_dtype)
    else:
        k = k_raw.astype(compute_dtype)
        v = v_raw.astype(compute_dtype)

    # write back the 32-row window around the row, once, at the tile that
    # holds it (the out index maps are constant over s, so the block is
    # flushed exactly once per (b, h)). The window's ORIGINAL rows come from
    # a dynamic-start ref read (the proven _write_kernel access pattern —
    # safer in Mosaic than dynamically slicing a loaded value) and the new
    # row is merged by vector select.
    @pl.when(tile == offset // ts)
    def _():
        # 32-aligned by construction; Mosaic needs the explicit assertion to
        # accept a dynamic sublane-dim start (vector.load alignment proof)
        wbase = pl.multiple_of(
            (offset // _WRITE_SB) * _WRITE_SB - tile * ts, _WRITE_SB
        )
        wsel = (
            jax.lax.broadcasted_iota(jnp.int32, (_WRITE_SB, 1), 0)
            == offset % _WRITE_SB
        )
        ok_ref[0, 0, 0] = jnp.where(wsel, nk_row, k_ref[0, 0, 0, pl.ds(wbase, _WRITE_SB)])
        ov_ref[0, 0, 0] = jnp.where(wsel, nv_row, v_ref[0, 0, 0, pl.ds(wbase, _WRITE_SB)])
        if quantized:
            oks_ref[0, 0, 0] = jnp.where(
                wsel, nks_ref[0, 0], ks_ref[0, 0, 0, pl.ds(wbase, _WRITE_SB)]
            )
            ovs_ref[0, 0, 0] = jnp.where(
                wsel, nvs_ref[0, 0], vs_ref[0, 0, 0, pl.ds(wbase, _WRITE_SB)]
            )

    q = q_ref[0, 0].astype(compute_dtype)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    key_pos = tile * ts + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = key_pos < length
    if window is not None:
        valid &= key_pos >= length - window  # (q - window, q], q = length - 1
    logits = jnp.where(valid, logits, NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_ref[:] = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "ts", "window"),
    donate_argnums=(5, 6, 7, 8),
)
def _call_idx_wattn(
    q, nk, nv, nks, nvs, k_all, v_all, ks_all, vs_all, scalars,
    *, scale, interpret, ts=512, window=None,
):
    b, hkv, rep, d = q.shape
    L, _, _, s_len, _ = k_all.shape
    ts = min(ts, s_len)
    assert s_len % ts == 0 and s_len % _WRITE_SB == 0
    quantized = k_all.dtype == jnp.int8
    nt_full = s_len // ts
    n_tiles = nt_full
    if window is not None and window < s_len:
        n_tiles = min(nt_full, -(-window // ts) + 1)  # windowed grid skip
    grid = (b, hkv, n_tiles)
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    kern = functools.partial(
        _kernel_idx_wattn, ts=ts, scale=scale, quantized=quantized,
        compute_dtype=compute_dtype, window=window, nt_full=nt_full, n_tiles=n_tiles,
    )
    if not quantized:  # dummy tiny operands keep one kernel signature
        nks = jnp.zeros((b, hkv, 1, 1), jnp.float32) if nks is None else nks
        nvs = jnp.zeros((b, hkv, 1, 1), jnp.float32) if nvs is None else nvs
        ks_all = jnp.zeros((L, b, hkv, s_len, 1), jnp.float32) if ks_all is None else ks_all
        vs_all = jnp.zeros((L, b, hkv, s_len, 1), jnp.float32) if vs_all is None else vs_all

    def stile(sc, bi):
        return _window_start_tile(
            sc[1 + bi] + 1, ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        )

    if n_tiles < nt_full:
        seq_ix = lambda bi, h, si, sc: (sc[0], bi, h, stile(sc, bi) + si, 0)
    else:
        seq_ix = lambda bi, h, si, sc: (sc[0], bi, h, si, 0)
    new_ix = lambda bi, h, si, sc: (bi, h, 0, 0)
    # write window: constant over the seq grid -> flushed once per (b, h)
    win_ix = lambda bi, h, si, sc: (sc[0], bi, h, sc[1 + bi] // _WRITE_SB, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, sc: (bi, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, d), new_ix),
            pl.BlockSpec((1, 1, 1, d), new_ix),
            pl.BlockSpec((1, 1, 1, 1), new_ix),
            pl.BlockSpec((1, 1, 1, 1), new_ix),
            pl.BlockSpec((1, 1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, 1), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, 1), seq_ix),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, sc: (bi, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, _WRITE_SB, d), win_ix),
            pl.BlockSpec((1, 1, 1, _WRITE_SB, d), win_ix),
            pl.BlockSpec((1, 1, 1, _WRITE_SB, 1), win_ix),
            pl.BlockSpec((1, 1, 1, _WRITE_SB, 1), win_ix),
        ],
        scratch_shapes=[
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, d), jnp.float32),
        ],
    )
    attn, k_out, v_out, ks_out, vs_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
            jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
            jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
        ],
        # scalars=0, q=1, nk..nvs=2..5, caches=6..9 -> outputs 1..4
        input_output_aliases={6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(scalars, q, nk, nv, nks, nvs, k_all, v_all, ks_all, vs_all)
    return attn, k_out, v_out, ks_out, vs_out


def flash_decode_write_attention_indexed(
    q,  # [B, 1, Hq, D]
    k_new, v_new,  # [B, 1, Hkv, D] storage dtype (int8 or cache float)
    k_all, v_all,  # [L, B, Hkv, S, D]
    ks_all, vs_all,  # [L, B, Hkv, S, 1] or None (with k_scale_new/v_scale_new)
    layer_idx, offsets,  # scalar layer, [B] write positions
    *,
    k_scale_new=None, v_scale_new=None,  # [B, 1, Hkv, 1]
    scale: float | None = None,
    window: int | None = None,
):
    """One launch per decode step: writes the new KV row (and scales) into
    the stacked cache at (layer_idx, b, :, offsets[b]) IN PLACE and returns
    flash attention over keys < offsets + 1. The row is merged in register,
    so attention sees it regardless of HBM write timing. Replaces the
    kv_write4_inplace/kv_write_inplace launches + flash_decode_attention
    _indexed pair (launch overhead was why short contexts preferred XLA).

    Returns (attn [B, 1, Hq, D] bf16, k_all, v_all, ks_all, vs_all).
    """
    b, t, hq, d = q.shape
    assert t == 1
    hkv = k_all.shape[2]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    q_hm = q.reshape(b, 1, hkv, rep, d)[:, 0].astype(jnp.bfloat16)
    hm = lambda a: None if a is None else jnp.moveaxis(a, 1, 2)  # [B,1,H,*] -> [B,H,1,*]
    scalars = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), offsets.astype(jnp.int32)]
    )
    attn, k_out, v_out, ks_out, vs_out = _call_idx_wattn(
        q_hm, hm(k_new).astype(k_all.dtype), hm(v_new).astype(v_all.dtype),
        None if k_scale_new is None else hm(k_scale_new).astype(jnp.float32),
        None if v_scale_new is None else hm(v_scale_new).astype(jnp.float32),
        k_all, v_all, ks_all, vs_all, scalars,
        scale=scale, interpret=should_interpret(), window=window,
    )
    if ks_all is None:
        ks_out = vs_out = None
    return attn.reshape(b, 1, hq, d), k_out, v_out, ks_out, vs_out


# ---------------------------------------------------------------------------
# in-place cache write (aliased pallas) — the companion of the indexed kernel
# ---------------------------------------------------------------------------


_WRITE_SB = 32  # S-dim block rows (Mosaic sublane tiling, int8-safe)


def _write_kernel(scalars_ref, new_ref, cache_ref, out_ref):
    """Read-modify-write one 32-row cache block: replace row offsets[b] % 32.

    A single-row block is not a legal Mosaic block shape; the merge is a
    static-store vector select instead."""
    b = pl.program_id(0)
    row = scalars_ref[1 + b] % _WRITE_SB
    block = cache_ref[0, 0, 0]  # [SB, D]
    sel = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0) == row
    out_ref[0, 0, 0] = jnp.where(sel, new_ref[0, 0, 0], block)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def _kv_write(cache_all, new, scalars, *, interpret):
    """Write new [B, H, 1, D] into cache_all [L, B, H, S, D] at
    (layer_idx, b, h, offsets[b]) IN PLACE via input/output aliasing.

    XLA's dynamic_update_slice on a scan carry stops aliasing at larger
    shapes and copies the whole cache per layer (measured 67 vs 18 ms/step
    at batch 8); an explicitly aliased pallas write cannot copy."""
    L, b, h, s, d = cache_all.shape
    assert s % _WRITE_SB == 0, s
    grid = (b, h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, d), lambda bi, hi, sc: (bi, hi, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, _WRITE_SB, d),
                lambda bi, hi, sc: (sc[0], bi, hi, sc[1 + bi] // _WRITE_SB, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, _WRITE_SB, d),
            lambda bi, hi, sc: (sc[0], bi, hi, sc[1 + bi] // _WRITE_SB, 0),
        ),
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache_all.shape, cache_all.dtype),
        input_output_aliases={2: 0},  # cache operand (scalars count too) -> output
        interpret=interpret,
    )(scalars, new, cache_all)


def kv_write_inplace(cache_all, new, layer_idx, offsets):
    """cache_all [L, B, H, S, D] <- new [B, H, T=1, D] at per-row offsets."""
    scalars = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), offsets.astype(jnp.int32)]
    )
    return _kv_write(cache_all, new.astype(cache_all.dtype), scalars, interpret=should_interpret())


def _write4_kernel(scalars_ref, nk_ref, nv_ref, nks_ref, nvs_ref,
                   k_ref, v_ref, ks_ref, vs_ref,
                   ok_ref, ov_ref, oks_ref, ovs_ref):
    b = pl.program_id(0)
    row = scalars_ref[1 + b] % _WRITE_SB

    def merge(new_ref, cache_ref, out_ref):
        block = cache_ref[0, 0, 0]
        sel = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0) == row
        out_ref[0, 0, 0] = jnp.where(sel, new_ref[0, 0, 0], block)

    merge(nk_ref, k_ref, ok_ref)
    merge(nv_ref, v_ref, ov_ref)
    merge(nks_ref, ks_ref, oks_ref)
    merge(nvs_ref, vs_ref, ovs_ref)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1, 2, 3))
def _kv_write4(k_all, v_all, ks_all, vs_all, nk, nv, nks, nvs, scalars, *, interpret):
    """One launch updating all four int8-cache arrays in place (k, v and
    their scale planes) — 4x fewer kernel launches per layer than separate
    kv_write_inplace calls (~0.6 ms/token on 32 layers at short contexts)."""
    L, b, h, s, d = k_all.shape
    assert s % _WRITE_SB == 0, s

    def blkspec(dd):
        return pl.BlockSpec(
            (1, 1, 1, _WRITE_SB, dd),
            lambda bi, hi, sc: (sc[0], bi, hi, sc[1 + bi] // _WRITE_SB, 0),
        )

    def newspec(dd):
        return pl.BlockSpec((1, 1, 1, dd), lambda bi, hi, sc: (bi, hi, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h),
        in_specs=[
            newspec(d), newspec(d), newspec(1), newspec(1),
            blkspec(d), blkspec(d), blkspec(1), blkspec(1),
        ],
        out_specs=[blkspec(d), blkspec(d), blkspec(1), blkspec(1)],
    )
    return pl.pallas_call(
        _write4_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
            jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
            jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
        ],
        # scalars is operand 0; news are 1-4; caches are 5-8
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(scalars, nk, nv, nks, nvs, k_all, v_all, ks_all, vs_all)


def kv_write4_inplace(k_all, v_all, ks_all, vs_all, nk, nv, nks, nvs, layer_idx, offsets):
    """Fused in-place write of (k, v, k_scale, v_scale) for one decode token."""
    scalars = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), offsets.astype(jnp.int32)]
    )
    return _kv_write4(
        k_all, v_all, ks_all, vs_all,
        nk.astype(k_all.dtype), nv.astype(v_all.dtype),
        nks.astype(ks_all.dtype), nvs.astype(vs_all.dtype),
        scalars, interpret=should_interpret(),
    )


# ---------------------------------------------------------------------------
# layer-indexed variant over the full stacked cache (scan-over-layers serving)
# ---------------------------------------------------------------------------


def _kernel_idx(scalars_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref, *, ts, scale, quantized, compute_dtype, window, nt_full, n_tiles):
    # scalars_ref = [layer_idx, length_0, ..., length_{B-1}]
    b = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(compute_dtype)
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    if quantized:
        k = k.astype(compute_dtype) * ks_ref[0, 0, 0].astype(compute_dtype)
        v = v.astype(compute_dtype) * vs_ref[0, 0, 0].astype(compute_dtype)
    else:
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    length = scalars_ref[1 + b]
    tile = s
    if window is not None and n_tiles < nt_full:
        tile = _window_start_tile(
            length, ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        ) + s
    key_pos = tile * ts + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = key_pos < length
    if window is not None:
        valid &= key_pos >= length - window  # (q - window, q], q = length - 1
    logits = jnp.where(valid, logits, NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_ref[:] = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "ts", "window"))
def _call_idx(q, k_all, v_all, ks_all, vs_all, scalars, *, scale, interpret, ts=512, window=None):
    b, hkv, rep, d = q.shape
    L, b2, hkv2, s_len, _ = k_all.shape
    ts = min(ts, s_len)
    assert s_len % ts == 0
    quantized = k_all.dtype == jnp.int8
    nt_full = s_len // ts
    n_tiles = nt_full
    if window is not None and window < s_len:
        n_tiles = min(nt_full, -(-window // ts) + 1)  # windowed grid skip
    grid = (b, hkv, n_tiles)
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    kern = functools.partial(
        _kernel_idx, ts=ts, scale=scale, quantized=quantized, compute_dtype=compute_dtype,
        window=window, nt_full=nt_full, n_tiles=n_tiles,
    )
    if not quantized:
        ks_all = jnp.zeros((L, b, hkv, s_len, 1), jnp.float32) if ks_all is None else ks_all
        vs_all = jnp.zeros((L, b, hkv, s_len, 1), jnp.float32) if vs_all is None else vs_all

    def stile(sc, bi):
        return _window_start_tile(
            sc[1 + bi], ts=ts, window=window, nt_full=nt_full, n_tiles=n_tiles
        )

    if n_tiles < nt_full:
        seq_ix = lambda bi, h, si, sc: (sc[0], bi, h, stile(sc, bi) + si, 0)
    else:
        seq_ix = lambda bi, h, si, sc: (sc[0], bi, h, si, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, sc: (bi, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, d), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, 1), seq_ix),
            pl.BlockSpec((1, 1, 1, ts, 1), seq_ix),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda bi, h, si, sc: (bi, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.bfloat16),
        interpret=interpret,
    )(scalars, q, k_all, v_all, ks_all, vs_all)


def flash_decode_attention_indexed(
    q: jax.Array,  # [B, 1, Hq, D]
    k_all: jax.Array,  # [L, B, Hkv, S, D]
    v_all: jax.Array,
    ks_all,  # [L, B, Hkv, S, 1] or None
    vs_all,
    layer_idx: jax.Array,  # scalar
    lengths: jax.Array,  # [B]
    *,
    scale: float | None = None,
    window: int | None = None,  # sliding window: keys in (q - window, q]
) -> jax.Array:
    """Flash decode reading layer `layer_idx` straight out of the stacked
    cache via scalar-prefetch index maps — no per-layer cache slice/copy
    (the reason the plain kernel loses inside lax.scan)."""
    b, t, hq, d = q.shape
    assert t == 1
    hkv = k_all.shape[2]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    q_hm = q.reshape(b, 1, hkv, rep, d)[:, 0].astype(jnp.bfloat16)
    scalars = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), lengths.astype(jnp.int32)]
    )
    out = _call_idx(
        q_hm, k_all, v_all, ks_all, vs_all, scalars,
        scale=scale, interpret=should_interpret(), window=window,
    )
    return out.reshape(b, 1, hq, d)
