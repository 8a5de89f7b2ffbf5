"""Pallas W4A16 matmul: 4-bit weights with per-group scales, unpacked in VMEM.

The int8 serving mode reads 1 byte per weight; this mode halves that
(~4.25 bits resident including scales), halving the HBM floor of
bandwidth-bound decode. Per-128-column group scales keep the requantization
error small where per-channel int4 would not (int8's per-channel scale is
enough at 8 bits; at 4 bits group granularity is required).

Layout — BLOCK-LOCAL nibble packing:
  w4      [OUT, INpad/2] uint8. Within each 256-ORIGINAL-column block i,
          byte j packs column 256i + j (low nibble) and column 256i + 128 + j
          (high nibble): unpacking one 128-byte block yields original groups
          2i and 2i + 1 contiguously. Because every 256-column block is
          self-contained, any 256-aligned slice of the packed columns
          corresponds to the same contiguous slice of original columns —
          which is what row-parallel tensor sharding of the contraction dim
          requires (a global half-split packing would scatter each shard's
          columns).
  gscale  [INpad/G, OUT] f32 (TRANSPOSED: lane dim = OUT) — per-group scale,
          G = 128 original columns, groups in original column order.

Values are stored biased (q = round(w/s) + 8 in [0, 15]); the zero point
folds into the epilogue instead of a per-weight subtract:
    y = sum_g s_g * (x_g . w_raw_g - 8 * sum(x_g))
keeping the per-byte VPU budget at unpack + convert (a per-WEIGHT subtract
would land on the axis the kernel is op-bound on).

Same selector position as the reference's kernel dispatch
(/root/reference/inference_lib/src/aqlm/inference_kernels/kernel_selector.py)
— an additional runtime layout, picked per deployment in ops/runtime.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.int8_matmul import _tile, pad_in_features
from aqlm_tpu.ops.kernels import should_interpret

__all__ = [
    "GROUP",
    "pad_in_features_int4",
    "quantize_int4",
    "dequantize_int4",
    "int4_matmul",
    "int4_matmul_indexed",
]

GROUP = 128  # original columns per scale group (= one lane register)


def pad_in_features_int4(in_features: int) -> int:
    """int4 contraction padding: whole 256-column packing blocks, and large
    dims keep int8's 1024-multiple rule for contiguous DMA rows."""
    if in_features <= 1024:
        return -(-in_features // (2 * GROUP)) * (2 * GROUP)
    return pad_in_features(in_features)


# ---------------------------------------------------------------------------
# host-side (load-time) quantize / pack and the dequant oracle
# ---------------------------------------------------------------------------


CLIP_CANDIDATES = (1.0, 0.95, 0.9, 0.85, 0.8)


def quantize_int4(dense: jax.Array, mse_clip: bool = True) -> tuple[jax.Array, jax.Array]:
    """Per-group symmetric int4 quantization of a dense [OUT, IN] weight.

    mse_clip searches a few clip ratios per group and keeps the
    MSE-minimizing scale (clipping the tail trades rare large errors for a
    finer step on the bulk — worth ~10-20% RMS on bell-shaped weights, free
    at load time). Returns (w4 [OUT, INpad/2] uint8 block-local packed,
    gscale [INpad/G, OUT] f32)."""
    out_features, in_features = dense.shape
    in_pad = pad_in_features_int4(in_features)
    w = dense.astype(jnp.float32)
    if in_pad != in_features:
        w = jnp.pad(w, ((0, 0), (0, in_pad - in_features)))
    g = w.reshape(out_features, in_pad // GROUP, GROUP)
    amax = jnp.max(jnp.abs(g), axis=2)  # [OUT, G']

    def quant_err(scale):
        q = jnp.clip(jnp.round(g / scale[:, :, None]) + 8.0, 0, 15)
        err = jnp.sum(((q - 8.0) * scale[:, :, None] - g) ** 2, axis=2)
        return q, err

    scale = jnp.maximum(amax / 7.0, 1e-12)
    q, best_err = quant_err(scale)
    if mse_clip:
        for r in CLIP_CANDIDATES[1:]:
            s_c = jnp.maximum(r * amax / 7.0, 1e-12)
            q_c, err_c = quant_err(s_c)
            better = err_c < best_err
            scale = jnp.where(better, s_c, scale)
            q = jnp.where(better[:, :, None], q_c, q)
            best_err = jnp.minimum(err_c, best_err)
    q = q.astype(jnp.uint8)
    # block-local packing: groups (2i, 2i+1) -> byte block i
    q = q.reshape(out_features, in_pad // (2 * GROUP), 2, GROUP)
    w4 = (q[:, :, 0, :] | (q[:, :, 1, :] << 4)).reshape(out_features, in_pad // 2)
    return w4.astype(jnp.uint8), scale.T.astype(jnp.float32)  # [G', OUT]


def dequantize_int4(w4: jax.Array, gscale: jax.Array) -> jax.Array:
    """[OUT, INpad] f32 — the oracle the kernel is tested against."""
    out_features, half = w4.shape
    in_pad = half * 2
    w = w4.astype(jnp.int32).reshape(out_features, half // GROUP, 1, GROUP)
    q = jnp.concatenate([w & 15, w >> 4], axis=2).astype(jnp.float32) - 8.0
    q = q.reshape(out_features, in_pad // GROUP, GROUP)
    scale = gscale.T  # [OUT, G']
    return (q * scale[:, :, None]).reshape(out_features, in_pad)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _body(x, w_bytes, s_rows, acc_ref):
    """Shared inner loop: per 128-byte packing block (= two original
    128-column groups), unpack both nibbles, dot each against its x slice,
    and fold the zero point + group scale into the accumulator update.
    x [tb, 2*tkp], w_bytes [tn, tkp], s_rows [2*tkp/GROUP, tn] — values."""
    tkp = w_bytes.shape[1]
    xdt = x.dtype
    for gi in range(tkp // GROUP):
        wb = w_bytes[:, gi * GROUP : (gi + 1) * GROUP].astype(jnp.int32)
        for half_i, nib in ((0, wb & 15), (1, wb >> 4)):
            og = 2 * gi + half_i  # original group within this block
            xg = x[:, og * GROUP : (og + 1) * GROUP]  # [tb, 128]
            d = jax.lax.dot_general(
                xg, nib.astype(xdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [tb, tn]
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [tb, 1]
            acc_ref[:] += (d - 8.0 * xs) * s_rows[og][None, :].astype(jnp.float32)


def _kernel(x_ref, w_ref, s_ref, out_ref, acc_ref):
    """grid = (out_tiles, b_tiles, packed_k_tiles); k innermost accumulates."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _body(x_ref[:], w_ref[:], s_ref[:], acc_ref)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(x, w4, gscale, *, interpret):
    b, in_pad = x.shape
    out_features, half = w4.shape
    assert in_pad == 2 * half, (x.shape, w4.shape)
    assert gscale.shape == (in_pad // GROUP, out_features)

    tn = _tile(out_features, 512, 128)
    tkp = _tile(half, 1024, 128)  # packed bytes per block (= 2*tkp orig cols)
    # a non-GROUP-multiple block would silently skip trailing bytes (the
    # unpack loop strides whole 128-byte packing blocks) — sharded callers
    # must keep per-shard packed columns 128-aligned
    assert half % GROUP == 0 and tkp % GROUP == 0, (half, tkp)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (out_features // tn, b // tb, half // tkp)
    tg = 2 * tkp // GROUP  # scale rows per block

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, 2 * tkp), lambda o, bt, k: (bt, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tkp), lambda o, bt, k: (o, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, tn), lambda o, bt, k: (k, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k: (bt, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=interpret,
    )(x, w4, gscale)


def _pad_x(xb: jax.Array, in_pad: int) -> jax.Array:
    if xb.shape[-1] == in_pad:
        return xb
    return jnp.pad(xb, ((0, 0), (0, in_pad - xb.shape[-1])))


def int4_matmul(x: jax.Array, w4: jax.Array, gscale: jax.Array, bias=None) -> jax.Array:
    """y = x @ dequantize_int4(w4, gscale)[:, :IN].T + bias.

    x: [..., IN]; w4: [OUT, INpad/2] uint8 packed; gscale: [INpad/G, OUT]."""
    lead = x.shape[:-1]
    xb = _pad_x(x.reshape(-1, x.shape[-1]), w4.shape[1] * 2)
    y = _call(xb, w4, gscale, interpret=should_interpret())
    if bias is not None:
        y = y + bias[None, :].astype(y.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# layer-indexed variant for scan-over-layers serving
# ---------------------------------------------------------------------------


def _kernel_indexed(idx_ref, x_ref, w_ref, s_ref, out_ref, acc_ref):
    del idx_ref  # consumed by the index maps

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _body(x_ref[:], w_ref[0], s_ref[0], acc_ref)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_indexed(x, w4_all, gscale_all, layer_idx, *, interpret):
    L, out_features, half = w4_all.shape
    b, in_pad = x.shape
    assert in_pad == 2 * half
    tn = _tile(out_features, 512, 128)
    tkp = _tile(half, 1024, 128)
    assert half % GROUP == 0 and tkp % GROUP == 0, (half, tkp)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (out_features // tn, b // tb, half // tkp)
    tg = 2 * tkp // GROUP

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, 2 * tkp), lambda o, bt, k, li: (bt, k)),
            pl.BlockSpec((1, tn, tkp), lambda o, bt, k, li: (li[0], o, k)),
            pl.BlockSpec((1, tg, tn), lambda o, bt, k, li: (li[0], k, o)),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k, li: (bt, o)),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_indexed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        interpret=interpret,
    )(layer_idx.reshape(1), x, w4_all, gscale_all)


# ---------------------------------------------------------------------------
# expert-stacked variants for MoE serving (mirrors int8_matmul's MoE kernels)
# ---------------------------------------------------------------------------


def _kernel_moe(x_ref, w_ref, s_ref, out_ref, acc_ref):
    """grid = (E, out_tiles, b_tiles, packed_k_tiles); k innermost."""

    @pl.when(pl.program_id(3) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _body(x_ref[0], w_ref[0], s_ref[0], acc_ref)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "x_per_expert"))
def _call_moe(x, w4_all, gscale_all, *, x_per_expert, interpret):
    E, out_features, half = w4_all.shape
    b = x.shape[-2]
    tn = _tile(out_features, 512, 128)
    tkp = _tile(half, 1024, 128)
    assert half % GROUP == 0 and tkp % GROUP == 0, (half, tkp)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (E, out_features // tn, b // tb, half // tkp)
    tg = 2 * tkp // GROUP

    if x_per_expert:
        x_spec = pl.BlockSpec((1, tb, 2 * tkp), lambda e, o, bt, k: (e, bt, k))
    else:
        x_spec = pl.BlockSpec((1, tb, 2 * tkp), lambda e, o, bt, k: (0, bt, k))
    return pl.pallas_call(
        _kernel_moe,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, tn, tkp), lambda e, o, bt, k: (e, o, k)),
            pl.BlockSpec((1, tg, tn), lambda e, o, bt, k: (e, k, o)),
        ],
        out_specs=pl.BlockSpec((1, tb, tn), lambda e, o, bt, k: (e, bt, o)),
        out_shape=jax.ShapeDtypeStruct((E, b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=interpret,
    )(x if x_per_expert else x[None] if x.ndim == 2 else x, w4_all, gscale_all)


def int4_moe_matmul(x, w4_all, gscale_all):
    """All-experts int4 matmul: y[e] = x @ dequant(w4_all[e]).T.

    x: [N, IN] shared or [E, N, IN] per-expert; w4_all: [E, OUT, INpad/2];
    gscale_all: [E, INpad/G, OUT]. Returns [E, N, OUT]."""
    x_per_expert = x.ndim == 3
    in_pad = w4_all.shape[2] * 2
    if x.shape[-1] != in_pad:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, in_pad - x.shape[-1])]
        x = jnp.pad(x, widths)
    return _call_moe(
        x, w4_all, gscale_all, x_per_expert=x_per_expert, interpret=should_interpret()
    )


def _kernel_moe_indexed(idx_ref, x_ref, w_ref, s_ref, out_ref, acc_ref):
    del idx_ref

    @pl.when(pl.program_id(3) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _body(x_ref[0], w_ref[0, 0], s_ref[0, 0], acc_ref)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "x_per_expert"))
def _call_moe_indexed(x, w4_all, gscale_all, layer_idx, *, x_per_expert, interpret):
    L, E, out_features, half = w4_all.shape
    b = x.shape[-2]
    tn = _tile(out_features, 512, 128)
    tkp = _tile(half, 1024, 128)
    assert half % GROUP == 0 and tkp % GROUP == 0, (half, tkp)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (E, out_features // tn, b // tb, half // tkp)
    tg = 2 * tkp // GROUP

    if x_per_expert:
        x_spec = pl.BlockSpec((1, tb, 2 * tkp), lambda e, o, bt, k, li: (e, bt, k))
    else:
        x_spec = pl.BlockSpec((1, tb, 2 * tkp), lambda e, o, bt, k, li: (0, bt, k))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, 1, tn, tkp), lambda e, o, bt, k, li: (li[0], e, o, k)),
            pl.BlockSpec((1, 1, tg, tn), lambda e, o, bt, k, li: (li[0], e, k, o)),
        ],
        out_specs=pl.BlockSpec((1, tb, tn), lambda e, o, bt, k, li: (e, bt, o)),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_moe_indexed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, b, out_features), x.dtype),
        interpret=interpret,
    )(layer_idx.reshape(1), x if x_per_expert else x[None], w4_all, gscale_all)


def int4_moe_matmul_indexed(x, w4_all, gscale_all, layer_idx):
    """y[e] = x @ dequant(w4_all[layer_idx, e]).T — scan-over-layers MoE.

    w4_all: [L, E, OUT, INpad/2]; gscale_all: [L, E, INpad/G, OUT]."""
    x_per_expert = x.ndim == 3
    in_pad = w4_all.shape[3] * 2
    if x.shape[-1] != in_pad:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, in_pad - x.shape[-1])]
        x = jnp.pad(x, widths)
    return _call_moe_indexed(
        x, w4_all, gscale_all, jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x_per_expert=x_per_expert, interpret=should_interpret(),
    )


def int4_matmul_indexed(
    x: jax.Array, w4_all: jax.Array, gscale_all: jax.Array, layer_idx, bias_all=None
) -> jax.Array:
    """y = x @ dequant(w4_all[layer_idx]).T (+ bias_all[layer_idx]).

    w4_all: [L, OUT, INpad/2]; gscale_all: [L, INpad/G, OUT]; the layer's
    bytes are read in place via scalar-prefetch index maps (same rationale
    as int8_matmul_indexed)."""
    lead = x.shape[:-1]
    xb = _pad_x(x.reshape(-1, x.shape[-1]), w4_all.shape[2] * 2)
    y = _call_indexed(
        xb, w4_all, gscale_all, jnp.asarray(layer_idx, jnp.int32),
        interpret=should_interpret(),
    )
    if bias_all is not None:
        bias = jax.lax.dynamic_index_in_dim(bias_all, layer_idx, 0, keepdims=False)
        y = y + bias[None, :].astype(y.dtype)
    return y.reshape(*lead, -1)
