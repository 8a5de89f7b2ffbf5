"""Pallas W8A16 matmul: int8 weights converted to bf16 in VMEM, not HBM.

The int8 serving mode's speed hinges on reading each weight byte from HBM
exactly once. XLA lowers `x @ w8.astype(bf16)` by MATERIALIZING the bf16
weight in HBM (read 1B + write 2B + read 2B per weight = 5 bytes moved per
1-byte weight — measured 41 ms/token on Llama-2-7B, 5x the bandwidth bound).
This kernel streams int8 tiles into VMEM, converts in-register, and feeds the
MXU directly: 1 byte moved per weight.

Counterpart of the reference's fp16 CUDA epilogue convention: per-out-channel
scale and bias are applied to the accumulator in the kernel epilogue
(cuda_kernel.cpp:95-111 does it host-side; here it fuses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.ops.kernels import should_interpret

__all__ = ["int8_matmul"]


def _tile(n: int, target: int, mult: int) -> int:
    """Largest divisor of n that is <= target and a multiple of `mult`;
    falls back to n (block == full dim is always legal in Mosaic)."""
    best = n
    t = min(target, n)
    for d in range(t - t % mult, 0, -mult):
        if n % d == 0:
            return d
    return best


IN_PAD_MULTIPLE = 1024  # weight rows padded so large tk tiles divide evenly


def pad_in_features(in_features: int) -> int:
    """Contraction-dim padding for the [OUT, IN] int8 layout.

    The kernel's DMA reads are contiguous along IN; awkward dims (11008 has no
    128-multiple divisor above 256) throttle HBM to ~400 GB/s, while padding
    to a 1024 multiple restores 700-950 GB/s for ~2% extra bytes.
    """
    if in_features <= IN_PAD_MULTIPLE:
        return in_features
    return -(-in_features // IN_PAD_MULTIPLE) * IN_PAD_MULTIPLE


def _kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref):
    """grid = (out_tiles, b_tiles, k_tiles); k innermost accumulates."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 in VMEM registers
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(x, w8, scale, *, interpret):
    b, in_features = x.shape
    out_features, in2 = w8.shape
    assert in2 == in_features, (w8.shape, x.shape)

    # Mosaic constraints: every block's last dim mult of 128; out tile also
    # feeds the output block's lane dim -> tn mult of 128 as well
    tn = _tile(out_features, 512, 128)
    tk = _tile(in_features, 2048, 128)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (out_features // tn, b // tb, in_features // tk)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tk), lambda o, bt, k: (bt, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda o, bt, k: (o, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda o, bt, k: (0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k: (bt, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=interpret,
    )(x, w8, scale.reshape(1, -1))


def _pad_x(xb: jax.Array, in_pad: int) -> jax.Array:
    if xb.shape[-1] == in_pad:
        return xb
    return jnp.pad(xb, ((0, 0), (0, in_pad - xb.shape[-1])))


def int8_matmul(x: jax.Array, w8: jax.Array, w_scale: jax.Array, bias=None) -> jax.Array:
    """y = (x @ w8[:, :IN].T) * w_scale + bias.

    x: [..., IN] bf16/f32; w8: [OUT, IN_padded] int8 (rows contiguous along
    the contraction dim; see pad_in_features); w_scale: [OUT] f32.
    """
    lead = x.shape[:-1]
    xb = _pad_x(x.reshape(-1, x.shape[-1]), w8.shape[1])
    y = _call(xb, w8, w_scale, interpret=should_interpret())
    if bias is not None:
        y = y + bias[None, :].astype(y.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# transposed (backward) kernel: dx = (g * scale) @ w8
# ---------------------------------------------------------------------------


def _kernel_t(g_ref, w_ref, out_ref, acc_ref):
    """grid = (in_tiles, b_tiles, o_tiles); o innermost accumulates."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)  # [to, tk]
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_t(g, w8, *, interpret):
    b, out_features = g.shape
    out2, in_features = w8.shape
    assert out2 == out_features

    tk = _tile(in_features, 512, 128)
    to = _tile(out_features, 2048, 128)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (in_features // tk, b // tb, out_features // to)

    return pl.pallas_call(
        _kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, to), lambda i, bt, o: (bt, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tk), lambda i, bt, o: (o, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tk), lambda i, bt, o: (bt, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, in_features), g.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tk), jnp.float32)],
        interpret=interpret,
    )(g, w8)


def int8_matmul_transposed(g: jax.Array, w8: jax.Array, w_scale: jax.Array) -> jax.Array:
    """dx = (g * w_scale) @ w8 — the backward of int8_matmul w.r.t. x.

    TPU analogue of the reference's transposed-dequant backward ops
    (cuda_kernel.cpp:303-354, kernel_selector.py:105-163). g: [..., OUT];
    returns [..., IN_padded] (caller slices to the true in_features).
    """
    lead = g.shape[:-1]
    gb = g.reshape(-1, g.shape[-1])
    gb = (gb.astype(jnp.float32) * w_scale[None, :]).astype(jnp.bfloat16)
    dx = _call_t(gb, w8, interpret=should_interpret())
    return dx.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# layer-indexed variant for scan-over-layers serving
# ---------------------------------------------------------------------------


def _kernel_indexed(idx_ref, x_ref, w_ref, scale_ref, out_ref, acc_ref):
    del idx_ref  # consumed by the index_maps

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)  # [tn, tk]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_indexed(x, w8_all, scale_all, layer_idx, *, interpret):
    """Like _call but weights come from stacked [L, IN, OUT] arrays and the
    layer is selected INSIDE the kernel via scalar-prefetch index maps.

    This is the load-bearing detail of scan-over-layers serving: a
    `lax.scan`-sliced operand feeding an opaque pallas_call materializes an
    HBM copy of the whole layer (measured +28 ms/token on Llama-2-7B);
    indexing in the BlockSpec reads each weight byte exactly once.
    """
    L, out_features, in_features = w8_all.shape
    b = x.shape[0]
    tn = _tile(out_features, 512, 128)
    tk = _tile(in_features, 2048, 128)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (out_features // tn, b // tb, in_features // tk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tk), lambda o, bt, k, li: (bt, k)),
            pl.BlockSpec((1, tn, tk), lambda o, bt, k, li: (li[0], o, k)),
            pl.BlockSpec((1, 1, tn), lambda o, bt, k, li: (li[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k, li: (bt, o)),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_indexed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        interpret=interpret,
    )(layer_idx.reshape(1), x, w8_all, scale_all.reshape(L, 1, out_features))


def int8_matmul_indexed(
    x: jax.Array, w8_all: jax.Array, scale_all: jax.Array, layer_idx: jax.Array, bias_all=None
) -> jax.Array:
    """y = (x @ w8_all[layer_idx].T) * scale_all[layer_idx] (+ bias_all[layer_idx]).

    w8_all: [L, OUT, IN_padded] int8; scale_all: [L, OUT]; layer_idx: scalar.
    """
    lead = x.shape[:-1]
    xb = _pad_x(x.reshape(-1, x.shape[-1]), w8_all.shape[2])
    y = _call_indexed(
        xb, w8_all, scale_all, jnp.asarray(layer_idx, jnp.int32), interpret=should_interpret()
    )
    if bias_all is not None:
        bias = jax.lax.dynamic_index_in_dim(bias_all, layer_idx, 0, keepdims=False)
        y = y + bias[None, :].astype(y.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# expert-stacked variant for MoE serving
# ---------------------------------------------------------------------------


def _kernel_moe(x_ref, w_ref, scale_ref, out_ref, acc_ref):
    """grid = (E, out_tiles, b_tiles, k_tiles); k innermost accumulates.
    x block may be shared across experts or per-expert (same kernel body —
    the difference is only in x's index_map)."""

    @pl.when(pl.program_id(3) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)  # [tn, tk]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[0], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = (acc_ref[:] * scale_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "x_per_expert"))
def _call_moe(x, w8_all, scale_all, *, x_per_expert, interpret):
    E, out_features, in_features = w8_all.shape
    b = x.shape[-2]
    tn = _tile(out_features, 512, 128)
    tk = _tile(in_features, 2048, 128)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (E, out_features // tn, b // tb, in_features // tk)

    if x_per_expert:
        x_spec = pl.BlockSpec((1, tb, tk), lambda e, o, bt, k: (e, bt, k))
    else:
        x_spec = pl.BlockSpec((1, tb, tk), lambda e, o, bt, k: (0, bt, k))
    return pl.pallas_call(
        _kernel_moe,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, tn, tk), lambda e, o, bt, k: (e, o, k)),
            pl.BlockSpec((1, 1, tn), lambda e, o, bt, k: (e, 0, o)),
        ],
        out_specs=pl.BlockSpec((1, tb, tn), lambda e, o, bt, k: (e, bt, o)),
        out_shape=jax.ShapeDtypeStruct((E, b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=interpret,
    )(x if x_per_expert else x[None] if x.ndim == 2 else x, w8_all, scale_all.reshape(E, 1, out_features))


def int8_moe_matmul(x, w8_all, scale_all):
    """All-experts int8 matmul: y[e] = x @ w8_all[e].T * scale_all[e].

    x: [N, IN] (shared across experts) or [E, N, IN] (per-expert inputs);
    w8_all: [E, OUT, IN_padded] int8. Returns [E, N, OUT]. This is the MoE
    serving dense-dispatch form: every token through every expert with
    static shapes (the combine weights zero out non-routed experts), one
    kernel launch for all E — replaces the per-expert python loop.
    """
    x_per_expert = x.ndim == 3
    pad = w8_all.shape[2]
    if x.shape[-1] != pad:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad - x.shape[-1])]
        x = jnp.pad(x, widths)
    return _call_moe(
        x, w8_all, scale_all, x_per_expert=x_per_expert, interpret=should_interpret()
    )


def _kernel_moe_indexed(idx_ref, x_ref, w_ref, scale_ref, out_ref, acc_ref):
    del idx_ref

    @pl.when(pl.program_id(3) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0, 0].astype(jnp.bfloat16)  # [tn, tk]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[0], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = (acc_ref[:] * scale_ref[0, 0].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "x_per_expert"))
def _call_moe_indexed(x, w8_all, scale_all, layer_idx, *, x_per_expert, interpret):
    """All-experts matmul with the LAYER picked inside the kernel
    (scalar-prefetch index maps over [L, E, OUT, IN] weights)."""
    L, E, out_features, in_features = w8_all.shape
    b = x.shape[-2]
    tn = _tile(out_features, 512, 128)
    tk = _tile(in_features, 2048, 128)
    tb = b if b < 8 else _tile(b, 256, 8)
    grid = (E, out_features // tn, b // tb, in_features // tk)

    if x_per_expert:
        x_spec = pl.BlockSpec((1, tb, tk), lambda e, o, bt, k, li: (e, bt, k))
    else:
        x_spec = pl.BlockSpec((1, tb, tk), lambda e, o, bt, k, li: (0, bt, k))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, 1, tn, tk), lambda e, o, bt, k, li: (li[0], e, o, k)),
            pl.BlockSpec((1, 1, 1, tn), lambda e, o, bt, k, li: (li[0], e, 0, o)),
        ],
        out_specs=pl.BlockSpec((1, tb, tn), lambda e, o, bt, k, li: (e, bt, o)),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel_moe_indexed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, b, out_features), x.dtype),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        x if x_per_expert else x[None],
        w8_all,
        scale_all.reshape(L, E, 1, out_features),
    )


def int8_moe_matmul_indexed(x, w8_all, scale_all, layer_idx):
    """y[e] = x @ w8_all[layer_idx, e].T * scale_all[layer_idx, e].

    Scan-over-layers MoE serving: w8_all [L, E, OUT, IN_padded], x [N, IN]
    (shared) or [E, N, IN] (per-expert). Returns [E, N, OUT]."""
    x_per_expert = x.ndim == 3
    pad = w8_all.shape[3]
    if x.shape[-1] != pad:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad - x.shape[-1])]
        x = jnp.pad(x, widths)
    return _call_moe_indexed(
        x, w8_all, scale_all, jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x_per_expert=x_per_expert, interpret=should_interpret(),
    )
