"""Runtime weight formats and the quantized-matmul dispatcher.

TPU analogue of the reference's kernel selector
(/root/reference/inference_lib/src/aqlm/inference_kernels/kernel_selector.py:21-163),
but the dispatch key is a *runtime mode* chosen per deployment rather than a
device/dtype table, reflecting the v5e findings in NOTES.md:

- "codes": codes resident in HBM (max compression). nbits<=8 -> Pallas
  one-hot MXU kernel; nbits in (8,16] -> wide-row gather path.
- "int8":  AQLM weights transcoded to int8 + per-channel scale at load
  (speed mode; requant error is ~0.1% of weight scale, far below the
  quantization error itself).
- "reference": pure-jnp dequant + matmul, differentiable (calibration/tests).

All modes share one entry point, `quantized_matmul(x, qlin)`, wrapped in a
custom_vjp that backpropagates to activations only (serving/PEFT use; the
calibration paths differentiate through the reference dequant directly).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops import gather16, kernels
from aqlm_tpu.ops.dequant import AqlmWeight, aqlm_matmul_reference, dequantize_weight
from aqlm_tpu.ops.int8_matmul import (
    int8_matmul,
    int8_matmul_indexed,
    int8_matmul_transposed,
    pad_in_features,
)
from aqlm_tpu.ops.lut_gemv import (
    LUT_GEMV_MAX_BATCH,
    lut_gemv_kx8,
    lut_gemv_kx8_indexed,
    lut_gemv_kx8_tiled,
    tile_codes,
    untile_codes,
)

__all__ = [
    "QuantizedLinear",
    "IndexedQuantizedLinear",
    "quantized_matmul",
    "quantized_matmul_indexed",
    "MODES",
]

MODES = ("codes", "int8", "int4", "reference")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "codes_t", "codebooks", "packed_cb", "w8", "w8_scale", "scales", "bias", "codes_tl", "w4", "w4_gscale"],
    meta_fields=["scheme", "mode"],
)
@dataclasses.dataclass
class QuantizedLinear:
    """Device-ready quantized linear weight (one of four runtime layouts).

    Fields are None when unused by the mode:
      codes     [OUT/ogs, IG, K]  (reference mode + 16-bit codes mode)
      codes_t   [K, IG, OUT]      (codes mode, nbits<=8, transposed layout)
      codebooks [K, S, ogs, igs]  (reference) / [K, S, igs] (codes mode)
      packed_cb [S*igs/128, 128]  (codes mode, 16-bit)
      w8        [OUT, IN_padded] int8 (int8 mode; IN padded per
                  ops/int8_matmul.pad_in_features for contiguous DMA rows)
      w8_scale  [OUT] f32         (int8 mode, combined with scales)
      w4        [OUT, INpad/2] uint8 (int4 mode; nibble packing per
                  ops/int4_matmul)
      w4_gscale [INpad/G, OUT] f32 (int4 per-group scales, transposed)
      scales    [OUT]
      bias      [OUT] or None
    """

    codes: jax.Array | None
    codes_t: jax.Array | None
    codebooks: jax.Array | None
    packed_cb: jax.Array | None
    w8: jax.Array | None
    w8_scale: jax.Array | None
    scales: jax.Array
    bias: jax.Array | None
    scheme: AqlmScheme
    mode: str
    # decode layout: [NT, K*IG, tn] contiguous tiles (lut_gemv.tile_codes);
    # set instead of codes_t for nbits<=8 codes mode with 128-aligned OUT
    codes_tl: jax.Array | None = None
    w4: jax.Array | None = None
    w4_gscale: jax.Array | None = None

    @property
    def out_features(self) -> int:
        if self.w8 is not None:
            return self.w8.shape[0]
        if self.w4 is not None:
            return self.w4.shape[0]
        if self.codes_tl is not None:
            return self.codes_tl.shape[0] * self.codes_tl.shape[2]
        if self.codes_t is not None:
            return self.codes_t.shape[2]
        return self.codes.shape[0] * self.scheme.out_group_size

    @property
    def in_features(self) -> int:
        if self.w8 is not None:
            return self.w8.shape[1]  # note: padded (pad_in_features)
        if self.w4 is not None:
            return self.w4.shape[1] * 2  # note: padded (pad_in_features_int4)
        if self.codes_tl is not None:
            k = self.scheme.num_codebooks
            return self.codes_tl.shape[1] // k * self.scheme.in_group_size
        if self.codes_t is not None:
            return self.codes_t.shape[1] * self.scheme.in_group_size
        return self.codes.shape[1] * self.scheme.in_group_size

    # -- construction -------------------------------------------------------

    @staticmethod
    def from_aqlm(w: AqlmWeight, mode: str = "codes") -> "QuantizedLinear":
        """Load-time transform of the canonical representation into a runtime layout."""
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        scheme = w.scheme
        scales = w.scales.astype(jnp.float32)  # [OG] or [OG, IG] (scale_nbits>0)
        bias = w.bias
        none = dict(codes=None, codes_t=None, codebooks=None, packed_cb=None, w8=None, w8_scale=None)

        if mode == "reference":
            return QuantizedLinear(
                **{**none, "codes": w.codes, "codebooks": w.codebooks},
                scales=scales, bias=bias, scheme=scheme, mode=mode,
            )

        if mode == "int8":
            dense = dequantize_weight(w, dtype=jnp.float32)  # [OUT, IN]
            amax = jnp.max(jnp.abs(dense), axis=1, keepdims=True)
            w8_scale = (amax / 127.0).reshape(-1)
            w8 = jnp.round(dense / jnp.maximum(amax, 1e-12) * 127.0).astype(jnp.int8)
            in_pad = pad_in_features(w8.shape[1])
            if in_pad != w8.shape[1]:
                w8 = jnp.pad(w8, ((0, 0), (0, in_pad - w8.shape[1])))
            return QuantizedLinear(
                **{**none, "w8": w8, "w8_scale": w8_scale.astype(jnp.float32)},
                scales=jnp.ones_like(scales), bias=bias, scheme=scheme, mode=mode,
            )

        if mode == "int4":
            # half the resident bytes of int8 (~4.25 bits/weight incl. the
            # per-128-col group scales that 4-bit precision requires)
            from aqlm_tpu.ops.int4_matmul import quantize_int4

            dense = dequantize_weight(w, dtype=jnp.float32)
            w4, gscale = quantize_int4(dense)
            return QuantizedLinear(
                **none, scales=jnp.ones_like(scales), bias=bias, scheme=scheme,
                mode=mode, w4=w4, w4_gscale=gscale,
            )

        # codes mode
        if scheme.out_group_size != 1:
            raise NotImplementedError("codes mode requires out_group_size == 1")
        if scales.ndim != 1:
            raise NotImplementedError(
                "codes mode applies scales in the per-out-channel epilogue; "
                "per-group scales (scale_nbits>0) need the int8 or reference mode"
            )
        if scheme.nbits_per_codebook <= 8:
            codes_t = w.codes.astype(jnp.int32).transpose(2, 1, 0).astype(jnp.uint8)
            cb = w.codebooks[:, :, 0, :]  # [K, S, igs]
            if codes_t.shape[2] % 128 == 0:
                # decode-ready tiled layout (contiguous DMA blocks)
                return QuantizedLinear(
                    **{**none, "codebooks": cb.astype(jnp.bfloat16)},
                    scales=scales, bias=bias, scheme=scheme, mode=mode,
                    codes_tl=tile_codes(codes_t),
                )
            return QuantizedLinear(
                **{**none, "codes_t": codes_t, "codebooks": cb.astype(jnp.bfloat16)},
                scales=scales, bias=bias, scheme=scheme, mode=mode,
            )
        if scheme.num_codebooks != 1:
            raise NotImplementedError("16-bit codes mode supports a single codebook")
        packed = gather16.pack_codebook_rows(w.codebooks[0, :, 0, :], scheme.in_group_size)
        return QuantizedLinear(
            **{**none, "codes": w.codes[:, :, 0], "packed_cb": packed},
            scales=scales, bias=bias, scheme=scheme, mode=mode,
        )

    # -- compute ------------------------------------------------------------

    def dense_weight_t(self, dtype=jnp.bfloat16) -> jax.Array:
        """Materialize W^T [IN, OUT] (prefill two-step / tests)."""
        if self.mode == "int8":
            n_out = self.w8.shape[0]
            return (
                self.w8.T.astype(jnp.float32) * self.w8_scale[None, :]
            ).astype(dtype)
        if self.mode == "int4":
            from aqlm_tpu.ops.int4_matmul import dequantize_int4

            return dequantize_int4(self.w4, self.w4_gscale).T.astype(dtype)
        if self.mode == "codes":
            if self.scheme.nbits_per_codebook <= 8:
                if self.codes_tl is not None:
                    from aqlm_tpu.ops.gather_prefill import gather_dequant_wt

                    return gather_dequant_wt(
                        self.codes_tl, self.codebooks, self.scales, dtype=dtype
                    )
                return kernels.dequantize_onehot(
                    self.codes_t, self.codebooks, self.scales,
                    group=self.scheme.in_group_size, dtype=dtype,
                )
            return gather16.dequantize_gather16(
                self.codes, self.packed_cb, self.scales,
                group=self.scheme.in_group_size,
            ).T.astype(dtype)
        w = AqlmWeight(
            codes=self.codes, codebooks=self.codebooks,
            scales=self.scales, bias=None, scheme=self.scheme,
        )
        return dequantize_weight(w, dtype=dtype).T


def _serving_matmul_impl(x: jax.Array, q: QuantizedLinear) -> jax.Array:
    if q.mode == "int8":
        # Pallas kernel: int8 tiles convert to bf16 in VMEM. The naive
        # `x @ w8.astype(bf16)` materializes the converted weight in HBM
        # (5 bytes moved per weight instead of 1 — 5x slower decode).
        return int8_matmul(x, q.w8, q.w8_scale, q.bias)
    if q.mode == "int4":
        from aqlm_tpu.ops.int4_matmul import int4_matmul

        return int4_matmul(x, q.w4, q.w4_gscale, q.bias)
    # codes mode
    if q.scheme.nbits_per_codebook <= 8:
        batch = 1
        for dim in x.shape[:-1]:
            batch *= dim
        if batch <= LUT_GEMV_MAX_BATCH and q.codes_tl is not None:
            # decode: gather-bound LUT-GEMM (one lane gather per code) over
            # the contiguous tiled codes; sub-128 out_features (tiny tests)
            # have no tiled layout and take the one-hot path
            return lut_gemv_kx8_tiled(
                x, q.codes_tl, q.codebooks, q.scales, q.bias,
                group=q.scheme.in_group_size,
            )
        if q.codes_tl is not None:
            # prefill: gather-dequant + MXU over the tiled codes in place
            # (the one-hot kernel's compare-built one-hot is ~13G VPU ops per
            # 7B layer — the r3 27x prefill gap; ops/gather_prefill.py)
            from aqlm_tpu.ops.gather_prefill import gather_prefill_matmul

            return gather_prefill_matmul(
                x, q.codes_tl, q.codebooks, q.scales, q.bias,
                group=q.scheme.in_group_size,
            )
        # sub-128-OUT tiny shapes: one-hot MXU dequant
        return kernels.fused_onehot_matmul(
            x, q.codes_t, q.codebooks, q.scales, q.bias,
            group=q.scheme.in_group_size,
        )
    return gather16.gather_matmul_16(
        x, q.codes, q.packed_cb, q.scales, q.bias, group=q.scheme.in_group_size
    )


def _zero_cotangent(q: QuantizedLinear):
    """Zero cotangents for the frozen quantized weight (ints get float0)."""
    import numpy as np

    from jax import dtypes

    def zero(a):
        if a is None:
            return None
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, dtypes.float0)

    return jax.tree.map(zero, q, is_leaf=lambda v: v is None)


@jax.custom_vjp
def _serving_matmul(x: jax.Array, q: QuantizedLinear) -> jax.Array:
    return _serving_matmul_impl(x, q)


def _serving_matmul_fwd(x, q):
    return _serving_matmul_impl(x, q), (q, x.shape[-1])


def _serving_matmul_bwd(res, g):
    """Backward w.r.t. activations only — the weights are frozen serving
    layouts (reference autograd wrapper, inference.py:99-142; transposed
    CUDA ops, kernel_selector.py:105-163)."""
    q, in_features = res
    if q.mode == "int8":
        dx = int8_matmul_transposed(g, q.w8, q.w8_scale)[..., :in_features]
    else:
        # codes / int4: dequantized-weight einsum (int4's W^T is padded along
        # IN, so slice back to the caller's width)
        wt = q.dense_weight_t(dtype=jnp.bfloat16)  # [IN(pad), OUT]
        dx = jnp.einsum(
            "...o,io->...i", g.astype(jnp.bfloat16), wt, preferred_element_type=jnp.float32
        )[..., :in_features]
    return dx.astype(g.dtype), _zero_cotangent(q)


_serving_matmul.defvjp(_serving_matmul_fwd, _serving_matmul_bwd)


def quantized_matmul(x: jax.Array, q: QuantizedLinear) -> jax.Array:
    """y = x @ W_q^T + b through the runtime-mode kernel.

    "reference" mode is natively differentiable end-to-end (codebooks/scales
    get gradients — the calibration path). "codes"/"int8" serving layouts
    carry a custom VJP that backpropagates to the activations through the
    transposed kernels (weights receive zero cotangents) — enough for PEFT /
    2-bit-backbone training, like the reference's autograd-wrapped kernels.
    """
    if q.mode == "reference":
        w = AqlmWeight(
            codes=q.codes, codebooks=q.codebooks, scales=q.scales,
            bias=q.bias, scheme=q.scheme,
        )
        return aqlm_matmul_reference(x, w)
    return _serving_matmul(x, q)


# ---------------------------------------------------------------------------
# layer-indexed access for scan-over-layers serving
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["stacked", "idx"],
    meta_fields=[],
)
@dataclasses.dataclass
class IndexedQuantizedLinear:
    """A view of one layer inside a stacked (leading L axis) QuantizedLinear.

    Exists so the serving scan can hand the Pallas kernels the FULL stacked
    weight plus a layer index: `lax.scan`-sliced operands feeding an opaque
    pallas_call materialize an HBM copy of the layer first; index maps read
    in place (see ops/int8_matmul.py:_call_indexed).
    """

    stacked: QuantizedLinear
    idx: jax.Array


def _slice_layer(q: QuantizedLinear, idx) -> QuantizedLinear:
    pick = lambda a: None if a is None else jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)
    return QuantizedLinear(
        codes=pick(q.codes), codes_t=pick(q.codes_t), codebooks=pick(q.codebooks),
        packed_cb=pick(q.packed_cb), w8=pick(q.w8), w8_scale=pick(q.w8_scale),
        scales=pick(q.scales), bias=pick(q.bias), scheme=q.scheme, mode=q.mode,
        codes_tl=pick(q.codes_tl), w4=pick(q.w4), w4_gscale=pick(q.w4_gscale),
    )


def quantized_matmul_indexed(x: jax.Array, iq: IndexedQuantizedLinear) -> jax.Array:
    q = iq.stacked
    if q.mode == "int8":
        return int8_matmul_indexed(x, q.w8, q.w8_scale, iq.idx, q.bias)
    if q.mode == "int4":
        from aqlm_tpu.ops.int4_matmul import int4_matmul_indexed

        return int4_matmul_indexed(x, q.w4, q.w4_gscale, iq.idx, q.bias)
    if q.mode == "codes" and q.scheme.nbits_per_codebook <= 8:
        batch = 1
        for dim in x.shape[:-1]:
            batch *= dim
        if batch <= LUT_GEMV_MAX_BATCH and q.codes_tl is not None:
            # decode: scalar-prefetch indexed LUT-GEMM — reads the layer's
            # codes in place (the dynamic_index_in_dim fallback below copies
            # them to HBM first, measured ~107 us/layer on 7B widths)
            return lut_gemv_kx8_indexed(
                x, q.codes_tl, q.codebooks, q.scales, iq.idx, q.bias,
                group=q.scheme.in_group_size,
            )
        if q.codes_tl is not None:
            # prefill: gather-dequant + MXU, layer-indexed via scalar
            # prefetch (no HBM copy of the layer's codes, no untile)
            from aqlm_tpu.ops.gather_prefill import gather_prefill_matmul_indexed

            return gather_prefill_matmul_indexed(
                x, q.codes_tl, q.codebooks, q.scales, iq.idx, q.bias,
                group=q.scheme.in_group_size,
            )
    # remaining cases (tiny one-hot, 16-bit codes): slice the layer out —
    # the copy amortizes over many tokens or is small relative to gather16
    return quantized_matmul(x, _slice_layer(q, iq.idx))



# ---------------------------------------------------------------------------
# fused-projection codes-mode container (decode: one launch for qkv/gate+up)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FusedCodesLinear:
    """Fused-projection codes-mode weight for stacked decode serving.

    codes_tl: [NT_total, K*IG, tn] — the parts' TILED codes concatenated
    along the tile axis (gains a leading L axis after stack_layer_params);
    codebooks: [P, K, S, g] per-projection; scales: [OUT_total]. Decode runs
    lut_gemv_kx8_grouped_indexed (each out-tile gathers from its own
    projection's LUT via a prefetch proj-map); prefill splits the
    projections back out and runs the one-hot kernels.
    """

    codes_tl: jax.Array
    codebooks: jax.Array
    scales: jax.Array
    out_sizes: tuple
    scheme: AqlmScheme


jax.tree_util.register_dataclass(
    FusedCodesLinear,
    data_fields=["codes_tl", "codebooks", "scales"],
    meta_fields=["out_sizes", "scheme"],
)


@dataclasses.dataclass
class IndexedFusedCodesLinear:
    """One layer's view of an L-stacked FusedCodesLinear (scan serving)."""

    stacked: FusedCodesLinear
    idx: jax.Array


jax.tree_util.register_dataclass(
    IndexedFusedCodesLinear, data_fields=["stacked", "idx"], meta_fields=[]
)


def fused_codes_matmul_indexed(x: jax.Array, iq: IndexedFusedCodesLinear) -> jax.Array:
    from aqlm_tpu.ops.lut_gemv import lut_gemv_kx8_grouped_indexed

    f = iq.stacked
    batch = 1
    for dim in x.shape[:-1]:
        batch *= dim
    if batch <= LUT_GEMV_MAX_BATCH:
        return lut_gemv_kx8_grouped_indexed(
            x, f.codes_tl, f.codebooks, f.scales, f.out_sizes, iq.idx,
            group=f.scheme.in_group_size,
        )
    # prefill: grouped gather-dequant + MXU — one launch for the fused
    # projections, reading the shard-interleaved tiled codes in place
    from aqlm_tpu.ops.gather_prefill import gather_prefill_matmul_grouped_indexed

    return gather_prefill_matmul_grouped_indexed(
        x, f.codes_tl, f.codebooks, f.scales, f.out_sizes, iq.idx,
        group=f.scheme.in_group_size,
    )
