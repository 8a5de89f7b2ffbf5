"""Core AQLM representation and reference (pure-jnp) dequantization.

This is the TPU-native analogue of the reference's
``_dequantize_weight`` (/root/reference/src/utils.py:64-91, implemented there
with ``F.embedding_bag(mode="sum")``) and of the packed-code utilities
(/root/reference/inference_lib/src/aqlm/utils.py:11-41).

Everything here is pure ``jnp`` with static shapes — it serves three roles:
1. the semantic definition every fast Pallas kernel is tested against
   (the reference uses its fallback kernel the same way,
   /root/reference/inference_lib/src/aqlm/inference_kernels/dequantization.py:9-21),
2. the slow-but-always-correct fallback compute path,
3. the differentiable path used by the calibration engine (gradients flow
   into codebooks and scales; codes are integer leaves).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.config import AqlmScheme

__all__ = [
    "AqlmWeight",
    "dequantize_weight",
    "aqlm_matmul_reference",
    "random_aqlm_weight",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["codes", "codebooks", "scales", "bias"],
    meta_fields=["scheme"],
)
@dataclasses.dataclass
class AqlmWeight:
    """One quantized linear weight as a JAX pytree.

    Attributes:
      codes:     uint8/uint16 ``[num_out_groups, num_in_groups, num_codebooks]``
      codebooks: float ``[num_codebooks, codebook_size, out_group_size, in_group_size]``
      scales:    float ``[num_out_groups]`` (per-output-group, the scale_nbits=0
                 default) or ``[num_out_groups, num_in_groups]`` (per-group
                 scales, the reference's scale_nbits>0 mode, src/aq.py:83-96)
      bias:      optional float ``[out_features]``
      scheme:    static AqlmScheme (pytree metadata, safe under jit)
    """

    codes: jax.Array
    codebooks: jax.Array
    scales: jax.Array
    bias: jax.Array | None
    scheme: AqlmScheme

    @property
    def out_features(self) -> int:
        return self.codes.shape[0] * self.scheme.out_group_size

    @property
    def in_features(self) -> int:
        return self.codes.shape[1] * self.scheme.in_group_size

    @property
    def shape(self) -> tuple[int, int]:
        return (self.out_features, self.in_features)

    def astype(self, dtype) -> "AqlmWeight":
        return AqlmWeight(
            codes=self.codes,
            codebooks=self.codebooks.astype(dtype),
            scales=self.scales.astype(dtype),
            bias=None if self.bias is None else self.bias.astype(dtype),
            scheme=self.scheme,
        )


def broadcast_scales(scales: jax.Array, og: int, ig: int) -> jax.Array:
    """[OG] or [OG, IG] scales -> [OG, IG, 1, 1] broadcastable over groups."""
    if scales.ndim == 1:
        return scales.reshape(og, 1, 1, 1)
    return scales.reshape(og, ig, 1, 1)


def _dequant_groups_xla(codes, cb, scheme):
    """UNscaled dense weight [OUT, IN] via the XLA gather (exact; but the
    take_along_axis gather at 7B dequant scale CRASHES the v5e TPU worker
    after ~33-64 executions — experiments/dequant_crash_probe). CPU / small
    shapes / >8-bit schemes use this path."""
    og, ig, k = codes.shape
    o, i = scheme.out_group_size, scheme.in_group_size
    codes = codes.astype(jnp.int32)
    # Gather with the (huge) group axis LAST: a [k, N, o, i] result pads its
    # (o=1, i=8) minor dims to the (8, 128) tile — a 16x HBM expansion that
    # made the differentiable dequant the peak allocation of PV training
    # (5.4 GB for a 344 MB gather on 7B gate_proj). [k, o*i, N] is tile-tight.
    n = og * ig
    idx = codes.transpose(2, 0, 1).reshape(k, 1, n)  # [k, 1, N]
    cb_t = cb.reshape(k, -1, o * i).transpose(0, 2, 1)  # [k, o*i, S]
    groups = jnp.take_along_axis(cb_t, jnp.broadcast_to(idx, (k, o * i, n)), axis=2)
    groups = groups.sum(axis=0)  # [o*i, N]
    groups = groups.T.reshape(og, ig, o, i)
    return groups.transpose(0, 2, 1, 3).reshape(og * o, ig * i)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dequant_groups_kernel(codes, cb, scheme):
    """UNscaled dense weight [OUT, IN] via the Pallas one-hot MXU kernel in
    precise (f32) mode — the TPU-safe replacement for the XLA gather, with
    a manual VJP (codebook grads via segment_sum; codes are ints).
    Requires out_group_size == 1 and nbits_per_codebook <= 8."""
    from aqlm_tpu.ops.kernels import dequantize_onehot

    # a forced impl="kernel" call on an og>1 scheme would silently read only
    # codebook row 0 (cb[:, :, 0, :]) — fail loudly instead of returning
    # wrong weights (the "auto" gate protects only the default path)
    assert scheme.out_group_size == 1, (
        f"kernel dequant requires out_group_size == 1, got {scheme}"
    )
    ct = codes.astype(jnp.int32).transpose(2, 1, 0)  # [K, IG, OUT]
    ones = jnp.ones((codes.shape[0],), jnp.float32)
    wt = dequantize_onehot(
        ct, cb[:, :, 0, :], ones, group=scheme.in_group_size,
        dtype=jnp.float32, precise=True,
    )  # [IN, OUT]
    return wt.T


def _dequant_groups_kernel_fwd(codes, cb, scheme):
    # residuals must be jax types: carry cb's dtype via an empty scalar
    return _dequant_groups_kernel(codes, cb, scheme), (codes, jnp.zeros((), cb.dtype))


def _dequant_groups_kernel_bwd(scheme, res, g):
    import numpy as np

    from jax import dtypes

    codes, cb_proto = res
    k, s = scheme.num_codebooks, scheme.codebook_size
    g_ = scheme.in_group_size
    cb_dtype = cb_proto.dtype
    out_f = g.shape[0]
    ig = g.shape[1] // g_
    data = g.astype(jnp.float32).reshape(out_f, ig, g_).reshape(-1, g_)
    from aqlm_tpu.ops.kernels import (
        CB_GRAD_MAX_SEGMENTS, cb_grad_segment, should_interpret,
    )

    if s <= CB_GRAD_MAX_SEGMENTS and not should_interpret():
        # batched one-hot-MXU kernel: TPU scatter serializes, and the
        # per-codebook segment_sums dominated the calibration Adam epoch and
        # the PV grad step at 7B scale (NOTES.md r5)
        dcb = cb_grad_segment(codes.reshape(-1, k), data, s)
    else:
        dcb_ks = []
        for kk in range(k):
            seg = codes[:, :, kk].astype(jnp.int32).reshape(-1)
            dcb_ks.append(jax.ops.segment_sum(data, seg, num_segments=s))
        dcb = jnp.stack(dcb_ks)
    dcb = dcb[:, :, None, :].astype(cb_dtype)  # [K, S, 1, g]
    return np.zeros(codes.shape, dtypes.float0), dcb


_dequant_groups_kernel.defvjp(_dequant_groups_kernel_fwd, _dequant_groups_kernel_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dequant_groups_g16(codes, cb, scheme):
    """UNscaled dense weight [OUT, IN] for 16-bit codebooks via the wide-row
    gather (ops/gather16) with a manual VJP — the TPU-safe differentiable
    1x16 dequant for the calibration MSE loss: the XLA broadcast-index
    take_along_axis gather crashes the v5e worker after ~33-64 executions
    (experiments/dequant_crash_probe) and the one-hot kernel cannot span a
    65536-entry codebook; the [S*g/128, 128] row-packed gather is a
    different (wide-row) gather class. Backward = per-codebook segment_sum
    (the E-probe-validated scatter). Requires out_group_size == 1."""
    from aqlm_tpu.ops.gather16 import _dequant_weight_16, pack_codebook_rows

    assert scheme.out_group_size == 1, scheme
    g_ = scheme.in_group_size
    out_f, ig = codes.shape[0], codes.shape[1]
    # bound the wide-row gather's [chunk, IG, 128] transient to ~256 MB: the
    # unchunked eager form materializes ~3 GB per 7B projection (the per-row
    # 16x expansion before extraction) and OOM'd every eager 1x16 dequant
    # call site in the r5e bench (largest divisor of OUT within budget; None
    # when OUT itself is small enough)
    budget_rows = max(1, 256 * 2 ** 20 // max(ig * 128 * 4, 1))
    chunk = None
    if out_f > budget_rows:
        divs = [d for d in range(1, out_f + 1) if out_f % d == 0 and d <= budget_rows]
        chunk = max(divs) if divs else None
    w = None
    for k in range(scheme.num_codebooks):
        packed = pack_codebook_rows(cb[k, :, 0, :], g_, dtype=jnp.float32)
        wk = _dequant_weight_16(codes[:, :, k], packed, group=g_, chunk=chunk)
        w = wk if w is None else w + wk
    return w.astype(jnp.float32)


def _dequant_groups_g16_fwd(codes, cb, scheme):
    return _dequant_groups_g16(codes, cb, scheme), (codes, jnp.zeros((), cb.dtype))


_dequant_groups_g16.defvjp(_dequant_groups_g16_fwd, _dequant_groups_kernel_bwd)


def _kernel_dequant_ok(scheme) -> bool:
    from aqlm_tpu.ops.kernels import should_interpret

    return (
        scheme.out_group_size == 1
        and scheme.nbits_per_codebook <= 8
        and not should_interpret()
    )


def _g16_dequant_ok(scheme) -> bool:
    from aqlm_tpu.ops.kernels import should_interpret

    return (
        scheme.out_group_size == 1
        and scheme.nbits_per_codebook > 8
        and scheme.codebook_size * scheme.in_group_size % 128 == 0
        and not should_interpret()
    )


def dequantize_weight(w: AqlmWeight, dtype=None, *, impl: str = "auto") -> jax.Array:
    """Reconstruct the dense weight ``[out_features, in_features]``.

    W[og*o, ig*i] = scales[og(, ig)] * sum_k codebooks[k, codes[og, ig, k], o, i]

    impl: "auto" (default) uses the Pallas one-hot kernel on real TPUs for
    Kx<=8-bit schemes — XLA's dequant-scale gather crashes the v5e worker
    after ~33-64 executions (experiments/dequant_crash_probe) — the
    row-packed wide gather ("gather16") for >8-bit schemes on TPUs, and the
    exact XLA gather on CPU; "xla"/"kernel"/"gather16" force a path. All are
    differentiable w.r.t. codebooks and scales (the kernel path through a
    manual VJP; the scale multiply is ordinary autodiff either way) and
    numerically equal (the kernel runs the selection matmul in f32).
    """
    scheme = w.scheme
    og, ig, _ = w.codes.shape
    if impl == "auto":
        if _kernel_dequant_ok(scheme):
            impl = "kernel"
        elif _g16_dequant_ok(scheme):
            impl = "gather16"
        else:
            impl = "xla"
    if impl in ("kernel", "gather16"):
        fn = _dequant_groups_kernel if impl == "kernel" else _dequant_groups_g16
        groups_flat = fn(w.codes, w.codebooks, scheme)
        o, i = scheme.out_group_size, scheme.in_group_size
        groups = groups_flat.reshape(og, o, ig, i).transpose(0, 2, 1, 3)
    else:
        o, i = scheme.out_group_size, scheme.in_group_size
        groups = (
            _dequant_groups_xla(w.codes, w.codebooks, scheme)
            .reshape(og, o, ig, i)
            .transpose(0, 2, 1, 3)
        )
    weight = groups * broadcast_scales(w.scales, og, ig).astype(groups.dtype)
    weight = weight.transpose(0, 2, 1, 3).reshape(og * o, ig * i)
    if dtype is not None:
        weight = weight.astype(dtype)
    return weight


def aqlm_matmul_reference(x: jax.Array, w: AqlmWeight) -> jax.Array:
    """y = x @ W^T + b  — the fallback 'dequantize then matmul' path.

    Mirrors /root/reference/.../dequantization.py:9-21 (``dequantize_gemm``).
    Used as the correctness oracle for all Pallas kernels and as the compute
    path for schemes the fast kernels don't specialize.
    """
    weight = dequantize_weight(w, dtype=x.dtype)
    y = jnp.einsum("...i,oi->...o", x, weight, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    return y


def random_aqlm_weight(
    key: jax.Array,
    scheme: AqlmScheme,
    out_features: int,
    in_features: int,
    dtype=jnp.float32,
    with_bias: bool = False,
) -> AqlmWeight:
    """Random weight for tests/benchmarks (codes uniform, codebooks normal)."""
    scheme.check_features(out_features, in_features)
    k_codes, k_cb, k_scale, k_bias = jax.random.split(key, 4)
    codes = jax.random.randint(
        k_codes,
        scheme.codes_shape(out_features, in_features),
        0,
        scheme.codebook_size,
        dtype=jnp.int32,
    ).astype(scheme.code_dtype)
    codebooks = (
        jax.random.normal(k_cb, scheme.codebooks_shape(), dtype=jnp.float32)
        / (scheme.num_codebooks * scheme.group_numel) ** 0.5
    ).astype(dtype)
    num_out_groups = out_features // scheme.out_group_size
    scales = jax.random.uniform(
        k_scale, (num_out_groups,), dtype=jnp.float32, minval=0.5, maxval=1.5
    ).astype(dtype)
    bias = (
        jax.random.normal(k_bias, (out_features,), dtype=dtype) * 0.01
        if with_bias
        else None
    )
    return AqlmWeight(codes=codes, codebooks=codebooks, scales=scales, bias=bias, scheme=scheme)
