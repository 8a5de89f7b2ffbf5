"""Pallas TPU kernels: fused one-hot dequant-matmul for <=8-bit codebooks.

TPU-native replacement for the reference CUDA kernels
(/root/reference/inference_lib/src/aqlm/inference_kernels/cuda_kernel.cu —
Code2x8MatVec :144-233, CodeKx8MatVec :296-390). The GPU kernels gather
codebook rows from shared memory; v5e has no fast gather (see NOTES.md), so
we dequantize on the MXU instead: a one-hot of the codes times the codebook
is an exact gather expressed as a matmul (the TPU analogue of the LUT-GEMM
strategy in numba_kernel.py:38-48).

NOTE (r4): the compare-built one-hot costs ~S VPU element-ops per group per
codebook (~13G per 7B layer) — serving prefill now uses the lane-gather
dequant kernels in ops/gather_prefill.py instead; this module remains the
oracle for them, the tiny-shape (<128-OUT) path, and on-device transcoding.

Layout: codes are stored TRANSPOSED `[num_codebooks, IG, OUT]` so the MXU
consumes W^T tiles without relayouts (x @ W^T contracts W^T's leading axis).
Scale/bias epilogue is applied on the output (per-out-channel), matching the
cpp wrapper epilogue (cuda_kernel.cpp:95-111) but fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_onehot_matmul", "dequantize_onehot", "should_interpret",
    "gather_wraps", "cb_grad_segment",
]


def should_interpret() -> bool:
    return jax.default_backend() == "cpu"


_GATHER_WRAPS: bool | None = None


def _wrap_probe_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def gather_wraps() -> bool:
    """Whether tpu.dynamic_gather wraps out-of-range lane indices mod 128.

    Measured true on the v5e (experiments/lutgemv_oob_probe.py) but NOT an
    API contract — another TPU generation or Mosaic version may clamp (as
    interpret mode does). The LUT-GEMV / gather-prefill kernels only drop
    their `& 127` lane mask when this per-process probe confirms the wrap on
    the actual backend; any failure (or a clamping backend) keeps the mask.
    AQLM_GATHER_WRAP=0/1 overrides the probe.
    """
    global _GATHER_WRAPS
    if _GATHER_WRAPS is None:
        import os

        env = os.environ.get("AQLM_GATHER_WRAP")
        if env is not None:
            _GATHER_WRAPS = env not in ("0", "false", "")
        elif should_interpret():
            _GATHER_WRAPS = False  # XLA interpret clamps OOB indices
        else:
            try:
                tab = jnp.broadcast_to(
                    jnp.arange(128, dtype=jnp.float32)[None, :], (8, 128)
                )
                idx = jnp.broadcast_to(
                    jnp.arange(128, dtype=jnp.int32)[None, :] + 128, (8, 128)
                )
                out = pl.pallas_call(
                    _wrap_probe_kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(tab, idx)
                _GATHER_WRAPS = bool(jnp.all(out == tab))
            except Exception:
                _GATHER_WRAPS = False
    return _GATHER_WRAPS


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    t = min(target, n)
    while n % t:
        t -= 1
    return t


def _onehot_dequant_wt(codes_t, codebooks, ig_tile, tn, group, nbooks, s,
                       precise=False):
    """Dequantize a W^T tile [ig_tile*group, tn] from transposed codes.

    codes_t: [nbooks, ig_tile, tn] int32
    codebooks: [nbooks, s, group]
    precise: keep the one-hot matmul in f32 (exact selection of f32 codebook
    entries — the calibration-grade mode; bf16 operands are the serving
    default, ~8x faster on the MXU).
    """
    tk = ig_tile * group
    mxu_dtype = jnp.float32 if precise else jnp.bfloat16
    # TPU f32 dots default to ONE bf16 pass; HIGHEST = bf16x3 decomposition,
    # exact to f32 roundoff (the one-hot operand is 0/1, so all error lives
    # in the codebook operand)
    prec = jax.lax.Precision.HIGHEST if precise else None
    wt = jnp.zeros((tk, tn), jnp.float32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (ig_tile, tn, s), 2)
    for k in range(nbooks):
        onehot = (codes_t[k][:, :, None] == iota_s).astype(mxu_dtype)  # [ig, tn, s]
        # [ig*tn, s] @ [s, group] -> [ig, tn, group]
        g = jax.lax.dot_general(
            onehot.reshape(ig_tile * tn, s),
            codebooks[k].astype(mxu_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(ig_tile, tn, group)
        wt = wt + g.transpose(0, 2, 1).reshape(tk, tn)
    return wt


def _fused_kernel(codes_ref, cb_ref, x_ref, out_ref, acc_ref, *, group, nbooks, s):
    """grid = (out_tiles, b_tiles, k_tiles); k innermost accumulates."""
    ig_tile, tn = codes_ref.shape[1], codes_ref.shape[2]
    wt = _onehot_dequant_wt(
        codes_ref[:].astype(jnp.int32), cb_ref[:], ig_tile, tn, group, nbooks, s
    ).astype(jnp.bfloat16)

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _fused_call(x, codes_t, codebooks, *, group, interpret):
    nbooks, ig, out_features = codes_t.shape
    s = codebooks.shape[1]
    b = x.shape[0]
    in_features = ig * group

    tn = _pick_tile(out_features, 128)
    # one-hot tile [tig, tn, s] bf16 must stay ~<=2 MiB of VMEM
    tig = _pick_tile(ig, max(1, 2 ** 21 // (tn * s * 2)))
    tb = _pick_tile(b, 256)
    grid = (out_features // tn, b // tb, ig // tig)

    kernel = functools.partial(_fused_kernel, group=group, nbooks=nbooks, s=s)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nbooks, tig, tn), lambda o, bt, k: (0, k, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb, tig * group), lambda o, bt, k: (bt, k), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda o, bt, k: (bt, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_features), x.dtype),
        scratch_shapes=[pltpu.VMEM((tb, tn), jnp.float32)],
        interpret=interpret,
    )(codes_t, codebooks, x)


def fused_onehot_matmul(x, codes_t, codebooks, scales, bias=None, *, group: int):
    """y = x @ dequant(codes)^T * scales + bias, codes-resident, nbits<=8.

    x: [..., in_features] (any leading dims); codes_t: [K, IG, OUT] uint8;
    codebooks: [K, S<=256, group]; scales: [OUT]; bias: [OUT] or None.
    """
    lead = x.shape[:-1]
    in_features = x.shape[-1]
    xb = x.reshape(-1, in_features)
    y = _fused_call(
        xb, codes_t, codebooks, group=group, interpret=should_interpret()
    )
    y = y * scales[None, :].astype(y.dtype)
    if bias is not None:
        y = y + bias[None, :].astype(y.dtype)
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# batched codebook-gradient segment sum (the PV/calibration backward)
# ---------------------------------------------------------------------------

CB_GRAD_MAX_SEGMENTS = 512


def _cb_grad_kernel(codes_ref, data_ref, out_ref, *, K, S, precise):
    """grid = (group_tiles,); accumulate onehot^T @ data into [K, S, g]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = codes_ref[:]  # [K, tg] int32
    d = data_ref[:]  # [tg, g] f32
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, c.shape[1]), 0)
    for k in range(K):
        oh = (iota == c[k][None, :]).astype(jnp.float32)  # [S, tg]
        out_ref[k] = out_ref[k] + jax.lax.dot_general(
            oh, d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST: one operand is 0/1 (exact in bf16), so the bf16x3
            # decomposition makes the dot exact to f32 roundoff — grads
            # match segment_sum to ~1 ulp. precise=False runs single-pass
            # bf16 (~0.3% grad noise, same order as the bf16 dequant the
            # grads already carry).
            precision=(jax.lax.Precision.HIGHEST if precise
                       else jax.lax.Precision.DEFAULT),
        )


@functools.partial(
    jax.jit, static_argnames=("num_segments", "interpret", "precise", "tg")
)
def _cb_grad_call(codes2, data, *, num_segments, interpret, precise=True,
                  tg=4096):
    K, G = codes2.shape
    g = data.shape[1]
    tg = min(tg, -(-G // 128) * 128)
    Gp = -(-G // tg) * tg
    if Gp != G:
        # padded rows carry zero data -> contribute nothing to segment 0
        codes2 = jnp.pad(codes2, ((0, 0), (0, Gp - G)))
        data = jnp.pad(data, ((0, Gp - G), (0, 0)))
    kern = functools.partial(_cb_grad_kernel, K=K, S=num_segments,
                             precise=precise)
    return pl.pallas_call(
        kern,
        grid=(Gp // tg,),
        in_specs=[
            pl.BlockSpec((K, tg), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, num_segments, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, num_segments, g), jnp.float32),
        interpret=interpret,
    )(codes2, data)


def cb_grad_segment(codes: jax.Array, data: jax.Array, num_segments: int,
                    *, precise: bool = True) -> jax.Array:
    """Batched codebook-grad segment-sum: out[k, s] = sum_{i: codes[i,k]==s} data[i].

    codes: [G, K] integer; data: [G, g] float; returns [K, num_segments, g]
    f32 — the gradient of sum-of-codebook-lookups dequantization w.r.t. the
    codebooks, for ALL K codebooks in one launch.

    TPU scatter (jax.ops.segment_sum) serializes millions of random-index
    updates; the per-(projection, codebook) scatters were the dominant cost
    of the 7B PV grad step (NOTES.md r4e: 23-38 s/step vs ~0.5 s of FLOPs).
    This kernel streams group tiles and accumulates onehot^T @ data on the
    MXU instead — a scatter-free formulation (the transpose of the one-hot
    dequant trick above). Reference counterpart: autograd through
    F.embedding_bag in /root/reference/src/utils.py:64-91.

    Requires num_segments <= CB_GRAD_MAX_SEGMENTS (one-hot width bounds the
    [S, tile] VMEM transient); callers fall back to segment_sum beyond that.
    """
    assert num_segments <= CB_GRAD_MAX_SEGMENTS, num_segments
    codes2 = codes.astype(jnp.int32).T  # [K, G]
    return _cb_grad_call(
        codes2, data.astype(jnp.float32), num_segments=num_segments,
        interpret=should_interpret(), precise=precise,
    )


# ---------------------------------------------------------------------------
# standalone dequant (for prefill two-step and transcoding on device)
# ---------------------------------------------------------------------------


def _dequant_kernel(codes_ref, cb_ref, out_ref, *, group, nbooks, s, precise=False):
    ig_tile, tn = codes_ref.shape[1], codes_ref.shape[2]
    out_ref[:] = _onehot_dequant_wt(
        codes_ref[:].astype(jnp.int32), cb_ref[:], ig_tile, tn, group, nbooks, s,
        precise=precise,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "dtype", "interpret", "precise"))
def _dequant_call(codes_t, codebooks, *, group, dtype, interpret, precise=False):
    nbooks, ig, out_features = codes_t.shape
    s = codebooks.shape[1]
    tn = _pick_tile(out_features, 128)
    tig = _pick_tile(ig, max(1, 2 ** 21 // (tn * s * 2)))
    kernel = functools.partial(_dequant_kernel, group=group, nbooks=nbooks, s=s,
                               precise=precise)
    return pl.pallas_call(
        kernel,
        grid=(ig // tig, out_features // tn),
        in_specs=[
            pl.BlockSpec((nbooks, tig, tn), lambda i, o: (0, i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tig * group, tn), lambda i, o: (i, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ig * group, out_features), dtype),
        interpret=interpret,
    )(codes_t, codebooks)


def dequantize_onehot(codes_t, codebooks, scales, *, group: int, dtype=jnp.bfloat16,
                      precise: bool = False):
    """Materialize W^T [in_features, out_features] via the one-hot MXU path.

    precise=True keeps the selection matmul in f32 (bit-exact codebook
    entries; calibration-grade)."""
    wt = _dequant_call(
        codes_t, codebooks, group=group, dtype=jnp.float32,
        interpret=should_interpret(), precise=precise,
    )
    return (wt * scales[None, :].astype(wt.dtype)).astype(dtype)
