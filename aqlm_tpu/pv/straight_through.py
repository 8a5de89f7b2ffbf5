"""Straight-through PV-tuning: the full P+V alternating update.

Functional JAX redesign of StraightThroughAdamW
(/root/reference/src/pv_optimizer.py:22-424). One PV step does exactly what
the reference's optimizer.step() does (:213-222):

1. gradient pass: the loss sees each quantized projection through
   W_eff = dequant(codes, codebooks, scales) + (st_buffer - stop_grad(st_buffer))
   so dL/d(st_buffer) equals dL/d(dequantized weight) — the straight-through
   estimator (:275-306) — while codebooks/scales receive their chain-rule
   gradients through the dequantization;
2. Adam updates the continuous params and the straight-through buffers;
3. the V step: codes <- L2 beam search toward the updated buffer, with
   max_code_change / trust-ratio / temperature / force-update constraints
   (:309-343);
4. delta-decay mixing: buffer <- delta * dequant(new codes) + (1-delta) * buffer
   (:344-348).

Memory design (how a 7B student fits one 16 GB chip):
- the KL loss is CHUNKED (pv.losses.chunked_kl_loss): student forward returns
  final hidden states and the lm_head is applied per token-chunk under remat,
  so the two full [B,T,V] logit tensors never coexist
  (reference: src/memory_efficient_loss.py:15-58);
- ST buffers are materialized only for the ACTIVE layer subset
  (`active_layers`); inactive quantized layers forward codes-resident through
  the differentiable reference-mode dequant under per-block rematerialization,
  so their dense weights are transient. A host-side rotation
  (pv.host.HostSTManager) keeps the full-model buffers + moments in host RAM
  and cycles the active window round-robin — the single-chip analogue of the
  reference's owner-computes sharding (src/pv_optimizer.py:309-424), which
  also only materializes each rank's owned subset;
- the teacher can be passed as precomputed hidden states
  (teacher_kind="hidden", produced by pv.teacher.stream_teacher_hidden with
  host-resident weights), so teacher params never occupy HBM.

Instead of FSDP grad-gather + isend/irecv weight scatter (:378-409), the
params and buffers live on the ("data", "model") mesh and XLA SPMD moves the
bytes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2
from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight
from aqlm_tpu.ops.runtime import QuantizedLinear
from aqlm_tpu.pv.losses import chunked_kl_loss, kl_divergence_loss
from aqlm_tpu.pv.trainer import merge_trainable, split_trainable

__all__ = [
    "PVConfig", "PVState", "PVStepFns", "init_pv_state", "make_pv_step",
    "pv_code_update", "scanned_student_hidden",
]


@dataclasses.dataclass(frozen=True)
class PVConfig:
    """PV hyperparameters; names follow the reference CLI
    (/root/reference/finetune.py:190-467 add_finetuning_args)."""

    lr: float = 1e-4  # continuous params (codebooks, scales, non-quantized)
    code_lr: float = 1e-3  # straight-through buffer learning rate
    beam_size: int = 1
    delta_decay: float = 0.0
    max_code_change_per_step: float = 1e-2
    code_trust_ratio: float | None = None
    code_selection_temperature: float = 0.0
    force_code_update: bool = False
    stochastic_rounding_tau: float = 0.0
    # memory-efficient loss (reference --loss_tokens_per_chunk,
    # finetune.py:359-365); 0 disables chunking (full [B,T,V] logits)
    chunk_tokens: int = 256
    # rematerialize each transformer block in the student backward pass
    remat_blocks: bool = True
    # student forward as ONE lax.scan over stacked block params instead of a
    # python-unrolled layer loop. Bounds backward-pass live transients to one
    # block's dequantized weights (an unrolled 32-block 7B grad graph lets
    # XLA's scheduler keep several 404 MB dequant transients alive and faults
    # the chip) and compiles once regardless of depth. Requires the chunked
    # loss and a homogeneous llama-family student (every QUANTIZABLE_PROJS
    # a reference-mode QuantizedLinear of one scheme).
    scan_blocks: bool = False
    # what the scan_blocks backward rematerializes: "manual" (custom_vjp
    # per projection — explicit dequant remat, residuals exclude the ST
    # window; the 32L-on-chip mode), "dequant" (jax.checkpoint per
    # projection — passes L=8 but faults the v5e at L>=16), "block"
    # (whole-body checkpoint — faults at any L), "none" (debugging)
    scan_remat: str = "manual"
    # chain ceil(L/scan_segment_layers) scans of this depth instead of one
    # L-long scan: the v5e faults in the scan backward at >=16 iterations at
    # 7B widths (every remat mode; r4 ladder), 8 is the proven depth. 0 = one
    # unsegmented scan.
    scan_segment_layers: int = 8
    # dequant implementation for scan_remat="manual": "auto" = the Pallas
    # one-hot kernel on real TPUs (XLA's take_along_axis gather at 7B dequant
    # scale crashes the v5e worker after ~33-64 executions —
    # experiments/dequant_crash_probe) and XLA on CPU; "xla"/"kernel" force.
    scan_dequant: str = "auto"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["trainable", "frozen", "st_buffers", "cont_opt_state", "st_opt_state", "step"],
    meta_fields=[],
)
@dataclasses.dataclass
class PVState:
    trainable: Any
    frozen: Any
    st_buffers: Any  # [layers] of {proj_name: [out, in] f32} (empty dict = inactive layer)
    cont_opt_state: Any
    st_opt_state: Any
    step: jax.Array


class PVStepFns(NamedTuple):
    """grad_step(state, teacher, ids[, mask]) -> (state, loss) — fused
    grad+apply (jittable). code_step(state, key) -> state — the V phase.
    grad_fn(state, teacher, ids[, mask]) -> (loss, grads) and
    apply_fn(state, grads, scale) -> state split the step for gradient
    accumulation (reference: no_sync + accumulation, finetune.py:1136)."""

    grad_step: Callable
    code_step: Callable
    grad_fn: Callable
    apply_fn: Callable


def _quantized_weight_of(q: QuantizedLinear) -> AqlmWeight:
    assert q.mode == "reference", "PV-tuning operates on reference-mode params"
    return AqlmWeight(codes=q.codes, codebooks=q.codebooks, scales=q.scales, bias=q.bias, scheme=q.scheme)


def _st_init(params: dict, active_layers=None):
    buffers = []
    for li, layer in enumerate(params["layers"]):
        entry = {}
        if active_layers is None or li in active_layers:
            for name in QUANTIZABLE_PROJS:
                lin = layer.get(name)
                if isinstance(lin, QuantizedLinear):
                    entry[name] = dequantize_weight(_quantized_weight_of(lin), dtype=jnp.float32)
        buffers.append(entry)
    return buffers


def materialize_st_params(params: dict, st_buffers) -> dict:
    """Swap ST-active quantized projections for DenseLinear(W_eff).

    Layers whose st_buffers entry is empty stay QuantizedLinear — their
    forward dequantizes codes-resident (differentiably, so codebooks/scales
    still receive gradients) and, under remat, their dense weights are
    transient instead of held for backward."""
    out = dict(params)
    layers = []
    for layer, bufs in zip(params["layers"], st_buffers):
        new_layer = dict(layer)
        for name, st in bufs.items():
            q: QuantizedLinear = layer[name]
            w = dequantize_weight(_quantized_weight_of(q), dtype=jnp.float32)
            w_eff = w + (st - jax.lax.stop_gradient(st))
            new_layer[name] = DenseLinear(weight=w_eff, bias=q.bias)
        layers.append(new_layer)
    out["layers"] = layers
    return out


@jax.custom_vjp
def _attention_remat(q, k, v, mask):
    """Training attention with recompute-in-backward (custom_vjp).

    Under lax.scan the default attention saves its [B,Hkv,rep,Tq,Tk]
    softmax probabilities per layer — the L=32/T=512 memcheck OOM showed
    1.5 GB of stacked f32+bf16 attention probs. Residuals here are only
    (q, k, v, mask); the backward recomputes the probs (flash-attention
    backward at B=1 training sizes, in plain XLA)."""
    from aqlm_tpu.models.common import attention

    return attention(q, k, v, mask)


def _attention_remat_fwd(q, k, v, mask):
    return _attention_remat(q, k, v, mask), (q, k, v, mask)


def _attention_remat_bwd(res, g):
    import numpy as np

    from jax import dtypes

    q, k, v, mask = res
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    rep = hq // hkv
    scale = d ** -0.5
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b, tq, hkv, rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", qs, k, preferred_element_type=jnp.float32)
    logits = jnp.where(mask[:, :, None, :, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)  # [b,hkv,rep,tq,tk] f32, transient
    gr = g.astype(jnp.float32).reshape(b, tq, hkv, rep, d)
    dv = jnp.einsum("bhrqk,bqhrd->bkhd", p, gr).astype(v.dtype)
    dp = jnp.einsum("bqhrd,bkhd->bhrqk", gr, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(mask[:, :, None, :, :], ds, 0.0)
    dqs = jnp.einsum("bhrqk,bkhd->bqhrd", ds, k.astype(jnp.float32))
    dq = (dqs * scale).reshape(b, tq, hq, d).astype(q.dtype)
    dk = jnp.einsum("bhrqk,bqhrd->bkhd", ds, qs.astype(jnp.float32)).astype(k.dtype)
    dmask = np.zeros(mask.shape, dtypes.float0)
    return dq, dk, dv, dmask


_attention_remat.defvjp(_attention_remat_fwd, _attention_remat_bwd)


@jax.custom_vjp
def _silu_mul_remat(gate, up):
    """silu(gate) * up with recompute-in-backward.

    The default glue upcasts gate to f32 for silu and the scan backward
    stacks three [L,B,T,inter] f32 residuals (~2 GB at L=32/T=512).
    Residuals here are just (gate, up) in their storage dtype; silu is
    recomputed in f32 in the backward. Primal math identical to
    models/llama._block:199."""
    return (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)


def _silu_mul_fwd(gate, up):
    return _silu_mul_remat(gate, up), (gate, up)


def _silu_mul_bwd(res, g):
    gate, up = res
    g32 = gate.astype(jnp.float32)
    s = jax.nn.sigmoid(g32)
    silu = g32 * s
    gy = g.astype(jnp.float32)
    dgate = (gy * up.astype(jnp.float32) * (s + g32 * s * (1.0 - s))).astype(gate.dtype)
    dup = (gy * silu).astype(up.dtype)
    return dgate, dup


_silu_mul_remat.defvjp(_silu_mul_fwd, _silu_mul_bwd)


def _make_manual_st_proj(scheme, compute_dtype, use_st, win, has_bias,
                         dequant_impl: str = "xla"):
    """custom_vjp straight-through projection for scan_remat="manual".

    Replaces `jax.checkpoint(dequant + masked-ST + matmul)` with an explicit
    VJP whose residuals are ONLY (x, codes/codebook/scale slices, li, start):
    the dense weight is rematerialized in backward by construction, and the
    [W, out, in] ST window NEVER enters the residual set — under the
    checkpointed form it is an input of the checkpointed unit, and a scan
    backward that fails to hoist the loop-invariant residual stacks ~0.8 GB
    of window buffers per layer (fits at L=8, faults the 16 GB chip at
    L>=16 — the r4 on-chip ladder). The straight-through semantics are
    unchanged: primal y = x @ dequant(codes)^T (the ST correction is
    numerically zero), backward routes dL/dW into the window slot while
    codebooks/scales receive their chain-rule grads through a local
    jax.vjp of the dequant (reference: src/pv_optimizer.py:275-306)."""
    import numpy as np

    from jax import dtypes

    assert dequant_impl in ("xla", "kernel"), dequant_impl

    def _dequant(codes, cbs, scales, dtype):
        """Dense W [OUT, IN]. impl="kernel": the Pallas one-hot MXU dequant —
        the XLA take_along_axis gather at 7B dequant scale CRASHES the v5e
        worker after ~33-64 executions (experiments/dequant_crash_probe: A/B
        crash at n=64, the Pallas kernels survive 256+), which was the root
        cause of every PV-at-depth device fault (r1 unrolled, r4 L-ladder)."""
        if dequant_impl == "kernel":
            from aqlm_tpu.ops.kernels import dequantize_onehot

            # the kernel epilogue and _dq_grads assume [OUT] scales and
            # og == 1; a forced "kernel" on other schemes must fail loudly
            assert scheme.out_group_size == 1, scheme
            assert scales.ndim == 1, (
                "kernel dequant path needs per-out scales [OUT]; per-group "
                f"scales {scales.shape} use dequant_impl='xla'"
            )
            ct = codes.astype(jnp.int32).transpose(2, 1, 0)  # [K, IG, OUT]
            wt = dequantize_onehot(
                ct, cbs[:, :, 0, :], scales,
                group=scheme.in_group_size, dtype=dtype,
            )  # [IN, OUT], scales applied
            return wt.T
        return dequantize_weight(
            AqlmWeight(codes=codes, codebooks=cbs, scales=scales, bias=None,
                       scheme=scheme),
            dtype=dtype,
        )

    def _dq_grads(codes, cbs, scales, w, gw):
        """(dcbs, dscales) without XLA gathers.

        dscales[o] = sum_i gw[o,i] * U[o,i] with U = W/scales (W is already
        rematerialized); dcb[k,s,:] = sum over groups with code s of
        scales[o] * gw_group — on real TPUs the batched one-hot-MXU
        cb_grad_segment kernel (TPU scatter serializes: the 7x32 per-layer
        segment_sums were the dominant cost of the r4e 23-38 s grad step);
        segment_sum remains the CPU path and the >512-entry fallback."""
        g_ = scheme.in_group_size
        out_f = gw.shape[0]
        ig = gw.shape[1] // g_
        safe = jnp.where(jnp.abs(scales) > 1e-12, scales, 1.0)
        dscales = (jnp.sum(gw * w.astype(jnp.float32), axis=1) / safe).astype(
            scales.dtype
        )
        data = (gw.reshape(out_f, ig, g_) * scales[:, None, None]).reshape(-1, g_)
        from aqlm_tpu.ops.kernels import (
            CB_GRAD_MAX_SEGMENTS, cb_grad_segment, should_interpret,
        )

        S = scheme.codebook_size
        if S <= CB_GRAD_MAX_SEGMENTS and not should_interpret():
            # precise=False: single-pass bf16 selection dot (~0.3% grad
            # noise — below the bf16-dequant noise this path already
            # carries; the HIGHEST-precision dot was 60% of the 55 ms
            # projection backward on the v5e, cbgrad_probe r5)
            dcbs = cb_grad_segment(
                codes.reshape(-1, scheme.num_codebooks), data, S, precise=False
            )
        else:
            dcb_ks = []
            for k in range(scheme.num_codebooks):
                seg = codes[:, :, k].astype(jnp.int32).reshape(-1)
                dcb_ks.append(jax.ops.segment_sum(data, seg, num_segments=S))
            dcbs = jnp.stack(dcb_ks)
        dcbs = dcbs[:, :, None, :].astype(cbs.dtype)  # [K,S,1,g]
        return dcbs, dscales

    @jax.custom_vjp
    def f(x, codes, cbs, scales, bias, st_arr, li, start):
        w = _dequant(codes, cbs, scales, compute_dtype)
        y = jnp.einsum(
            "...i,oi->...o", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if has_bias:
            y = y + bias.astype(y.dtype)
        return y

    def fwd(x, codes, cbs, scales, bias, st_arr, li, start):
        return f(x, codes, cbs, scales, bias, st_arr, li, start), (
            x, codes, cbs, scales, li, start,
        )

    def bwd(res, g):
        x, codes, cbs, scales, li, start = res
        gf = g.astype(jnp.float32)
        if dequant_impl == "kernel":
            w = _dequant(codes, cbs, scales, jnp.float32)
            dx = jnp.einsum("...o,oi->...i", gf, w).astype(x.dtype)
            gw = jnp.einsum("...o,...i->oi", gf, x.astype(jnp.float32))
            dcbs, dscales = _dq_grads(codes, cbs, scales, w, gw)
        else:
            w, dq_vjp = jax.vjp(
                lambda c, s: _dequant(codes, c, s, jnp.float32), cbs, scales
            )
            dx = jnp.einsum("...o,oi->...i", gf, w).astype(x.dtype)
            gw = jnp.einsum("...o,...i->oi", gf, x.astype(jnp.float32))
            dcbs, dscales = dq_vjp(gw)
        f0 = lambda a: np.zeros(jnp.shape(a), dtypes.float0)
        if use_st:
            in_win = ((li >= start) & (li < start + win)).astype(jnp.float32)
            if win == 1:
                # common case (window=1): no zeros+scatter chain — the scan
                # transpose accumulates these, and the zeros materialization
                # doubled the ~0.8 GB window transient per iteration
                dst = (gw * in_win)[None]
            else:
                pos = jnp.clip(li - start, 0, win - 1)
                dst = jnp.zeros((win,) + gw.shape, jnp.float32)
                dst = jax.lax.dynamic_update_index_in_dim(dst, gw * in_win, pos, 0)
        else:
            dst = None
        dbias = (
            jnp.sum(gf, axis=tuple(range(gf.ndim - 1))) if has_bias else None
        )
        return (dx, f0(codes), dcbs.astype(cbs.dtype),
                dscales.astype(scales.dtype), dbias, dst, f0(li), f0(start))

    f.defvjp(fwd, bwd)
    return f


def scanned_student_hidden(
    params: dict, st_buffers, cfg: llama.ModelConfig, input_ids, window_start=None,
    remat: str = "manual", segment_layers: int = 8, dequant_impl: str = "auto",
):
    """Student forward to post-final-norm hidden states via one lax.scan.

    The straight-through correction rides a stacked window: active layers'
    buffers (contiguous, HostSTManager.active_window) are stacked [W, out, in]
    and the scan body adds ``(st[pos] - stop_grad(st[pos])) * in_window`` to
    the block's dequantized weight — numerically zero in the primal, routing
    dL/dW to the window slot in the backward (the straight-through estimator,
    /root/reference/src/pv_optimizer.py:275-306). Inactive layers forward
    codes-resident; per-iteration jax.checkpoint keeps their dense weights
    transient, so peak HBM is O(one block) instead of O(num_layers).

    st_buffers forms:
      * per-layer list (init_pv_state's) — the window position is static,
        so each rotation is a separate compile;
      * windowed dict {proj: [W, out, in]} + ``window_start`` (traced int32)
        — ONE compile serves every rotation (the window position only enters
        the masked dynamic slice).

    remat controls what the scan backward rematerializes:
      * "dequant" (default): only the per-projection dequantize is
        jax.checkpoint'd — its inputs (codes/codebooks/scales slices) are
        already scan operands, so the dense weights (the 404 MB/layer that
        made the unrolled 7B path fault) are transient in BOTH directions
        while block activations save normally. Measured on the v5e: remat of
        the WHOLE body ("block") faults the device in the backward pass at
        any L, with or without prevent_cse; no remat ("none") works but
        saves every dense weight (L=8 max on 16 GB).
      * "block": jax.checkpoint around the whole scan body (historical).
      * "none": plain scan (small models / debugging).
    """
    assert remat in ("dequant", "manual", "block", "none"), remat
    layers = params["layers"]
    l0 = layers[0]
    for layer in layers:
        for name in QUANTIZABLE_PROJS:
            q = layer.get(name)
            assert isinstance(q, QuantizedLinear) and q.mode == "reference", (
                f"scan_blocks needs homogeneous reference-mode layers; {name!r} is {type(q)}"
            )
    scheme = l0[QUANTIZABLE_PROJS[0]].scheme
    compute_dtype = params["embed"].dtype

    codes_stack, cb_stack, sc_stack, bias_stack = {}, {}, {}, {}
    for name in QUANTIZABLE_PROJS:
        codes_stack[name] = jnp.stack([l[name].codes for l in layers])
        cb_stack[name] = jnp.stack([l[name].codebooks for l in layers])
        sc_stack[name] = jnp.stack([l[name].scales for l in layers])
        if l0[name].bias is not None:
            bias_stack[name] = jnp.stack([l[name].bias for l in layers])
    norm_stack = {
        name: jnp.stack([l[name] for l in layers])
        for name in ("input_norm", "post_attn_norm")
    }

    st_stack = {}
    start, win = 0, 0
    if isinstance(st_buffers, dict):
        if st_buffers:
            assert window_start is not None, "windowed st_buffers need window_start"
            st_stack = st_buffers
            start = window_start
            win = next(iter(st_buffers.values())).shape[0]
    else:
        active = [li for li, e in enumerate(st_buffers) if e]
        if active:
            start, win = active[0], len(active)
            assert active == list(range(start, start + win)), (
                f"scan_blocks needs a contiguous active window, got {active}"
            )
            st_stack = {
                name: jnp.stack([st_buffers[li][name] for li in active])
                for name in QUANTIZABLE_PROJS
            }

    b, t = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = jnp.take(params["embed"], input_ids, axis=0)
    if cfg.gemma_norm:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)

    use_st = bool(st_stack)

    def _proj_apply(x, codes, cbs, scales, bias, st_arr, li):
        """One projection, dequant + (masked) ST correction + MATMUL, as one
        checkpointed unit (remat="dequant"). The matmul must live INSIDE the
        checkpoint: a dense weight returned from it would still be the
        matmul's saved residual, which the scan stacks over layers —
        measured 28.5 GB of bf16[32,11008,4096] stacks at L=32. With the
        matmul inside, the residuals are the checkpoint INPUTS (the
        activation + the scan's own codes/codebook slices), and the backward
        re-dequantizes. dL/d(st window) still flows — straight-through."""
        w = dequantize_weight(
            AqlmWeight(codes=codes, codebooks=cbs, scales=scales,
                       bias=None, scheme=scheme),
            dtype=compute_dtype,
        )
        if use_st:
            pos = jnp.clip(li - start, 0, win - 1)
            in_win = ((li >= start) & (li < start + win)).astype(jnp.float32)
            stw = jax.lax.dynamic_index_in_dim(st_arr, pos, keepdims=False)
            corr = (stw - jax.lax.stop_gradient(stw)) * in_win
            w = (w.astype(jnp.float32) + corr).astype(compute_dtype)
        y = jnp.einsum(
            "...i,oi->...o", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    if remat == "dequant":
        _proj_apply = jax.checkpoint(_proj_apply)

    manual_fns = {}
    if remat == "manual":
        if dequant_impl == "auto":
            from aqlm_tpu.ops.kernels import should_interpret

            kernel_ok = (
                scheme.nbits_per_codebook <= 8
                and scheme.out_group_size == 1
                # per-group scales ([OG, IG], scale_nbits>0): the kernel
                # epilogue + _dq_grads assume [OUT] scales — fall back to xla
                and all(
                    l0[name].scales.ndim == 1 for name in QUANTIZABLE_PROJS
                )
            )
            dequant_impl = "kernel" if (kernel_ok and not should_interpret()) else "xla"
        start_arr = jnp.asarray(start, jnp.int32)
        for name in QUANTIZABLE_PROJS:
            manual_fns[name] = _make_manual_st_proj(
                scheme, compute_dtype, use_st and name in st_stack, win,
                has_bias=name in bias_stack, dequant_impl=dequant_impl,
            )

    class _FnLinear:
        """Weightless linear consumed by apply_linear (models/common.py):
        exists only inside the body trace, so no pytree registration."""

        bias = None

        def __init__(self, fn):
            self.apply = fn

    def body(x, xs):
        codes_l, cb_l, sc_l, bias_l, norms_l, li = xs
        layer = {
            "input_norm": norms_l["input_norm"],
            "post_attn_norm": norms_l["post_attn_norm"],
        }
        for name in QUANTIZABLE_PROJS:
            if remat == "manual":
                # custom_vjp takes positional args only; bind via defaults
                layer[name] = _FnLinear(lambda x, _f=manual_fns[name],
                                        _c=codes_l[name], _b=cb_l[name],
                                        _s=sc_l[name], _bi=bias_l.get(name),
                                        _st=(st_stack[name]
                                             if (use_st and name in st_stack)
                                             else None),
                                        _li=li:
                                        _f(x, _c, _b, _s, _bi, _st, _li, start_arr))
            else:
                layer[name] = _FnLinear(partial(
                    _proj_apply,
                    codes=codes_l[name], cbs=cb_l[name], scales=sc_l[name],
                    bias=bias_l.get(name),
                    st_arr=st_stack[name] if use_st else None, li=li,
                ))
        import os as _os

        no_glue = bool(_os.environ.get("AQLM_PV_NO_REMAT_GLUE"))
        out, _ = llama._block(
            x, layer, cfg, positions, None, None, None,
            # recompute-in-backward attention + silu glue: without these the
            # scan stacks [L,B,Hkv,rep,T,T] attention probs and three
            # [L,B,T,inter] f32 glue residuals (the L=32/T=512 OOM).
            # AQLM_PV_NO_REMAT_GLUE=1 disables them (on-chip fault bisection)
            attention_fn=None if no_glue else _attention_remat,
            act_mul_fn=None if no_glue else _silu_mul_remat,
        )
        return out, None

    xs = (
        codes_stack, cb_stack, sc_stack, bias_stack, norm_stack,
        jnp.arange(len(layers)),
    )
    scan_body = jax.checkpoint(body) if remat == "block" else body
    # SEGMENTED scan: chained lax.scans of <= segment_layers each instead of
    # one L-long scan. The r4 on-chip ladder faults the v5e in the scan
    # BACKWARD at L>=16 at 7B widths under every remat mode, while L=8
    # passes — segmenting keeps each transposed loop at the proven depth.
    # Segment boundaries only pass the [B,T,H] activation, so the cost is
    # zero; identical math (equality-tested vs the unrolled path).
    L = len(layers)
    seg = max(1, min(segment_layers, L)) if segment_layers else L
    for s0 in range(0, L, seg):
        s1 = min(s0 + seg, L)
        xs_seg = jax.tree.map(lambda a: a[s0:s1], xs)
        x, _ = jax.lax.scan(scan_body, x, xs_seg)
    return llama.rms_norm(x, params["final_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)


def init_pv_state(
    params: dict,
    cont_opt: optax.GradientTransformation,
    st_opt: optax.GradientTransformation,
    *,
    active_layers=None,
) -> PVState:
    trainable, frozen = split_trainable(params)
    st = _st_init(params, active_layers)
    return PVState(
        trainable=trainable,
        frozen=frozen,
        st_buffers=st,
        cont_opt_state=cont_opt.init(trainable),
        st_opt_state=st_opt.init(st),
        step=jnp.zeros((), jnp.int32),
    )


def _head_and_embed(params):
    head = params.get("lm_head")
    if head is not None:
        return head.weight, None
    return None, params["embed"]


def make_pv_step(
    student_cfg: llama.ModelConfig,
    teacher_cfg: llama.ModelConfig,
    pv: PVConfig,
    *,
    forward_fn=llama.forward,
    cont_opt: optax.GradientTransformation | None = None,
    st_opt: optax.GradientTransformation | None = None,
    teacher_kind: str = "params",
) -> PVStepFns:
    """Build the PV step functions (see PVStepFns).

    teacher_kind="params": `teacher` is a params pytree, forwarded in-step.
    teacher_kind="hidden": `teacher` is a dict {hidden [B,T,H], head [V,H]
      or None, embed (for tied heads) or None} precomputed outside the step
      (pv.teacher.stream_teacher_hidden) — the teacher never resides in HBM.

    cont_opt/st_opt override the default AdamW/Adam (e.g. with
    configurable_adamw for Lamb/AMSGrad/reduced-precision moments); the same
    transformations must be passed to init_pv_state.
    """
    assert teacher_kind in ("params", "hidden"), teacher_kind
    cont_opt = cont_opt or optax.adamw(pv.lr, b1=0.9, b2=0.95)
    st_opt = st_opt or optax.adam(pv.code_lr, b1=0.9, b2=0.95)

    assert not (pv.scan_blocks and not pv.chunk_tokens), (
        "scan_blocks requires the chunked loss (chunk_tokens > 0)"
    )

    def loss_fn(trainable, st, frozen, teacher, input_ids, mask, window_start=None):
        params = merge_trainable(trainable, frozen)
        if pv.chunk_tokens:
            if pv.scan_blocks:
                eff = params
                s_hidden = scanned_student_hidden(
                    params, st, student_cfg, input_ids, window_start,
                    remat=pv.scan_remat,
                    segment_layers=pv.scan_segment_layers,
                    dequant_impl=pv.scan_dequant,
                )
            else:
                eff = materialize_st_params(params, st)
                s_hidden, _ = forward_fn(
                    eff, student_cfg, input_ids,
                    return_hidden=True, remat_blocks=pv.remat_blocks,
                )
            if teacher_kind == "hidden":
                t_hidden = teacher["hidden"]
                t_head, t_embed = teacher.get("head"), teacher.get("embed")
            else:
                t_hidden, _ = forward_fn(teacher, teacher_cfg, input_ids, return_hidden=True)
                t_head, t_embed = _head_and_embed(teacher)
            s_head, s_embed = _head_and_embed(eff)
            return chunked_kl_loss(
                s_hidden, jax.lax.stop_gradient(t_hidden), s_head, t_head,
                student_embed=s_embed, teacher_embed=t_embed, mask=mask,
                chunk_tokens=pv.chunk_tokens, softcap=student_cfg.logit_softcap,
                logit_scale=getattr(student_cfg, "logit_scale", None),
            )
        assert teacher_kind == "params", "full-logit KL needs teacher params"
        eff = materialize_st_params(params, st)
        student_logits, _ = forward_fn(
            eff, student_cfg, input_ids, remat_blocks=pv.remat_blocks
        )
        teacher_logits, _ = forward_fn(teacher, teacher_cfg, input_ids)
        return kl_divergence_loss(student_logits, jax.lax.stop_gradient(teacher_logits), mask)

    def grad_fn(state: PVState, teacher, input_ids, mask=None, window_start=None):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.trainable, state.st_buffers, state.frozen, teacher, input_ids,
            mask, window_start,
        )
        return loss, grads

    def apply_fn(state: PVState, grads, scale=1.0):
        g_tr, g_st = jax.tree.map(lambda g: g * scale, grads)
        upd_tr, cont_opt_state = cont_opt.update(g_tr, state.cont_opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, upd_tr)
        upd_st, st_opt_state = st_opt.update(g_st, state.st_opt_state, state.st_buffers)
        st = optax.apply_updates(state.st_buffers, upd_st)
        return PVState(
            trainable=trainable,
            frozen=state.frozen,
            st_buffers=st,
            cont_opt_state=cont_opt_state,
            st_opt_state=st_opt_state,
            step=state.step + 1,
        )

    def grad_step(state: PVState, teacher, input_ids, mask=None, window_start=None):
        loss, grads = grad_fn(state, teacher, input_ids, mask, window_start)
        return apply_fn(state, grads), loss

    def code_step(state: PVState, key: jax.Array, active=None) -> PVState:
        return pv_code_update(state, pv, key, active=active)

    return PVStepFns(grad_step, code_step, grad_fn, apply_fn)


def pv_code_update(state: PVState, pv: PVConfig, key: jax.Array, active=None) -> PVState:
    """The V step: beam-search codes toward each ST buffer, then delta-mix.

    st_buffers may be the per-layer list (active = layers with entries) or the
    windowed stack {proj: [W, out, in]} — then `active` (window slot -> layer
    index) must be given.
    """
    params = merge_trainable(state.trainable, state.frozen)
    if isinstance(state.st_buffers, dict):
        assert active is not None, "windowed st_buffers need the active layer indices"
        st_list = [
            {name: stack[active.index(li)] for name, stack in state.st_buffers.items()}
            if li in active else {}
            for li in range(len(params["layers"]))
        ]
    else:
        st_list = state.st_buffers
    new_frozen = jax.tree.map(lambda x: x, state.frozen, is_leaf=lambda x: x is None)
    new_st = []
    for li, (layer, bufs) in enumerate(zip(params["layers"], st_list)):
        entry = {}
        for name, st in bufs.items():
            q: QuantizedLinear = layer[name]
            key, sub = jax.random.split(key)
            new_codes = beam_search_optimal_codes_l2(
                st,
                q.codebooks,
                q.codes,
                q.scales,
                beam_size=pv.beam_size,
                stochastic_rounding_tau=pv.stochastic_rounding_tau,
                force_update=pv.force_code_update,
                max_update_fraction=pv.max_code_change_per_step,
                code_selection_temperature=pv.code_selection_temperature,
                trust_ratio=pv.code_trust_ratio,
                key=sub,
            )
            new_frozen["layers"][li][name] = dataclasses.replace(
                new_frozen["layers"][li][name], codes=new_codes
            )
            if pv.delta_decay != 0:
                w_new = dequantize_weight(
                    AqlmWeight(
                        codes=new_codes, codebooks=q.codebooks, scales=q.scales,
                        bias=None, scheme=q.scheme,
                    ),
                    dtype=jnp.float32,
                )
                st = pv.delta_decay * w_new + (1.0 - pv.delta_decay) * st
            entry[name] = st
        new_st.append(entry)
    if isinstance(state.st_buffers, dict):  # restore the windowed stack form
        new_st = {
            name: jnp.stack([new_st[li][name] for li in active])
            for name in state.st_buffers
        }
    return PVState(
        trainable=state.trainable,
        frozen=new_frozen,
        st_buffers=new_st,
        cont_opt_state=state.cont_opt_state,
        st_opt_state=state.st_opt_state,
        step=state.step,
    )
