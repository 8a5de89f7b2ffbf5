"""Beam search minimizing ||X @ W_ref^T - X @ W_q^T||^2 over discrete codes.

TPU-native redesign of the reference's activation-MSE beam search
(/root/reference/src/beam_search_xtx.py:13-345). Semantics match:
- out groups are independent -> beam search runs vectorized over all of them;
- double loop over (in_group x codebook) positions, each step scoring every
  codebook entry as a replacement and keeping the `beam_size` best joint
  hypotheses per out group (loss bookkeeping identical to the reference's
  square-of-difference expansion, beam_search_xtx.py:179-190).

Architectural difference (the TPU-first part): the reference re-dequantizes
the full beam weights and multiplies by XTX at every step
(beam_search_xtx.py:217-221 and the noted inefficiency at :343-344). Here the
carry maintains R = (W_ref - W_beam) @ XTX and applies a rank-`g` incremental
update per step — O(out*g*in) instead of O(out*in^2) FLOPs — and the whole
sweep is one `lax.scan` of static-shape einsums + `top_k`, so XLA compiles a
single fused program instead of relaunching kernels per position.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["beam_search_optimal_codes", "channelwise_squared_error"]


def channelwise_squared_error(XTX: jax.Array, weight: jax.Array, reference_weight: jax.Array):
    """Per-output-channel ||X w - X w_ref||^2 (reference beam_search_xtx.py:349-361)."""
    resid = (weight - reference_weight).astype(jnp.float32)
    return jnp.sum((resid @ XTX.astype(jnp.float32)) * resid, axis=-1)


def _topk_smallest(x: jax.Array, k: int):
    """(values, indices) of the k smallest entries along the last axis."""
    neg_vals, idx = jax.lax.top_k(-x, k)
    return -neg_vals, idx


# widest single scores/argmax/top_k program allowed on the candidate axis;
# wider one-shot programs crash the v5e worker after ~tens of executions
# (experiments/kmeans_crash_probe variant B)
_SCORE_S_BLOCK = 8192


@partial(jax.jit, static_argnames=("beam_size", "out_chunk"))
def beam_search_optimal_codes(
    XTX: jax.Array,
    reference_weight: jax.Array,
    codebooks: jax.Array,
    prev_codes: jax.Array,
    scales: jax.Array | None,
    *,
    beam_size: int = 8,
    steps_order: jax.Array | None = None,
    out_chunk: int = 2048,
):
    """Find better codes for one weight matrix under the activation MSE.

    Args:
      XTX: [in, in] f32 — X^T X of calibration inputs (may be /nsamples).
      reference_weight: [out, in] — target weight.
      codebooks: [K, S, og, g] (any out_group_size).
      prev_codes: [OG, IG, K] integer codes to improve (OG = out // og).
      scales: [OG] per-out-group, [OG, IG] per-group (scale_nbits>0), or None.
      beam_size: hypotheses kept per out group.
      steps_order: [IG*K, 2] int32 (ig, k) visit order; natural order if None.
      out_chunk: out groups scored per inner map step (memory knob; out
        groups are independent — also the natural TP shard axis, SURVEY §2.3).

    Returns:
      (codes [OG, IG, K] same dtype as prev_codes, final per-group losses [OG]).
    """
    K, S, og, g = codebooks.shape
    OG, IG, K2 = prev_codes.shape
    assert K2 == K
    out = OG * og
    in_features = IG * g
    B = beam_size

    XTX = XTX.astype(jnp.float32)
    W = reference_weight.astype(jnp.float32)
    cbs = codebooks.astype(jnp.float32)  # [K, S, og, g]
    # scales: None, [OG] or [OG, IG] (scale_nbits>0 mode; the reference
    # indexes them per input group, beam_search_xtx.py:199-200)
    if scales is None:
        sc_full = jnp.ones((OG, IG), jnp.float32)
    elif scales.ndim == 1:
        sc_full = jnp.broadcast_to(scales.reshape(OG, 1).astype(jnp.float32), (OG, IG))
    else:
        sc_full = scales.astype(jnp.float32)

    codes0 = prev_codes.astype(jnp.int32)

    # initial dequantized weight and residual products
    def dequant(codes):  # [OG, IG, K] -> [out, in]
        # per-codebook TPU-safe row gathers: the fused [OG*IG*K]-index
        # jnp.take is the broadcast-index gather class that crashes the v5e
        # worker at 7B scale (dequant_crash_probe; the r5 full-scale 1x16
        # calibration died in exactly this position)
        from aqlm_tpu.calib.kmeans import _take_rows_safe

        flat = cbs.reshape(K, S, og * g)
        acc = None
        for k in range(K):
            part = _take_rows_safe(flat[k], codes[:, :, k].reshape(-1))
            acc = part if acc is None else acc + part
        parts = acc.reshape(OG, IG, og, g) * sc_full[:, :, None, None]
        return parts.transpose(0, 2, 1, 3).reshape(out, in_features)

    resid0 = W - dequant(codes0)
    RXTX0 = resid0 @ XTX  # [out, in]
    losses0 = jnp.sum(RXTX0 * resid0, axis=-1).reshape(OG, og).sum(-1)  # [OG]

    beam_codes = jnp.broadcast_to(codes0[None], (B, OG, IG, K)).astype(jnp.int32)
    beam_RXTX = jnp.broadcast_to(RXTX0[None], (B, out, in_features)).astype(jnp.float32)
    beam_losses = jnp.broadcast_to(losses0[None], (B, OG)).astype(jnp.float32)

    if steps_order is None:
        ig_seq = jnp.repeat(jnp.arange(IG, dtype=jnp.int32), K)
        k_seq = jnp.tile(jnp.arange(K, dtype=jnp.int32), IG)
        steps_order = jnp.stack([ig_seq, k_seq], axis=1)

    n_chunks = -(-OG // out_chunk)
    pad_og = n_chunks * out_chunk

    def pad_groups(x):
        return jnp.pad(x, [(0, pad_og - OG)] + [(0, 0)] * (x.ndim - 1))

    def step(carry, step_and_idx):
        beam_codes, beam_RXTX, beam_losses = carry
        (ig, k), step_i = step_and_idx
        sl = ig * g
        sc = jax.lax.dynamic_slice(sc_full, (0, ig), (OG, 1)).reshape(OG)

        XTX_cols = jax.lax.dynamic_slice(XTX, (0, sl), (in_features, g))  # [in, g]
        XTX_gg = jax.lax.dynamic_slice(XTX, (sl, sl), (g, g))
        cb = jax.lax.dynamic_index_in_dim(cbs, k, axis=0, keepdims=False)  # [S, og, g]

        prev_code = jax.lax.dynamic_slice(
            beam_codes, (0, 0, ig, k), (B, OG, 1, 1)
        ).reshape(B, OG)
        prev_deq = jnp.take(cb, prev_code, axis=0)  # [B, OG, og, g] unscaled
        RXTX_sl = jax.lax.dynamic_slice(beam_RXTX, (0, 0, sl), (B, out, g)).reshape(
            B, OG, og, g
        )

        # dWTXTXg = (resid + scaled prev part embedded) @ XTX[:, slice];
        # rows of a group only couple through the loss sum, so everything is
        # row-wise with a final sum over the og axis
        prev_x = jnp.einsum("boyg,gh->boyh", prev_deq, XTX_gg)
        dwx = RXTX_sl + sc[None, :, None, None] * prev_x

        cand_norm = jnp.einsum("syg,gh,syh->s", cb, XTX_gg, cb)  # [S]
        old_norm = jnp.einsum("boyh,boyh->bo", prev_x, prev_deq)
        prev_dot = jnp.einsum("boyg,boyg->bo", prev_deq, dwx)

        # mask duplicate hypotheses: at step 0 every beam is identical, so
        # only beam 0 may contribute candidates (reference grows the beam
        # from size 1 instead, beam_search_xtx.py:71-74)
        dup_penalty = jnp.where(
            (step_i == 0) & (jnp.arange(B) > 0), jnp.inf, 0.0
        )  # [B]

        # score all candidates, chunked over out groups to bound [groups, S]
        dwx_p = pad_groups(dwx.transpose(1, 0, 2, 3)).reshape(n_chunks, out_chunk, B, og, g)
        base_p = pad_groups(
            (beam_losses + 2.0 * sc[None, :] * prev_dot - sc[None, :] ** 2 * old_norm).T
        ).reshape(n_chunks, out_chunk, B)
        sc_p = pad_groups(sc).reshape(n_chunks, out_chunk)

        def _cand_scores(dwx_c, base_c, sc_c, cb_blk, norm_blk):
            cand_dot = jnp.einsum("obyg,syg->obs", dwx_c, cb_blk)
            return (
                base_c[:, :, None]
                - 2.0 * sc_c[:, None, None] * cand_dot
                + (sc_c[:, None] ** 2)[:, :, None] * norm_blk[None, None, :]
                + dup_penalty[None, :, None]
            )

        def score_chunk(args):
            dwx_c, base_c, sc_c = args  # [oc, B, og, g], [oc, B], [oc]
            if S <= _SCORE_S_BLOCK:
                cand = _cand_scores(dwx_c, base_c, sc_c, cb, cand_norm)
                # top beam_size over (B*S) joint candidates per out group
                vals, flat_idx = _topk_smallest(cand.reshape(out_chunk, B * S), B)
                return vals, flat_idx.astype(jnp.int32)  # [oc, B]
            # candidate axis blocked with a streaming top-k merge: a single
            # [oc, B*65536] score+top_k program is the op class that crashes
            # the v5e worker after ~tens of executions (kmeans_crash_probe
            # variant B — the wide scores/reduction, not a gather). The
            # carry-first concat keeps earlier blocks preferred on ties,
            # matching the single-program first-minimum.
            sb = _SCORE_S_BLOCK
            nb = -(-S // sb)
            sp = nb * sb
            cb_p = jnp.pad(cb, ((0, sp - S), (0, 0), (0, 0)))
            norm_p = jnp.pad(cand_norm, (0, sp - S), constant_values=jnp.inf)
            cb_blocks = cb_p.reshape(nb, sb, og, g)
            norm_blocks = norm_p.reshape(nb, sb)
            bases = jnp.arange(nb, dtype=jnp.int32) * sb

            def blk(carry, xs):
                bv, bi = carry  # [oc, B] best vals + GLOBAL flat (b*S+s) idx
                cb_b, cn_b, base = xs
                cand = _cand_scores(dwx_c, base_c, sc_c, cb_b, cn_b)
                v, fi = _topk_smallest(cand.reshape(out_chunk, B * sb), B)
                fi = fi.astype(jnp.int32)
                gflat = (fi // sb) * S + base + (fi % sb)
                allv = jnp.concatenate([bv, v], axis=1)
                alli = jnp.concatenate([bi, gflat], axis=1)
                v2, sel = _topk_smallest(allv, B)
                return (v2, jnp.take_along_axis(alli, sel, axis=1)), None

            init = (
                jnp.full((out_chunk, B), jnp.inf, jnp.float32),
                jnp.zeros((out_chunk, B), jnp.int32),
            )
            (vals, flat_idx), _ = jax.lax.scan(
                blk, init, (cb_blocks, norm_blocks, bases)
            )
            return vals, flat_idx

        vals, flat_idx = jax.lax.map(score_chunk, (dwx_p, base_p, sc_p))
        new_losses = vals.reshape(pad_og, B)[:OG].T  # [B, OG]
        flat_idx = flat_idx.reshape(pad_og, B)[:OG].T  # [B, OG]
        src_beam = flat_idx // S  # [B, OG]
        new_code = flat_idx % S  # [B, OG]

        # reorder beam per out group and write the chosen code
        gathered_codes = jnp.take_along_axis(
            beam_codes, src_beam[:, :, None, None], axis=0
        )
        new_beam_codes = jax.lax.dynamic_update_slice(
            gathered_codes, new_code[:, :, None, None].astype(jnp.int32), (0, 0, ig, k)
        )

        old_deq_src = jnp.take_along_axis(prev_deq, src_beam[:, :, None, None], axis=0)
        delta = (jnp.take(cb, new_code, axis=0) - old_deq_src) * sc[None, :, None, None]
        delta_rows = delta.reshape(B, out, g)
        src_rows = jnp.repeat(src_beam, og, axis=1)  # [B, out]
        gathered_RXTX = jnp.take_along_axis(beam_RXTX, src_rows[:, :, None], axis=0)
        new_beam_RXTX = gathered_RXTX - jnp.einsum("bog,ng->bon", delta_rows, XTX_cols)

        return (new_beam_codes, new_beam_RXTX, new_losses), None

    n_steps = steps_order.shape[0]
    (beam_codes, beam_RXTX, beam_losses), _ = jax.lax.scan(
        step,
        (beam_codes, beam_RXTX, beam_losses),
        (steps_order, jnp.arange(n_steps, dtype=jnp.int32)),
    )

    best = jnp.argmin(beam_losses, axis=0)  # [OG]
    final_codes = jnp.take_along_axis(beam_codes, best[None, :, None, None], axis=0)[0]
    final_losses = jnp.take_along_axis(beam_losses, best[None, :], axis=0)[0]
    return final_codes.astype(prev_codes.dtype), final_losses
