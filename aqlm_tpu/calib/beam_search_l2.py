"""Beam search minimizing ||W_ref - W_q||^2 over codes — the PV-tuning update.

TPU-native redesign of /root/reference/src/beam_search_l2.py:14-291. Same
semantics: every (out_group, in_group) tile is an independent group whose
`num_codebooks` codes are re-optimized by a beam sweep over codebooks, with
the PV-tuning constraint toolkit:

- `stochastic_rounding_tau`: probabilistic pick between adjacent-ranked
  candidates (:39-42, :239-248);
- `force_update`: guarantee the returned code differs from the input (:44-46,
  :262-267);
- `max_update_fraction`: only the top-fraction of groups (by residual norm)
  may update (:47-52);
- `code_selection_temperature`: sample (Gumbel top-k) instead of taking the
  largest-residual groups (:53-55);
- `trust_ratio`: admit changes ordered by importance until the cumulative
  weight change exceeds trust_ratio * ||W_prev|| (:56-62, :147-164).

Everything is a single jitted program: group chunking via `lax.map`, beam
reordering via `take_along_axis`, the trust-region cut via a rank mask
instead of dynamic truncation (same result, static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.calib.beam_search_xtx import _SCORE_S_BLOCK

__all__ = ["beam_search_optimal_codes_l2", "find_optimal_codebooks"]


def _dequant_groups(codes, flat_cbs, S):
    """codes [G, K] int32, flat_cbs [K*S, gsz] -> [G, gsz] sum over codebooks.

    Per-codebook TPU-safe row gathers (calib/kmeans._take_rows_safe): the
    single [G*K]-index jnp.take is the broadcast-index gather class that
    crashes the v5e worker at millions of indices (dequant_crash_probe)."""
    from aqlm_tpu.calib.kmeans import _take_rows_safe

    K = codes.shape[1]
    acc = None
    for k in range(K):
        part = _take_rows_safe(flat_cbs[k * S : (k + 1) * S], codes[:, k])
        acc = part if acc is None else acc + part
    return acc


def _beam_update_codes(
    ref: jax.Array,  # [G, gsz] unscaled reference groups
    cbs: jax.Array,  # [K, S, gsz]
    codes: jax.Array,  # [G, K] int32
    *,
    beam_size: int,
    stochastic_rounding_tau: float,
    force_update: bool,
    dim_order: jax.Array,  # [K] int32 visit order
    key: jax.Array,
    group_chunk: int,
):
    """Beam sweep over codebooks for every group; returns new codes [G, K]."""
    K, S, gsz = cbs.shape
    G = ref.shape[0]
    B = beam_size
    need_two = force_update or stochastic_rounding_tau > 0
    if need_two:
        B = max(B, 2)

    flat_cbs = cbs.reshape(K * S, gsz)
    cb_norms = jnp.sum(cbs * cbs, axis=-1)  # [K, S]

    beam_codes = jnp.broadcast_to(codes[:, None, :], (G, B, K)).astype(jnp.int32)
    deq0 = _dequant_groups(codes, flat_cbs, S)
    residue = jnp.broadcast_to((ref - deq0)[:, None, :], (G, B, gsz))

    n_chunks = -(-G // group_chunk)
    pad_g = n_chunks * group_chunk

    def pad(x):
        return jnp.pad(x, [(0, pad_g - G)] + [(0, 0)] * (x.ndim - 1))

    n_extra = 1 if stochastic_rounding_tau > 0 else 0
    kb = B + n_extra  # candidates kept per step before stochastic selection

    def step(carry, scan_in):
        beam_codes, residue = carry
        k, step_i, step_key = scan_in
        cb_k = jax.lax.dynamic_index_in_dim(cbs, k, axis=0, keepdims=False)  # [S, gsz]
        norms_k = jax.lax.dynamic_index_in_dim(cb_norms, k, axis=0, keepdims=False)  # [S]

        codes_k = jnp.take_along_axis(
            beam_codes, jnp.broadcast_to(k, (G, B))[:, :, None], axis=2
        )[:, :, 0]  # [G, B]
        # residue with codebook k's current contribution added back
        res_plus = residue + jnp.take(cb_k, codes_k, axis=0)
        res_norms = jnp.sum(res_plus * res_plus, axis=-1)  # [G, B]

        dup_penalty = jnp.where((step_i == 0) & (jnp.arange(B) > 0), jnp.inf, 0.0)

        def _blk_scores(rp, rn, cb_b, norms_b):
            dots = jnp.einsum("gbd,sd->gbs", rp, cb_b)
            return (
                rn[:, :, None] - 2.0 * dots + norms_b[None, None, :]
                + dup_penalty[None, :, None]
            )

        def score_chunk(args):
            rp, rn = args  # [gc, B, gsz], [gc, B]
            if S <= _SCORE_S_BLOCK:
                scores = _blk_scores(rp, rn, cb_k, norms_k)
                neg_vals, idx = jax.lax.top_k(-scores.reshape(-1, B * S), kb)
                return -neg_vals, idx.astype(jnp.int32)  # [gc, kb] ascending loss
            # candidate axis blocked with a streaming top-k merge — one
            # [gc, B*65536] scores/top_k program crashes the v5e worker
            # (kmeans_crash_probe variant B); carry-first concat keeps the
            # single-program tie order (earlier candidate wins)
            sb = _SCORE_S_BLOCK
            nb = -(-S // sb)
            sp = nb * sb
            cb_pad = jnp.pad(cb_k, ((0, sp - S), (0, 0)))
            norms_pad = jnp.pad(norms_k, (0, sp - S), constant_values=jnp.inf)
            gc = rp.shape[0]

            def blk(carry, xs):
                bv, bi = carry  # [gc, kb] best vals + GLOBAL flat (b*S+s)
                cb_b, nm_b, base = xs
                scores = _blk_scores(rp, rn, cb_b, nm_b)
                nv, fi = jax.lax.top_k(-scores.reshape(-1, B * sb), kb)
                fi = fi.astype(jnp.int32)
                gflat = (fi // sb) * S + base + (fi % sb)
                allv = jnp.concatenate([bv, -nv], axis=1)
                alli = jnp.concatenate([bi, gflat], axis=1)
                nv2, sel = jax.lax.top_k(-allv, kb)
                return (-nv2, jnp.take_along_axis(alli, sel, axis=1)), None

            init = (
                jnp.full((gc, kb), jnp.inf, jnp.float32),
                jnp.zeros((gc, kb), jnp.int32),
            )
            (vals, idx), _ = jax.lax.scan(
                blk, init,
                (cb_pad.reshape(nb, sb, gsz), norms_pad.reshape(nb, sb),
                 jnp.arange(nb, dtype=jnp.int32) * sb),
            )
            return vals, idx

        vals, flat_idx = jax.lax.map(
            score_chunk,
            (
                pad(res_plus).reshape(n_chunks, group_chunk, B, gsz),
                pad(res_norms).reshape(n_chunks, group_chunk, B),
            ),
        )
        vals = vals.reshape(pad_g, kb)[:G]
        flat_idx = flat_idx.reshape(pad_g, kb)[:G]

        if stochastic_rounding_tau > 0:
            # probabilistic choice between adjacent-ranked candidates
            # (reference beam_search_l2.py:239-248)
            errors = jnp.sqrt(jnp.maximum(vals, 0.0))
            w = jnp.power(errors / jnp.maximum(errors.sum(-1, keepdims=True), 1e-30), -1.0 / stochastic_rounding_tau)
            keep_prob = w[:, :-1] / (w[:, :-1] + w[:, 1:])
            keep_prob = jnp.where(jnp.isinf(w[:, :-1]), 1.0, keep_prob)
            u = jax.random.uniform(step_key, keep_prob.shape)
            flat_idx = jnp.where(u <= keep_prob, flat_idx[:, :-1], flat_idx[:, 1:])

        flat_idx = flat_idx[:, :B]
        src = flat_idx // S
        new_code = flat_idx % S

        gathered = jnp.take_along_axis(beam_codes, src[:, :, None], axis=1)
        new_beam_codes = jnp.where(
            (jnp.arange(K)[None, None, :] == k), new_code[:, :, None], gathered
        )
        new_res = jnp.take_along_axis(res_plus, src[:, :, None], axis=1) - jnp.take(
            cb_k, new_code, axis=0
        )
        return (new_beam_codes, new_res), None

    keys = jax.random.split(key, K)
    (beam_codes, _), _ = jax.lax.scan(
        step, (beam_codes, residue), (dim_order, jnp.arange(K, dtype=jnp.int32), keys)
    )

    if force_update:
        best, second = beam_codes[:, 0, :], beam_codes[:, 1, :]
        changed = jnp.any(best != codes, axis=-1, keepdims=True)
        return jnp.where(changed, best, second)
    return beam_codes[:, 0, :]


@partial(
    jax.jit,
    static_argnames=(
        "beam_size",
        "stochastic_rounding_tau",
        "force_update",
        "max_update_fraction",
        "code_selection_temperature",
        "trust_ratio",
        "group_chunk",
    ),
)
def beam_search_optimal_codes_l2(
    reference_weight: jax.Array,
    codebooks: jax.Array,
    prev_codes: jax.Array,
    scales: jax.Array | None,
    *,
    beam_size: int = 1,
    stochastic_rounding_tau: float = 0.0,
    force_update: bool = False,
    max_update_fraction: float = 1.0,
    code_selection_temperature: float = 0.0,
    trust_ratio: float | None = None,
    dim_order: jax.Array | None = None,
    key: jax.Array | None = None,
    group_chunk: int | None = None,
) -> jax.Array:
    """Weight-space beam search with PV constraints; returns new codes.

    Args mirror the reference (/root/reference/src/beam_search_l2.py:14-66);
    reference_weight [out, in], codebooks [K, S, og, ig], prev_codes
    [OG, IG, K], scales [OG] or None.
    """
    assert 0 < max_update_fraction <= 1
    K, S, ogs, igs = codebooks.shape
    OG, IG, K2 = prev_codes.shape
    assert K2 == K
    if group_chunk is None:
        # chunking exists to bound the [chunk, B, S] score tensor; the old
        # fixed 4096 made the 7B V step a serial lax.map of ~1370 tiny
        # launches per codebook (launch-bound, ~12 s/projection on the v5e).
        # Budget ~2^25 score elements (~134 MB f32) and let big-G cases run
        # tens of chunks instead of thousands.
        b_eff = max(beam_size, 2 if (force_update or stochastic_rounding_tau > 0) else 1)
        group_chunk = max(512, 2 ** 25 // max(b_eff * S, 1))
    if key is None:
        key = jax.random.PRNGKey(0)
    if dim_order is None:
        dim_order = jnp.arange(K, dtype=jnp.int32)

    W = reference_weight.astype(jnp.float32)
    groups = W.reshape(OG, ogs, IG, igs).transpose(0, 2, 1, 3)  # [OG, IG, ogs, igs]
    if scales is not None:
        # [OG] or [OG, IG] scales (scale_nbits>0 mode)
        sc2 = (
            jnp.broadcast_to(scales.reshape(OG, 1).astype(jnp.float32), (OG, IG))
            if scales.ndim == 1
            else scales.astype(jnp.float32)
        )
        groups = groups / sc2[:, :, None, None]
    ref = groups.reshape(OG * IG, ogs * igs)
    flat_codes = prev_codes.reshape(OG * IG, K).astype(jnp.int32)
    cbs = codebooks.reshape(K, S, ogs * igs).astype(jnp.float32)
    flat_cbs = cbs.reshape(K * S, ogs * igs)
    G = OG * IG

    need_selection = max_update_fraction < 1 or trust_ratio is not None
    if need_selection:
        deq_prev = _dequant_groups(flat_codes, flat_cbs, S)  # unscaled [G, gsz]
        # groupwise squared norms of (ref - dequant); scales cancel since both
        # sides are unscaled here, and the reference computes them on scaled
        # weights — ordering is affected by scales, so re-apply them
        scale_sq = (
            jnp.ones((G,), jnp.float32) if scales is None else (sc2 ** 2).reshape(G)
        )
        diff_norms = jnp.sum((ref - deq_prev) ** 2, axis=-1) * scale_sq  # [G]
        n_update = int(-(-max_update_fraction * G // 1))  # ceil
        if code_selection_temperature > 0:
            # Gumbel top-k == sampling w/o replacement proportional to
            # norms^(0.5/temperature) (reference :126-131)
            logits = (0.5 / code_selection_temperature) * jnp.log(jnp.maximum(diff_norms, 1e-30))
            key, gk = jax.random.split(key)
            gumbel = jax.random.gumbel(gk, (G,))
            _, sel = jax.lax.top_k(logits + gumbel, n_update)
        else:
            _, sel = jax.lax.top_k(diff_norms, n_update)  # sorted most important first
    else:
        sel = None
        n_update = G

    if sel is None:
        new_flat = _beam_update_codes(
            ref, cbs, flat_codes,
            beam_size=beam_size, stochastic_rounding_tau=stochastic_rounding_tau,
            force_update=force_update, dim_order=dim_order, key=key,
            group_chunk=min(group_chunk, G),
        )
    else:
        upd = _beam_update_codes(
            ref[sel], cbs, flat_codes[sel],
            beam_size=beam_size, stochastic_rounding_tau=stochastic_rounding_tau,
            force_update=force_update, dim_order=dim_order, key=key,
            group_chunk=min(group_chunk, n_update),
        )
        new_flat = flat_codes.at[sel].set(upd)

    if trust_ratio is not None:
        # order candidate changes most-important-first; admit while the
        # cumulative change norm stays within trust_ratio * ||W_prev||
        # (reference :147-164). Same scale handling as the reference: norms
        # are measured on the scaled weights.
        deq_new = _dequant_groups(new_flat, flat_cbs, S)
        change_norms = jnp.sum((deq_new - deq_prev) ** 2, axis=-1) * scale_sq  # [G]
        ordered = change_norms[sel]  # [n_update] in importance order
        cum = jnp.sqrt(jnp.cumsum(ordered))
        prev_norm = jnp.sqrt(jnp.sum((deq_prev ** 2) * scale_sq[:, None]))  # ||W_prev|| on scaled weights
        n_selected = 1 + jnp.searchsorted(cum, trust_ratio * prev_norm, side="left")
        admit = jnp.arange(n_update) < n_selected  # [n_update] rank mask
        keep_upd = jnp.where(admit[:, None], new_flat[sel], flat_codes[sel])
        new_flat = flat_codes.at[sel].set(keep_upd)

    return new_flat.reshape(OG, IG, K).astype(prev_codes.dtype)


def find_optimal_codebooks(
    reference: jax.Array, codebooks: jax.Array, codes: jax.Array
) -> jax.Array:
    """Least-squares codebook refit from code co-occurrence statistics.

    Reference: _find_optimal_codebooks (/root/reference/src/beam_search_l2.py:294-325).
    reference [G, gsz], codebooks [K, S, gsz], codes [G, K].
    """
    K, S, gsz = codebooks.shape
    G = codes.shape[0]
    offsets = (jnp.arange(K) * S)[None, :]
    flat = (codes.astype(jnp.int32) + offsets).reshape(-1)  # [G*K]
    rows = jnp.repeat(jnp.arange(G), K)
    onehot = jnp.zeros((G, K * S), jnp.float32).at[rows, flat].add(1.0)
    cooc = onehot.T @ onehot
    rhs = onehot.T @ reference.astype(jnp.float32)
    diag = jnp.clip(jnp.diag(cooc), 1.0, None)
    cooc = cooc.at[jnp.arange(K * S), jnp.arange(K * S)].set(diag)
    sol = jnp.linalg.lstsq(cooc, rhs)[0]
    return sol.reshape(K, S, gsz)
