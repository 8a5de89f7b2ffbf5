"""Per-layer calibration engine: XTX capture, k-means init, Adam+beam-search
alternation.

TPU-native rebuild of the reference's AQEngine (/root/reference/aq_engine.py:16-208)
and QuantizedWeight init (/root/reference/src/aq.py:40-115, init_aq_kmeans
:288-355):

- `XTXAccumulator` keeps the running mean of X^T X. The reference accumulates
  in float64 (aq_engine.py:19-25) which TPUs lack natively; we keep a
  float32 Kahan-compensated sum, which preserves ~2x float32 mantissa
  precision across thousands of batches (validated against float64 in tests).
- `init_quantized_weight` = per-out-group scale (row norm, src/aq.py:83-98)
  + residual k-means over codebooks.
- `quantize_weight` alternates `steps_per_epoch` AMSGrad-Adam updates of
  (codebooks, scales) against the activation MSE with beam-search code
  re-assignment per epoch, with the same early-stopping rule
  (aq_engine.py:74-105). The Adam phase is one jitted `lax.scan`; the beam
  search is a second jitted program (discrete updates stay out of the
  differentiable loss, SURVEY.md §7.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.calib.beam_search_xtx import beam_search_optimal_codes
from aqlm_tpu.calib.kmeans import find_nearest_cluster, fit_kmeans
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight

__all__ = ["CalibConfig", "XTXAccumulator", "init_quantized_weight", "compute_mse", "quantize_weight"]

EPS = 1e-9


@dataclasses.dataclass
class CalibConfig:
    """Hyperparameters of per-layer AQ calibration.

    Names and defaults follow the reference CLI (/root/reference/main.py:669-760),
    so configs translate 1:1.
    """

    lr: float = 1e-4
    beam_size: int = 1
    max_epochs: int = 1000
    steps_per_epoch: int = 100
    relative_mse_tolerance: float | None = 0.01
    init_max_iter: int = 100
    init_max_points_per_centroid: int | None = None
    seed: int = 0
    verbose: bool = False
    # second-level quantization (reference src/aq.py:48-50, 142-194)
    scale_nbits: int = 0  # 0 = one 16-bit scale per out group; >0 = per-(out,in)-group
    codebook_value_nbits: int = 16  # <16 = 1-D-kmeans-quantize codebook values
    codebook_value_num_groups: int = 1


# ---------------------------------------------------------------------------
# XTX accumulation
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["total", "comp", "nsamples"],
    meta_fields=[],
)
@dataclasses.dataclass
class XTXAccumulator:
    """Running mean of X^T X with Kahan-compensated f32 accumulation.

    Matches AQEngine.add_batch semantics (/root/reference/aq_engine.py:30-42):
    after any number of add() calls, `mean` equals sum_i x_i x_i^T / nsamples.
    """

    total: jax.Array  # [in, in] f32 — running compensated sum
    comp: jax.Array  # [in, in] f32 — Kahan compensation term
    nsamples: jax.Array  # [] f32

    @staticmethod
    def zeros(in_features: int) -> "XTXAccumulator":
        z = jnp.zeros((in_features, in_features), jnp.float32)
        return XTXAccumulator(total=z, comp=z, nsamples=jnp.zeros((), jnp.float32))

    @jax.jit
    def add(self, inputs: jax.Array) -> "XTXAccumulator":
        """inputs: [..., in_features] — one calibration minibatch."""
        x = inputs.reshape(-1, inputs.shape[-1]).astype(jnp.float32)
        batch_xtx = jax.lax.dot_general(
            x, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y = batch_xtx - self.comp
        t = self.total + y
        comp = (t - self.total) - y
        return XTXAccumulator(total=t, comp=comp, nsamples=self.nsamples + x.shape[0])

    @property
    def mean(self) -> jax.Array:
        return self.total / jnp.maximum(self.nsamples, 1.0)


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def quantize_values_1d_st(values: jax.Array, nbits: int) -> jax.Array:
    """1-D-kmeans-quantize each row of `values` with a straight-through
    gradient (the get_scales/get_codebooks trick, src/aq.py:180-194)."""
    from aqlm_tpu.calib.kmeans import fit_kmeans_1d

    _, _, restored = fit_kmeans_1d(jax.lax.stop_gradient(values), 2 ** nbits)
    return restored + (values - jax.lax.stop_gradient(values))


def effective_codebooks(codebooks: jax.Array, config: "CalibConfig") -> jax.Array:
    """Second-level codebook-value quantization (src/aq.py:142-178)."""
    if config.codebook_value_nbits >= 16:
        return codebooks
    K, S, og, ig = codebooks.shape
    vg = config.codebook_value_num_groups
    rows = (
        codebooks.reshape(K, vg, S // vg, og, ig).transpose(0, 1, 3, 4, 2).reshape(-1, S // vg)
    )
    rows = quantize_values_1d_st(rows, config.codebook_value_nbits)
    return rows.reshape(K, vg, og, ig, S // vg).transpose(0, 1, 4, 2, 3).reshape(K, S, og, ig)


def effective_scales(scales: jax.Array, config: "CalibConfig") -> jax.Array:
    """Quantized group-wise scales w/ straight-through (src/aq.py:180-194).
    Lossless when 2^scale_nbits >= num_in_groups (src/aq.py:89)."""
    if scales.ndim == 1 or config.scale_nbits >= 16:
        return scales
    if 2 ** config.scale_nbits >= scales.shape[1]:
        return scales  # lossless
    return quantize_values_1d_st(scales, config.scale_nbits)


def init_quantized_weight(
    reference_weight: jax.Array,
    scheme: AqlmScheme,
    *,
    key: jax.Array | None = None,
    max_iter: int = 100,
    max_points_per_centroid: int | None = None,
    scale_nbits: int = 0,
) -> AqlmWeight:
    """Scale + residual-k-means initialization of codes and codebooks.

    Mirrors QuantizedWeight.__init__ (src/aq.py:76-115): scales = per-out-group
    row norm (scale_nbits=0) or per-(out,in)-group norm (scale_nbits>0) + eps;
    codebooks fit on the scale-normalized weight residue, one codebook at a
    time (init_aq_kmeans, src/aq.py:288-355).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    out_f, in_f = reference_weight.shape
    scheme.check_features(out_f, in_f)
    og, ig = scheme.out_group_size, scheme.in_group_size
    n_og, n_ig = out_f // og, in_f // ig
    w = reference_weight.astype(jnp.float32)

    groups = w.reshape(n_og, og, n_ig, ig).swapaxes(1, 2)  # [n_og, n_ig, og, ig]
    if scale_nbits > 0:
        scales = jnp.sqrt(jnp.sum(groups.reshape(n_og, n_ig, -1) ** 2, axis=-1)) + EPS  # [n_og, n_ig]
        normalized = groups / scales[:, :, None, None]
    else:
        scales = jnp.sqrt(jnp.sum(groups.reshape(n_og, -1) ** 2, axis=-1)) + EPS  # [n_og]
        normalized = groups / scales[:, None, None, None]

    residue = normalized.reshape(n_og * n_ig, og * ig)
    codes_list, cb_list = [], []
    for k in range(scheme.num_codebooks):
        key, k_fit, k_sub = jax.random.split(key, 3)
        if max_points_per_centroid is not None:
            n_pts = min(max_points_per_centroid * scheme.codebook_size, residue.shape[0])
            sel = jax.random.choice(k_sub, residue.shape[0], shape=(n_pts,), replace=False)
            fit_data = residue[sel]
        else:
            fit_data = residue
        clusters, _, _ = fit_kmeans(
            fit_data, scheme.codebook_size, key=k_fit, max_iter=max_iter
        )
        idx, restored = find_nearest_cluster(residue, clusters)
        residue = residue - restored
        codes_list.append(idx.reshape(n_og, n_ig, 1))
        cb_list.append(clusters.reshape(1, scheme.codebook_size, og, ig))

    codes = jnp.concatenate(codes_list, axis=-1).astype(scheme.code_dtype)
    codebooks = jnp.concatenate(cb_list, axis=0)
    return AqlmWeight(codes=codes, codebooks=codebooks, scales=scales, bias=None, scheme=scheme)


# ---------------------------------------------------------------------------
# MSE + alternating optimization
# ---------------------------------------------------------------------------


def compute_mse(weight: AqlmWeight, reference_weight: jax.Array, XTX: jax.Array) -> jax.Array:
    """Activation MSE = (dW @ XTX) . dW / out_features (aq_engine.py:108-131).

    Differentiable w.r.t. codebooks and scales.
    """
    dw = dequantize_weight(weight, dtype=jnp.float32) - reference_weight.astype(jnp.float32)
    return jnp.sum((dw @ XTX.astype(jnp.float32)) * dw) / weight.out_features


def quantize_weight(
    reference_weight: jax.Array,
    XTX: jax.Array,
    scheme: AqlmScheme,
    config: CalibConfig = CalibConfig(),
    *,
    mesh=None,
    model_axis: str = "model",
) -> tuple[AqlmWeight, dict]:
    """Full per-layer quantization: init + (Adam || beam search) alternation.

    With `mesh`, the beam search (the dominant cost at 1x16) shards its
    out-groups over the mesh's model axis (calib/parallel.py — the TPU form
    of the reference's out-channel parallel_apply, aq_engine.py:139-208);
    falls back to the single-device search when OG doesn't divide.

    Returns (quantized weight, stats dict with loss trajectory).
    """
    import time as _time

    rng = np.random.RandomState(config.seed)
    _t0 = _time.time()
    weight = init_quantized_weight(
        reference_weight,
        scheme,
        key=jax.random.PRNGKey(config.seed),
        max_iter=config.init_max_iter,
        max_points_per_centroid=config.init_max_points_per_centroid,
        scale_nbits=config.scale_nbits,
    )
    jax.block_until_ready(weight.codebooks)
    if config.verbose:
        print(f"init (residual kmeans) {_time.time()-_t0:.1f}s", flush=True)
    # AMSGrad-Adam with betas (0.0, 0.95) as in aq_engine.py:67
    opt = optax.amsgrad(config.lr, b1=0.0, b2=0.95)

    @jax.jit
    def adam_epoch(codebooks, scales, codes, opt_state, ref_w, xtx):
        # ref_w/xtx are arguments, not closure constants: closure constants are
        # embedded in the HLO and re-uploaded per compile (remote-compile limit)
        def loss_fn(cb_sc):
            cb, sc = cb_sc
            w = AqlmWeight(
                codes=codes,
                codebooks=effective_codebooks(cb, config),
                scales=effective_scales(sc, config),
                bias=None,
                scheme=scheme,
            )
            return compute_mse(w, ref_w, xtx)

        def step(carry, _):
            (cb, sc), opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)((cb, sc))
            updates, opt_state = opt.update(grads, opt_state, (cb, sc))
            return (optax.apply_updates((cb, sc), updates), opt_state), loss

        ((cb, sc), opt_state), losses = jax.lax.scan(
            step, ((codebooks, scales), opt_state), None, length=config.steps_per_epoch
        )
        return cb, sc, opt_state, losses

    opt_state = opt.init((weight.codebooks, weight.scales))
    codes, codebooks, scales = weight.codes, weight.codebooks, weight.scales

    n_steps = (reference_weight.shape[1] // scheme.in_group_size) * scheme.num_codebooks
    previous_best = float("inf")
    history = []
    for epoch in range(config.max_epochs):
        _t0 = _time.time()
        codebooks, scales, opt_state, losses = adam_epoch(
            codebooks, scales, codes, opt_state, reference_weight, XTX
        )
        first_loss = float(losses[0])
        if not np.isfinite(first_loss):
            raise ValueError(f"quantization loss is {first_loss}")
        history.append(first_loss)
        if config.verbose:
            print(f"epoch={epoch} first_loss={first_loss:.10f} "
                  f"(adam {_time.time()-_t0:.1f}s)", flush=True)
        if config.relative_mse_tolerance is not None:
            if first_loss / previous_best > (1.0 - config.relative_mse_tolerance):
                break
            previous_best = min(previous_best, first_loss)

        # shuffled (in_group, codebook) visit order, like dim_rng (aq_engine.py:97)
        order = np.stack(
            [
                np.repeat(rng.permutation(n_steps // scheme.num_codebooks), scheme.num_codebooks),
                np.concatenate(
                    [rng.permutation(scheme.num_codebooks) for _ in range(n_steps // scheme.num_codebooks)]
                ),
            ],
            axis=1,
        ).astype(np.int32)
        sharded = mesh is not None and codes.shape[0] % mesh.shape[model_axis] == 0
        if sharded:
            from aqlm_tpu.calib.parallel import beam_search_optimal_codes_sharded

            codes, _ = beam_search_optimal_codes_sharded(
                XTX,
                reference_weight,
                effective_codebooks(codebooks, config),
                codes,
                effective_scales(scales, config),
                mesh,
                model_axis=model_axis,
                beam_size=config.beam_size,
                steps_order=jnp.asarray(order),
            )
        else:
            _t0 = _time.time()
            codes, _ = beam_search_optimal_codes(
                XTX,
                reference_weight,
                effective_codebooks(codebooks, config),
                codes,
                effective_scales(scales, config),
                beam_size=config.beam_size,
                steps_order=jnp.asarray(order),
            )
            jax.block_until_ready(codes)
            if config.verbose:
                print(f"epoch={epoch} beam sweep {_time.time()-_t0:.1f}s",
                      flush=True)

    # bake the second-level quantization into the stored values (the reference
    # re-derives it on every forward via get_codebooks/get_scales; a canonical
    # checkpoint stores the already-snapped values)
    final = AqlmWeight(
        codes=codes,
        codebooks=jax.lax.stop_gradient(effective_codebooks(codebooks, config)),
        scales=jax.lax.stop_gradient(effective_scales(scales, config)),
        bias=None,
        scheme=scheme,
    )
    return final, {"loss_history": history, "final_mse": float(compute_mse(final, reference_weight, XTX))}
