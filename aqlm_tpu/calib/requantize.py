"""Weight-L2 requantization: convert an AQLM checkpoint to ANOTHER scheme
without calibration data.

The reference can only change schemes by re-running the full calibration
pipeline (main.py) against a dataset. On TPU two cheaper converters matter:

- `ops/transcode.py` re-fits 1x16 CODEBOOKS additively into 2x8 (codes map
  by table lookup — fast, but the target scheme is fixed and error is
  codebook-limited);
- this module re-fits the WEIGHTS: dequantize each projection and fit fresh
  codes/codebooks for an arbitrary destination scheme with the same
  machinery calibration uses (residual k-means init, `calib/engine.py:146`,
  then alternating weight-L2 beam search `calib/beam_search_l2.py` +
  least-squares codebook refit) — minus the XTX term, since there is no
  activation data. It is exactly the reference's PV "V step" objective
  applied once per projection.

Main uses: producing a low-bit DRAFT model for speculative serving from the
target's own checkpoint (serve/speculative.py), and converting published
checkpoints to schemes the TPU decode kernels prefer (Kx8 LUT-GEMV).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2, find_optimal_codebooks
from aqlm_tpu.calib.engine import init_quantized_weight
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight

__all__ = ["requantize_weight", "requantize_params"]


def requantize_weight(
    w: AqlmWeight,
    new_scheme: AqlmScheme,
    *,
    key: jax.Array | None = None,
    refine_iters: int = 2,
    beam_size: int = 2,
    kmeans_iter: int = 50,
) -> tuple[AqlmWeight, float]:
    """Fit `new_scheme` codes/codebooks to w's dequantized weight.

    Returns (new AqlmWeight, relative weight MSE ||W_new - W||^2/||W||^2).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    assert new_scheme.codebook_size <= 1024, (
        "requantize refits codebooks by dense lstsq over [K*S, K*S] code "
        "co-occurrence; target Kx8-style schemes (S<=1024), not 1x16"
    )
    W = dequantize_weight(w, dtype=jnp.float32)
    key, k_init = jax.random.split(key)
    new = init_quantized_weight(W, new_scheme, key=k_init, max_iter=kmeans_iter)

    og, ig = new_scheme.out_group_size, new_scheme.in_group_size
    OG, IG, K = new.codes.shape
    groups = W.reshape(OG, og, IG, ig).transpose(0, 2, 1, 3)  # [OG, IG, og, ig]
    sc2 = jnp.broadcast_to(new.scales.reshape(OG, 1), (OG, IG)) if new.scales.ndim == 1 else new.scales
    ref_groups = (groups / sc2[:, :, None, None]).reshape(OG * IG, og * ig)

    for _ in range(refine_iters):
        key, k_bs = jax.random.split(key)
        codes = beam_search_optimal_codes_l2(
            W, new.codebooks, new.codes, new.scales, beam_size=beam_size, key=k_bs
        )
        cbs = find_optimal_codebooks(
            ref_groups, new.codebooks.reshape(K, new_scheme.codebook_size, og * ig),
            codes.reshape(OG * IG, K),
        ).reshape(K, new_scheme.codebook_size, og, ig)
        new = dataclasses.replace(
            new, codes=codes.astype(new_scheme.code_dtype), codebooks=cbs
        )

    err = dequantize_weight(new, dtype=jnp.float32) - W
    rel = float(jnp.sum(err * err) / jnp.maximum(jnp.sum(W * W), 1e-12))
    return dataclasses.replace(new, bias=w.bias), rel


def requantize_params(
    params: dict,
    new_scheme: AqlmScheme,
    *,
    mode: str = "reference",
    seed: int = 0,
    refine_iters: int = 2,
    beam_size: int = 2,
    kmeans_iter: int = 50,
    verbose: bool = False,
) -> tuple[dict, float]:
    """Requantize every quantized projection in a model params tree.

    Non-quantized leaves (embeddings, norms, dense heads) are SHARED with
    the input tree, so a lower-bit draft built from a target costs only the
    new codes/codebooks in memory. Returns (new params, worst rel-MSE).
    """
    from aqlm_tpu.ops.runtime import QuantizedLinear

    key = jax.random.PRNGKey(seed)
    worst = 0.0
    out = dict(params)
    new_layers = []
    for li, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name, q in layer.items():
            if not isinstance(q, QuantizedLinear):
                continue
            key, k_w = jax.random.split(key)
            assert q.codes is not None, (
                "requantize_params needs the canonical codes layout; load the "
                "model with mode='reference'"
            )
            w = AqlmWeight(codes=q.codes, codebooks=q.codebooks,
                           scales=q.scales, bias=q.bias, scheme=q.scheme)
            w2, rel = requantize_weight(
                w, new_scheme, key=k_w, refine_iters=refine_iters,
                beam_size=beam_size, kmeans_iter=kmeans_iter,
            )
            new_layer[name] = QuantizedLinear.from_aqlm(w2, mode=mode)
            worst = max(worst, rel)
            if verbose:
                print(f"layer {li} {name}: weight rel-MSE {rel:.4f}")
        new_layers.append(new_layer)
    out["layers"] = new_layers
    return out, worst
