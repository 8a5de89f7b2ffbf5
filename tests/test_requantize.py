"""Weight-L2 requantization (scheme -> scheme conversion without data).

Correctness bars: the refit weight must approximate the dequantized source
(rel-MSE sane for the bit budget), refinement must not hurt the k-means
init, and a requantized draft of a model must yield usable speculative
acceptance against its own source as target — far above an unrelated
draft's."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.calib.requantize import requantize_params, requantize_weight
from aqlm_tpu.config import SCHEME_1X8, SCHEME_2X8, AqlmScheme
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight


def test_requantize_reduces_error_vs_init():
    w = random_aqlm_weight(jax.random.PRNGKey(0), SCHEME_2X8, 32, 64)
    w8_init, rel_init = requantize_weight(w, SCHEME_1X8, refine_iters=0)
    w8, rel = requantize_weight(w, SCHEME_1X8, refine_iters=3)
    assert w8.scheme == dataclasses.replace(SCHEME_1X8)
    assert rel <= rel_init + 1e-6, (rel, rel_init)
    # sanity: the refit is a real approximation, not noise
    W = dequantize_weight(w, dtype=jnp.float32)
    W8 = dequantize_weight(w8, dtype=jnp.float32)
    assert rel < 1.0
    got = float(jnp.sum((W8 - W) ** 2) / jnp.sum(W * W))
    assert abs(got - rel) < 1e-5


def test_requantize_same_scheme_is_accurate():
    """Refitting at the SAME bit budget should approximate well (it could in
    principle recover the source exactly)."""
    w = random_aqlm_weight(jax.random.PRNGKey(1), SCHEME_1X8, 16, 64)
    _, rel = requantize_weight(w, SCHEME_1X8, refine_iters=3, kmeans_iter=100)
    assert rel < 0.05, rel


def test_requantize_params_shares_unquantized_leaves():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference")
    draft, worst = requantize_params(params, SCHEME_1X8, refine_iters=1)
    assert worst < 1.0
    # embeddings and norms are the same arrays, not copies
    assert draft["embed"] is params["embed"]
    assert draft["layers"][0]["input_norm"] is params["layers"][0]["input_norm"]
    # quantized projections actually changed scheme
    q = draft["layers"][0]["q_proj"]
    assert q.scheme.num_codebooks == 1 and q.scheme.nbits_per_codebook == 8


@pytest.mark.slow
def test_requantized_draft_speculative_serving():
    """The self-draft serving recipe end-to-end. An 8x8 requant of a 2x8
    target recovers it EXACTLY (residual k-means has codebooks to spare), so
    speculative acceptance must be 1.0; a 1x8 (1-bit) draft still decodes
    exactly (verification guarantees it) at whatever acceptance its fidelity
    earns. On random tiny weights logits are nearly flat, so the acceptance
    NUMBER for lossy drafts is meaningless here — real-model acceptance is a
    deployment measurement, not a unit test."""
    from aqlm_tpu.serve.speculative import SpeculativeDecoder

    from aqlm_tpu.config import SCHEME_8X8

    cfg = llama.ModelConfig.tiny(num_layers=2)
    target = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference")
    prompt = np.asarray([3, 2, 1], np.int32)

    exact_draft, rel8 = requantize_params(target, SCHEME_8X8, refine_iters=1)
    assert rel8 < 1e-6, rel8  # 8 codebooks reproduce a 2-codebook sum (f32 lstsq)
    dec = SpeculativeDecoder(target, cfg, exact_draft, cfg, k=3, max_len=96)
    out_e, st_e = dec.generate(prompt, 24)
    assert st_e["acceptance"] == 1.0, st_e

    lossy_draft, _ = requantize_params(target, SCHEME_1X8, refine_iters=2)
    dec_l = SpeculativeDecoder(target, cfg, lossy_draft, cfg, k=3, max_len=96)
    out_l, _ = dec_l.generate(prompt, 24)
    assert out_l == out_e  # exact regardless of draft quality
