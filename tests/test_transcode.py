"""1x16 -> 2x8 additive transcode: fitting quality + end-to-end PPL delta."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_1X16
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight
from aqlm_tpu.ops.transcode import (
    fit_additive_split,
    transcode_1x16_to_2x8,
    transcode_1x16_to_2xN,
)


@pytest.mark.slow
def test_additive_split_recovers_separable_codebook(key):
    """When CB IS a sum of two 256-entry books, the fit must find ~0 error."""
    k1, k2 = jax.random.split(key)
    A0 = jax.random.normal(k1, (256, 8))
    B0 = jax.random.normal(k2, (256, 8)) * 0.3
    cb = (A0[:, None, :] + B0[None, :, :]).reshape(65536, 8)
    _, _, _, _, rel = fit_additive_split(cb, iters=20)
    # exact factorization recovery is a hard combinatorial problem; the
    # alternating+joint fit lands within a few percent even on this
    # worst-case structure (real kmeans-built codebooks cluster better)
    assert rel < 0.08, rel


@pytest.mark.slow
def test_transcode_1x16_weight_error(key):
    """Structured (k-means-like) codebooks transcode with modest error; the
    2x8 result dequantizes close to the exact 1x16 weight."""
    w = random_aqlm_weight(key, SCHEME_1X16, 64, 64)
    w2, rel = transcode_1x16_to_2x8(w, iters=15)
    assert w2.scheme.num_codebooks == 2 and w2.scheme.nbits_per_codebook == 8
    d1 = np.asarray(dequantize_weight(w, dtype=jnp.float32))
    d2 = np.asarray(dequantize_weight(w2, dtype=jnp.float32))
    wmse = ((d1 - d2) ** 2).sum() / (d1 ** 2).sum()
    # iid-random codebooks are the WORST case for additive splitting; the
    # weight error must still track the reported codebook rel_mse
    assert np.isfinite(rel) and wmse < rel * 1.3 + 1e-3, (wmse, rel)


@pytest.mark.slow
def test_transcode_2x7_serves_codes_mode(key):
    """2x7 (128-entry books): dequant consistency AND the codes-mode runtime
    single-gather path (S=128 skips the two-half select in lut_gemv)."""
    from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul

    w = random_aqlm_weight(key, SCHEME_1X16, 256, 128)
    w2, rel = transcode_1x16_to_2xN(w, nbits=7, iters=15)
    assert w2.scheme.num_codebooks == 2 and w2.scheme.nbits_per_codebook == 7
    assert w2.codebooks.shape[1] == 128
    assert int(jnp.max(w2.codes)) < 128

    d2 = dequantize_weight(w2, dtype=jnp.float32)
    q = QuantizedLinear.from_aqlm(w2, mode="codes")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 128), jnp.float32)
    y = quantized_matmul(x, q)
    ref = x @ d2.T
    relerr = float(jnp.linalg.norm(y.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
    assert relerr < 2e-2, relerr
    # 2x7 must fit at least as well as a single 128-entry book would; sane cap
    assert np.isfinite(rel) and rel < 1.0, rel


@pytest.mark.slow
def test_transcode_model_ppl_delta(key):
    """Tiny 1x16 model: transcoded-2x8 PPL stays close to exact 1x16 PPL."""
    from aqlm_tpu.data.eval import evaluate_perplexity
    from aqlm_tpu.ops.runtime import QuantizedLinear

    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = random_quantized_params(key, cfg, SCHEME_1X16, mode="reference", dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    ppl_exact = evaluate_perplexity(params, cfg, ids)

    for layer in params["layers"]:
        for name, q in list(layer.items()):
            if isinstance(q, QuantizedLinear):
                w = AqlmWeight(codes=q.codes, codebooks=q.codebooks,
                               scales=q.scales, bias=q.bias, scheme=q.scheme)
                w2, rel = transcode_1x16_to_2x8(w, iters=10)
                layer[name] = QuantizedLinear.from_aqlm(w2, mode="reference")
    ppl_t = evaluate_perplexity(params, cfg, ids)
    assert np.isfinite(ppl_t)
    assert ppl_t < ppl_exact * 1.3 + 0.5, (ppl_t, ppl_exact)

