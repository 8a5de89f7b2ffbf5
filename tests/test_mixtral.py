"""Mixtral MoE tests: routing semantics, forward sanity, cached decode, and
end-to-end quantization with the generic pipeline (moe_gate stays dense)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.calib import BlockFinetuneConfig, CalibConfig, QuantizePipelineConfig, quantize_model
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models import llama, mixtral
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.ops.runtime import QuantizedLinear


def test_routing_topk(key):
    cfg = mixtral.MixtralConfig.tiny_moe()
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    w = mixtral._routing(x, params["layers"][0], cfg)
    w = np.asarray(w)
    nonzero = (w > 0).sum(-1)
    np.testing.assert_array_equal(nonzero, cfg.num_experts_per_tok)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


def test_forward_and_cached_decode(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size)
    full, _ = mixtral.forward(params, cfg, ids)
    assert bool(jnp.isfinite(full).all())

    caches = llama.init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits = []
    for pos in range(6):
        lg, caches = mixtral.forward(
            params, cfg, ids[:, pos : pos + 1], kv_caches=caches,
            cache_offset=jnp.asarray(pos),
        )
        logits.append(lg[:, 0])
    got = jnp.stack(logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(full, np.float32), atol=0.02, rtol=0.02
    )


def test_taps_are_routing_masked(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.hidden_size))
    positions = jnp.arange(8)[None, :]
    _, taps = mixtral.block_forward_with_taps(x, params["layers"][0], cfg, positions)
    # each token appears (non-zero) in exactly num_experts_per_tok experts
    per_expert = np.stack(
        [np.any(np.asarray(taps[f"experts.{e}.gate_proj"]) != 0, axis=-1) for e in range(cfg.num_experts)]
    )  # [E, 1, 8]
    np.testing.assert_array_equal(per_expert.sum(0)[0], cfg.num_experts_per_tok)


@pytest.mark.slow
def test_quantize_mixtral_end_to_end(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1, num_experts=2)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    pipe = QuantizePipelineConfig(
        scheme=AqlmScheme(2, 6, 4),
        calib=CalibConfig(lr=1e-3, beam_size=2, max_epochs=2, steps_per_epoch=10,
                          relative_mse_tolerance=None, init_max_iter=10),
        finetune=BlockFinetuneConfig(lr=1e-4, max_epochs=1, batch_size=2),
        batch_size=2, verbose=False,
    )
    import copy

    qparams, stats = quantize_model(
        copy.deepcopy(params), cfg, ids, pipe, taps_fn=mixtral.block_forward_with_taps
    )
    layer = qparams["layers"][0]
    assert isinstance(layer["moe_gate"], DenseLinear)  # router never quantized
    for name in ("q_proj", "o_proj", "experts.0.gate_proj", "experts.1.down_proj"):
        assert isinstance(layer[name], QuantizedLinear), name
    logits, _ = mixtral.forward(qparams, cfg, ids)
    assert bool(jnp.isfinite(logits).all())
    ref_logits, _ = mixtral.forward(params, cfg, ids)
    agree = (np.asarray(jnp.argmax(logits, -1)) == np.asarray(jnp.argmax(ref_logits, -1))).mean()
    assert agree > 0.3, agree
