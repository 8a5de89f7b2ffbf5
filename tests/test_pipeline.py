"""End-to-end quantization pipeline tests on a tiny model: quantize ->
forward sanity -> resume -> checkpoint roundtrip -> perplexity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from aqlm_tpu.calib import BlockFinetuneConfig, CalibConfig, QuantizePipelineConfig, quantize_model
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.data import evaluate_perplexity, get_loaders, group_texts
from aqlm_tpu.io import load_quantized_model, save_quantized_model
from aqlm_tpu.models import llama
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS
from aqlm_tpu.ops.runtime import QuantizedLinear


def _tiny_setup(key, num_layers=2):
    cfg = llama.ModelConfig.tiny(num_layers=num_layers)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    calib_ids = jnp.asarray(get_loaders("random", nsamples=4, seqlen=16, vocab_size=cfg.vocab_size))
    pipe = QuantizePipelineConfig(
        scheme=AqlmScheme(num_codebooks=2, nbits_per_codebook=6, in_group_size=4),
        calib=CalibConfig(
            lr=1e-3, beam_size=2, max_epochs=2, steps_per_epoch=10,
            relative_mse_tolerance=None, init_max_iter=10,
        ),
        finetune=BlockFinetuneConfig(lr=1e-4, max_epochs=1, batch_size=2),
        batch_size=2,
        verbose=False,
    )
    return cfg, params, calib_ids, pipe


def test_quantize_model_end_to_end(key, tmp_path):
    cfg, params, calib_ids, pipe = _tiny_setup(key)
    ref_logits, _ = llama.forward(params, cfg, calib_ids)

    import copy

    qparams, stats = quantize_model(copy.deepcopy(params), cfg, calib_ids, pipe)
    for layer in qparams["layers"]:
        for name in QUANTIZABLE_PROJS:
            assert isinstance(layer[name], QuantizedLinear), name
            assert layer[name].mode == "reference"
    assert 2.0 < stats["avg_bits"] < 8.0
    assert len(stats["out_loss"]) == cfg.num_layers
    assert all(np.isfinite(stats["out_loss"]))

    q_logits, _ = llama.forward(qparams, cfg, calib_ids)
    assert bool(jnp.isfinite(q_logits).all())
    # quantized model predictions correlate with the original
    ref_top = np.asarray(jnp.argmax(ref_logits, -1))
    q_top = np.asarray(jnp.argmax(q_logits, -1))
    agreement = (ref_top == q_top).mean()
    assert agreement > 0.3, agreement

    # checkpoint roundtrip
    save_quantized_model(str(tmp_path / "model"), qparams, cfg)
    loaded, loaded_cfg = load_quantized_model(str(tmp_path / "model"))
    assert loaded_cfg == cfg
    l_logits, _ = llama.forward(loaded, loaded_cfg, calib_ids)
    np.testing.assert_allclose(
        np.asarray(l_logits, np.float32), np.asarray(q_logits, np.float32), atol=1e-5
    )


def test_quantize_model_resume(key, tmp_path):
    cfg, params, calib_ids, pipe = _tiny_setup(key, num_layers=1)
    import copy

    pipe = dataclasses.replace(pipe, save_dir=str(tmp_path / "ckpt"))
    q1, _ = quantize_model(copy.deepcopy(params), cfg, calib_ids, pipe)

    pipe_resume = dataclasses.replace(pipe, resume=True)
    q2, _ = quantize_model(copy.deepcopy(params), cfg, calib_ids, pipe_resume)
    a, _ = llama.forward(q1, cfg, calib_ids)
    b, _ = llama.forward(q2, cfg, calib_ids)
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5)


def test_offload_activations_equivalent(key, tmp_path):
    """Host-offloaded activations must produce the identical quantized model."""
    cfg, params, calib_ids, pipe = _tiny_setup(key, num_layers=1)
    import copy

    q_dev, _ = quantize_model(copy.deepcopy(params), cfg, calib_ids, pipe)
    pipe_off = dataclasses.replace(pipe, offload_activations=True)
    q_off, _ = quantize_model(copy.deepcopy(params), cfg, calib_ids, pipe_off)
    a, _ = llama.forward(q_dev, cfg, calib_ids)
    b, _ = llama.forward(q_off, cfg, calib_ids)
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-4)


def test_on_save_callback(key, tmp_path):
    cfg, params, calib_ids, pipe = _tiny_setup(key, num_layers=1)
    marker = tmp_path / "marker.txt"
    pipe = dataclasses.replace(
        pipe,
        save_dir=str(tmp_path / "ckpt"),
        on_save=f"open(r'{marker}', 'a').write(str(layer_index) + ',')",
    )
    quantize_model(params, cfg, calib_ids, pipe)
    assert marker.read_text() == "0,"


def test_evaluate_perplexity_matches_manual(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    ids = jnp.asarray(get_loaders("random", nsamples=3, seqlen=12, vocab_size=cfg.vocab_size))

    ppl = evaluate_perplexity(params, cfg, ids, batch_size=2)  # exercises padding path

    logits, _ = llama.forward(params, cfg, ids)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(logp, ids[:, 1:, None], -1)[..., 0]
    manual = float(jnp.exp(jnp.mean(nll)))
    np.testing.assert_allclose(ppl, manual, rtol=1e-4)


def test_group_texts():
    chunks = group_texts([np.arange(10), np.arange(7)], seqlen=4)
    assert chunks.shape == (4, 4)
    np.testing.assert_array_equal(chunks[0], [0, 1, 2, 3])
    labeled = group_texts([np.arange(8)], seqlen=4, add_labels=True)
    np.testing.assert_array_equal(labeled["input_ids"], labeled["labels"])


def test_scheme_overrides_mix_compression(key, tmp_path):
    """--mix_compression semantics: attention projections quantize at 2x the
    codebooks of the MLP (reference main.py:258-264), per-weight schemes
    survive the layer-checkpoint roundtrip, and the model still forwards."""
    cfg, params, calib_ids, pipe = _tiny_setup(key, num_layers=1)
    attn_scheme = dataclasses.replace(pipe.scheme, num_codebooks=4)
    pipe = dataclasses.replace(
        pipe,
        finetune=None,
        save_dir=str(tmp_path / "mix"),
        scheme_overrides=tuple(
            (n, attn_scheme) for n in ("q_proj", "k_proj", "v_proj", "o_proj")
        ),
    )
    qparams, stats = quantize_model(params, cfg, calib_ids, pipe)
    layer = qparams["layers"][0]
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert layer[name].scheme.num_codebooks == 4, name
    for name in ("gate_proj", "up_proj", "down_proj"):
        assert layer[name].scheme.num_codebooks == 2, name
    # mixed bits: between the pure-base and pure-attn schemes
    assert 2.0 < stats["avg_bits"] < 16.0
    logits, _ = llama.forward(qparams, cfg, calib_ids)
    assert bool(jnp.isfinite(logits).all())

    # per-weight schemes round-trip through the layer checkpoint
    from aqlm_tpu.io.checkpoint import load_layer_checkpoint

    loaded = load_layer_checkpoint(str(tmp_path / "mix"), 0)
    assert loaded["q_proj"].scheme.num_codebooks == 4
    assert loaded["down_proj"].scheme.num_codebooks == 2


def test_blockwise_checkpointing_equivalent(key):
    """--use_checkpointing (remat of the block forward) must not change the
    finetune math — same updates, just recomputed activations."""
    import copy

    from aqlm_tpu.calib.blockwise import finetune_block

    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    layer = params["layers"][0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    inps = jax.random.normal(k1, (4, 8, cfg.hidden_size), jnp.float32)
    outs = jax.random.normal(k2, (4, 8, cfg.hidden_size), jnp.float32)

    from aqlm_tpu.calib import BlockFinetuneConfig

    base = BlockFinetuneConfig(lr=1e-3, max_epochs=2, batch_size=2)
    plain = finetune_block(copy.deepcopy(layer), cfg, inps, outs, base)
    remat = finetune_block(
        copy.deepcopy(layer), cfg, inps, outs,
        dataclasses.replace(base, use_checkpointing=True),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        ),
        plain, remat,
    )
