"""Cohere (Command-R) family: HF-import logit parity vs transformers (CPU
torch) and quantize->eval smoke through the generic pipeline. Covers the
parallel block, interleaved rope, qk-norm, and logit_scale."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from aqlm_tpu.calib.engine import CalibConfig
from aqlm_tpu.calib.pipeline import QuantizePipelineConfig, quantize_model
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.data.eval import evaluate_perplexity
from aqlm_tpu.models import cohere


def _make_hf(tmp_path, *, use_qk_norm):
    from transformers import CohereConfig as HFCohereConfig
    from transformers import CohereForCausalLM

    torch.manual_seed(0)
    hc = HFCohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, logit_scale=0.125,
        use_qk_norm=use_qk_norm, tie_word_embeddings=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hm = CohereForCausalLM(hc).eval()
    out = tmp_path / ("cohere_qk" if use_qk_norm else "cohere")
    hm.save_pretrained(out, safe_serialization=True)
    return str(out), hm


def _torch_logits(model, ids):
    with torch.no_grad():
        return model(torch.from_numpy(np.asarray(ids))).logits.float().numpy()


@pytest.mark.parametrize("use_qk_norm", [False, True])
def test_cohere_import_matches_transformers(tmp_path, use_qk_norm):
    from aqlm_tpu.io.hf_import import load_hf_cohere_checkpoint

    path, hf_model = _make_hf(tmp_path, use_qk_norm=use_qk_norm)
    params, cfg = load_hf_cohere_checkpoint(path)
    assert cfg.logit_scale == 0.125 and cfg.use_qk_norm == use_qk_norm
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    ref = _torch_logits(hf_model, ids)
    got, _ = cohere.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_cohere_quantize_smoke(tmp_path):
    """quantize -> PPL eval end-to-end through the generic pipeline."""
    from aqlm_tpu.io.hf_import import load_hf_cohere_checkpoint

    path, _ = _make_hf(tmp_path, use_qk_norm=False)
    params, cfg = load_hf_cohere_checkpoint(path)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (4, 16)), jnp.int32)

    ppl_fp = evaluate_perplexity(params, cfg, ids, forward_fn=cohere.forward)
    pipe = QuantizePipelineConfig(
        scheme=AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8),
        calib=CalibConfig(max_epochs=1, steps_per_epoch=3, init_max_iter=4, beam_size=1),
        finetune=None, verbose=False,
    )
    qparams, _ = quantize_model(
        params, cfg, ids, pipe, taps_fn=cohere.block_forward_with_taps
    )
    ppl_q = evaluate_perplexity(qparams, cfg, ids, forward_fn=cohere.forward)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_fp * 1.5 + 1.0, (ppl_q, ppl_fp)
