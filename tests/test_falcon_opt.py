"""Falcon / OPT family support: HF-import logit parity vs transformers (CPU
torch) and quantize->eval smoke through the generic pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from aqlm_tpu.calib.engine import CalibConfig
from aqlm_tpu.calib.pipeline import QuantizePipelineConfig, quantize_model
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.data.eval import evaluate_perplexity
from aqlm_tpu.models import falcon, opt


@pytest.fixture(scope="module")
def hf_dirs(tmp_path_factory):
    from transformers import FalconConfig as HFFalconConfig
    from transformers import FalconForCausalLM, OPTConfig, OPTForCausalLM

    root = tmp_path_factory.mktemp("hf")
    torch.manual_seed(0)
    fc = HFFalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, alibi=False, bias=False,
        max_position_embeddings=64,
    )
    fm = FalconForCausalLM(fc).eval()
    fm.save_pretrained(root / "falcon", safe_serialization=True)

    oc = OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=64,
    )
    om = OPTForCausalLM(oc).eval()
    om.save_pretrained(root / "opt", safe_serialization=True)
    return {"falcon": (str(root / "falcon"), fm), "opt": (str(root / "opt"), om)}


def _torch_logits(model, ids):
    with torch.no_grad():
        return model(torch.from_numpy(np.asarray(ids))).logits.float().numpy()


def test_falcon_import_matches_transformers(hf_dirs):
    from aqlm_tpu.io.hf_import import load_hf_falcon_checkpoint

    path, hf_model = hf_dirs["falcon"]
    params, cfg = load_hf_falcon_checkpoint(path)
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    ref = _torch_logits(hf_model, ids)
    got, _ = falcon.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


def test_opt_import_matches_transformers(hf_dirs):
    from aqlm_tpu.io.hf_import import load_hf_opt_checkpoint

    path, hf_model = hf_dirs["opt"]
    params, cfg = load_hf_opt_checkpoint(path)
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    ref = _torch_logits(hf_model, ids)
    got, _ = opt.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["falcon", "opt"])
def test_quantize_smoke(hf_dirs, family):
    """quantize -> PPL eval end-to-end through the generic pipeline."""
    if family == "falcon":
        from aqlm_tpu.io.hf_import import load_hf_falcon_checkpoint as load

        mod, embed_fn = falcon, None
    else:
        from aqlm_tpu.io.hf_import import load_hf_opt_checkpoint as load

        mod = opt
        embed_fn = lambda p, ids, pos: opt.embed(p, ids, pos)
    path, _ = hf_dirs[family]
    params, cfg = load(path)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (4, 16)), jnp.int32)

    ppl_fp = evaluate_perplexity(params, cfg, ids, forward_fn=mod.forward)
    pipe = QuantizePipelineConfig(
        scheme=AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8),
        calib=CalibConfig(max_epochs=1, steps_per_epoch=3, init_max_iter=4, beam_size=1),
        finetune=None, verbose=False,
    )
    qparams, stats = quantize_model(
        params, cfg, ids, pipe, taps_fn=mod.block_forward_with_taps, embed_fn=embed_fn
    )
    ppl_q = evaluate_perplexity(qparams, cfg, ids, forward_fn=mod.forward)
    assert np.isfinite(ppl_q)
    # 2x8g8 at tiny scale: quantized PPL must stay close to fp
    assert ppl_q < ppl_fp * 1.5 + 1.0, (ppl_q, ppl_fp)


@pytest.mark.slow
def test_phi3_import_quantize_serve(tmp_path):
    """phi3 split-import -> quantize -> Engine serve, end-to-end."""
    from transformers import Phi3Config, Phi3ForCausalLM

    from aqlm_tpu.io.hf_import import load_hf_dense_checkpoint
    from aqlm_tpu.models import llama
    from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig

    torch.manual_seed(0)
    pc = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0,  # phi3 default (32000) exceeds the tiny vocab
    )
    pm = Phi3ForCausalLM(pc).eval()
    pm.save_pretrained(tmp_path / "phi3", safe_serialization=True)

    params, cfg = load_hf_dense_checkpoint(str(tmp_path / "phi3"))
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    ref = _torch_logits(pm, ids)
    got, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)

    pipe = QuantizePipelineConfig(
        scheme=AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8),
        calib=CalibConfig(max_epochs=1, steps_per_epoch=3, init_max_iter=4, beam_size=1),
        finetune=None, verbose=False,
    )
    calib = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (4, 16)), jnp.int32)
    qparams, _ = quantize_model(params, cfg, calib, pipe)

    engine = Engine(qparams, cfg, ServeConfig(max_batch=2, max_len=32, prefill_buckets=(8,),
                                              fuse_projections=False))
    outs = engine.generate([np.asarray([1, 2, 3], np.int32)], SamplingParams(max_new_tokens=4))
    assert len(outs[0]) == 4
