"""Family-aware IO: canonical checkpoint round-trip preserves the config
subclass and family extras (pos_embed, final_norm_bias), resolve_model
dispatches HF checkpoints by model_type, and the HF Mixtral importer matches
transformers logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.io.checkpoint import load_quantized_model, save_quantized_model
from aqlm_tpu.models import cohere, falcon, opt
from aqlm_tpu.models.family import family_name, forward_fn, taps_fn


@pytest.mark.parametrize(
    "mod,cfg",
    [
        (cohere, cohere.CohereConfig.tiny(num_layers=2, use_qk_norm=True)),
        (falcon, falcon.FalconConfig.tiny(num_layers=2)),
        (opt, opt.OptConfig.tiny(num_layers=2)),
    ],
    ids=["cohere", "falcon", "opt"],
)
def test_checkpoint_roundtrip_preserves_family(tmp_path, mod, cfg):
    params = mod.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    save_quantized_model(str(tmp_path / "m"), params, cfg)
    params2, cfg2 = load_quantized_model(str(tmp_path / "m"))
    assert type(cfg2) is type(cfg) and cfg2 == cfg
    assert family_name(cfg2) == family_name(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    ref, _ = mod.forward(params, cfg, ids)
    got, _ = forward_fn(cfg2)(params2, cfg2, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_taps_fn_dispatch():
    from aqlm_tpu.models import llama, mixtral

    assert taps_fn(cohere.CohereConfig.tiny()) is cohere.block_forward_with_taps
    assert taps_fn(mixtral.MixtralConfig.tiny()) is mixtral.block_forward_with_taps
    assert taps_fn(llama.ModelConfig.tiny()) is llama.block_forward_with_taps


def test_mixtral_hf_import_matches_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig as HFMixtralConfig
    from transformers import MixtralForCausalLM

    from aqlm_tpu.io.hf_import import load_hf_mixtral_checkpoint
    from aqlm_tpu.models import mixtral

    torch.manual_seed(0)
    hc = HFMixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hm = MixtralForCausalLM(hc).eval()
    out = tmp_path / "mixtral"
    hm.save_pretrained(out, safe_serialization=True)

    params, cfg = load_hf_mixtral_checkpoint(str(out))
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        ref = hm(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = mixtral.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


def test_resolve_model_dispatches_by_model_type(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import CohereConfig as HFCohereConfig
    from transformers import CohereForCausalLM

    from aqlm_tpu.cli.common import resolve_model

    torch.manual_seed(0)
    hc = HFCohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, logit_scale=0.125, tie_word_embeddings=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    CohereForCausalLM(hc).save_pretrained(tmp_path / "c", safe_serialization=True)
    params, cfg, kind = resolve_model(str(tmp_path / "c"))
    assert kind == "dense" and isinstance(cfg, cohere.CohereConfig)
    assert cfg.logit_scale == 0.125


def test_mixtral_hf_aqlm_roundtrip(tmp_path):
    """Quantized Mixtral export -> HF-layout checkpoint -> import round-trip
    (the published Mixtral-8x7b AQLM hub layout: quantized attention +
    expert w1/w2/w3, dense router gate)."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file
    import json, os

    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.io.hf_import import export_hf_aqlm_state_dict, load_hf_aqlm_checkpoint
    from aqlm_tpu.models import mixtral
    from aqlm_tpu.ops.dequant import random_aqlm_weight
    from aqlm_tpu.ops.runtime import QuantizedLinear

    cfg = mixtral.MixtralConfig.tiny(num_layers=2, num_experts=2)
    params = mixtral.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8)
    key = jax.random.PRNGKey(1)
    for layer in params["layers"]:
        for name, lin in list(layer.items()):
            if name == "moe_gate" or not hasattr(lin, "weight") or lin.weight.ndim != 2:
                continue
            out_f, in_f = lin.weight.shape
            if in_f % scheme.in_group_size:
                continue
            key, sub = jax.random.split(key)
            layer[name] = QuantizedLinear.from_aqlm(
                random_aqlm_weight(sub, scheme, out_f, in_f, dtype=jnp.float32),
                mode="reference",
            )

    sd, qcfg = export_hf_aqlm_state_dict(params, cfg)
    assert any("block_sparse_moe.experts.0.w1.codes" in k for k in sd), sd.keys()
    path = tmp_path / "mx"
    os.makedirs(path)
    hf_cfg = {
        "model_type": "mixtral",
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers, "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "num_local_experts": cfg.num_experts,
        "num_experts_per_tok": cfg.num_experts_per_tok,
        "quantization_config": qcfg,
    }
    with open(path / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file(sd, str(path / "model.safetensors"))

    loaded, lcfg, lscheme = load_hf_aqlm_checkpoint(str(path), mode="reference")
    assert isinstance(lcfg, mixtral.MixtralConfig) and lcfg.num_experts == 2
    assert lscheme == scheme
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    ref, _ = mixtral.forward(params, cfg, ids)
    got, _ = mixtral.forward(loaded, lcfg, ids)
    # f16 storage of norms/embeddings in the hub layout
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2, rtol=5e-2)
