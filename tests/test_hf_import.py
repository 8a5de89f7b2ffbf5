"""HF AQLM checkpoint import/export roundtrip tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8, AqlmScheme
from aqlm_tpu.io.hf_import import (
    export_hf_aqlm_state_dict,
    load_hf_aqlm_checkpoint,
    model_config_from_hf,
    pack_codes,
    unpack_codes,
)
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params


@pytest.mark.parametrize("nbits", [8, 16])
def test_code_packing_roundtrip(nbits):
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 2 ** nbits, size=(13, 7, 2)).astype(np.uint16)
    packed = pack_codes(codes, nbits)
    assert packed.dtype == (np.int8 if nbits <= 8 else np.int16)
    restored = unpack_codes(packed, nbits)
    np.testing.assert_array_equal(restored.astype(np.uint16), codes)


def _hf_config_for(cfg: llama.ModelConfig, qcfg: dict) -> dict:
    return {
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_embeddings,
        "quantization_config": qcfg,
    }


def _write_checkpoint(path, sd, hf_config, use_safetensors):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_config, f)
    if use_safetensors:
        from safetensors.numpy import save_file

        save_file(sd, os.path.join(path, "model.safetensors"))
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            os.path.join(path, "pytorch_model.bin"),
        )


@pytest.mark.parametrize("use_safetensors", [True, False])
def test_hf_roundtrip(key, tmp_path, use_safetensors):
    if use_safetensors:
        pytest.importorskip("safetensors")
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32)

    sd, qcfg = export_hf_aqlm_state_dict(params, cfg)
    assert qcfg["quant_method"] == "aqlm"
    assert sd["model.layers.0.self_attn.q_proj.codes"].dtype == np.int8
    path = str(tmp_path / "hf_ckpt")
    _write_checkpoint(path, sd, _hf_config_for(cfg, qcfg), use_safetensors)

    loaded, loaded_cfg, scheme = load_hf_aqlm_checkpoint(path, mode="reference")
    assert scheme == SCHEME_2X8
    assert loaded_cfg.num_layers == cfg.num_layers

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    ref, _ = llama.forward(params, cfg, ids)
    got, _ = llama.forward(loaded, loaded_cfg, ids)
    # fp16 serialization of codebooks/scales costs ~1e-3 relative
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05, rtol=0.02
    )


def test_model_config_from_hf_llama2():
    hf = {
        "model_type": "llama", "vocab_size": 32000, "hidden_size": 4096,
        "intermediate_size": 11008, "num_hidden_layers": 32,
        "num_attention_heads": 32, "num_key_value_heads": 32,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 4096,
    }
    cfg = model_config_from_hf(hf)
    assert cfg == llama.ModelConfig.llama2_7b()


def test_phi3_style_fused_checkpoint(key, tmp_path):
    """phi3-style fused qkv_proj / gate_up_proj splits into our layout."""
    import numpy as np

    from aqlm_tpu.io.hf_import import load_hf_dense_checkpoint

    cfg = llama.ModelConfig.tiny(num_layers=1, num_heads=4, num_kv_heads=2)
    d = cfg.dim_per_head
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    rng = np.random.RandomState(0)
    nq, nkv = cfg.num_heads * d, cfg.num_kv_heads * d
    sd = {
        "model.embed_tokens.weight": rng.randn(v, h).astype(np.float32),
        "model.norm.weight": np.ones(h, np.float32),
        "lm_head.weight": rng.randn(v, h).astype(np.float32),
        "model.layers.0.input_layernorm.weight": np.ones(h, np.float32),
        "model.layers.0.post_attention_layernorm.weight": np.ones(h, np.float32),
        "model.layers.0.self_attn.qkv_proj.weight": rng.randn(nq + 2 * nkv, h).astype(np.float32),
        "model.layers.0.self_attn.o_proj.weight": rng.randn(h, nq).astype(np.float32),
        "model.layers.0.mlp.gate_up_proj.weight": rng.randn(2 * i, h).astype(np.float32),
        "model.layers.0.mlp.down_proj.weight": rng.randn(h, i).astype(np.float32),
    }
    hf_cfg = {
        "model_type": "phi3", "vocab_size": v, "hidden_size": h,
        "intermediate_size": i, "num_hidden_layers": 1,
        "num_attention_heads": cfg.num_heads, "num_key_value_heads": cfg.num_kv_heads,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
    }
    path = str(tmp_path / "phi3")
    _write_checkpoint(path, sd, hf_cfg, use_safetensors=False)
    params, loaded_cfg = load_hf_dense_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["q_proj"].weight),
        sd["model.layers.0.self_attn.qkv_proj.weight"][:nq],
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["up_proj"].weight),
        sd["model.layers.0.mlp.gate_up_proj.weight"][i:],
    )
    logits, _ = llama.forward(params, loaded_cfg, jnp.ones((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())
