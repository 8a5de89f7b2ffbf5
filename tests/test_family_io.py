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
