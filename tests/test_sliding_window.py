"""Sliding-window attention (mistral/qwen2): windowed mask vs brute force,
cached stepwise decode == full windowed forward, and the HF config mapping.
The reference gets this behavior from HF's MistralModel; here it is a
ModelConfig knob applied at every mask site."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import make_causal_mask
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params


def test_windowed_mask_matches_bruteforce():
    q_pos = jnp.arange(10)[None, :]
    k_pos = jnp.arange(10)[None, :]
    mask = make_causal_mask(q_pos, k_pos, window=4)[0, 0]
    for q in range(10):
        for k in range(10):
            expect = (k <= q) and (q - k < 4)
            assert bool(mask[q, k]) == expect, (q, k)


def test_window_changes_long_context_logits():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    cfg_win = dataclasses.replace(cfg, sliding_window=4)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    full, _ = llama.forward(params, cfg, ids)
    win, _ = llama.forward(params, cfg_win, ids)
    # within the window the prefix logits agree; beyond it they must differ
    np.testing.assert_allclose(
        np.asarray(win[:, :4]), np.asarray(full[:, :4]), atol=1e-5, rtol=1e-5
    )
    assert not np.allclose(np.asarray(win[:, -1]), np.asarray(full[:, -1]), atol=1e-4)


def test_windowed_cached_decode_matches_full_forward():
    cfg = dataclasses.replace(llama.ModelConfig.tiny(num_layers=2), sliding_window=4)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    stacked = stack_layer_params(params)
    t = 10
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, cfg.vocab_size)

    full_logits, _ = forward_stacked(stacked, cfg, ids)

    cache = init_kv_cache(cfg, 1, 32)
    logits, cache = forward_stacked(
        stacked, cfg, ids[:, :6], cache=cache, cache_offset=jnp.zeros((1,), jnp.int32)
    )
    step_logits = [logits[:, i] for i in range(6)]
    for pos in range(6, t):
        logits, cache = forward_stacked(
            stacked, cfg, ids[:, pos : pos + 1], cache=cache,
            cache_offset=jnp.full((1,), pos, jnp.int32),
        )
        step_logits.append(logits[:, 0])
    got = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(full_logits, np.float32), atol=0.03, rtol=0.05
    )


def test_flash_decode_windowed_default_routing():
    """Default flash routing with a BINDING window (cache longer than the
    window): the flash kernel now carries the window mask itself, so a
    codes-mode model — which defaults to the flash path — must still equal
    the full windowed forward. (Before the windowed kernel landed, this
    configuration was force-fallen-back to the XLA mask path.)"""
    from aqlm_tpu.config import SCHEME_2X8
    from aqlm_tpu.models.quantize import random_quantized_params

    cfg = dataclasses.replace(
        llama.ModelConfig.tiny(num_layers=1), sliding_window=5
    )
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="codes", dtype=jnp.float32
    )
    stacked = stack_layer_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)

    # codes mode + 128-aligned cache: default routing picks flash decode
    full, _ = forward_stacked(stacked, cfg, ids)
    cache = init_kv_cache(cfg, 1, 256)
    logits, cache = forward_stacked(
        stacked, cfg, ids[:, :4], cache=cache, cache_offset=jnp.zeros((1,), jnp.int32)
    )
    outs = [logits[:, i] for i in range(4)]
    for pos in range(4, 8):
        logits, cache = forward_stacked(
            stacked, cfg, ids[:, pos : pos + 1], cache=cache,
            cache_offset=jnp.full((1,), pos, jnp.int32),
        )
        outs.append(logits[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, axis=1), np.float32), np.asarray(full, np.float32),
        atol=0.03, rtol=0.05,
    )


def test_hf_config_sliding_window_mapping():
    from aqlm_tpu.io.hf_import import model_config_from_hf

    base = dict(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
    )
    mistral = model_config_from_hf({**base, "model_type": "mistral", "sliding_window": 4096})
    assert mistral.sliding_window == 4096
    qwen_off = model_config_from_hf({**base, "model_type": "qwen2", "sliding_window": 4096})
    assert qwen_off.sliding_window is None  # use_sliding_window defaults False
    qwen_on = model_config_from_hf(
        {**base, "model_type": "qwen2", "sliding_window": 4096, "use_sliding_window": True}
    )
    assert qwen_on.sliding_window == 4096
    plain = model_config_from_hf({**base, "model_type": "llama"})
    assert plain.sliding_window is None


def test_mistral_window_matches_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM

    from aqlm_tpu.io.hf_import import load_hf_dense_checkpoint

    torch.manual_seed(0)
    hc = HFMistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=4,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    hm = MistralForCausalLM(hc).eval()
    out = tmp_path / "mistral_win"
    hm.save_pretrained(out, safe_serialization=True)

    params, cfg = load_hf_dense_checkpoint(str(out))
    assert cfg.sliding_window == 4
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        ref = hm(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("rs", [
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
    {"rope_type": "linear", "factor": 4.0},
])
def test_rope_scaling_matches_transformers(tmp_path, rs):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from aqlm_tpu.io.hf_import import load_hf_dense_checkpoint

    torch.manual_seed(0)
    hc = HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_scaling=dict(rs),
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    hm = LlamaForCausalLM(hc).eval()
    out = tmp_path / f"llama_{rs['rope_type']}"
    hm.save_pretrained(out, safe_serialization=True)

    params, cfg = load_hf_dense_checkpoint(str(out))
    assert cfg.rope_scaling is not None and cfg.rope_scaling[0] == rs["rope_type"].replace("default", "")
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 24))
    with torch.no_grad():
        ref = hm(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)
