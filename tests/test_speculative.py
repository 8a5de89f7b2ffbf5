"""Speculative decoding: greedy draft-and-verify must emit EXACTLY the
target's own greedy decode — with a perfect draft (acceptance 1.0), an
unrelated random draft (mostly rejected), and a quantized target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.serve.speculative import SpeculativeDecoder


def _greedy_reference(params, cfg, prompt, n_new):
    ids = list(prompt)
    out = []
    for _ in range(n_new):
        logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        ids.append(tok)
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_perfect_draft_accepts_everything(k):
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 17, 5], np.int32)
    ref = _greedy_reference(params, cfg, prompt, 10)

    dec = SpeculativeDecoder(params, cfg, params, cfg, k=k, max_len=64)
    out, stats = dec.generate(prompt, 10)
    assert out == ref, (out, ref)
    assert stats["acceptance"] == 1.0


def test_random_draft_still_exact():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    target = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    draft = llama.init_random_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    prompt = np.asarray([7, 1, 4, 4], np.int32)
    ref = _greedy_reference(target, cfg, prompt, 12)

    dec = SpeculativeDecoder(target, cfg, draft, cfg, k=3, max_len=64)
    out, stats = dec.generate(prompt, 12)
    assert out == ref, (out, ref)
    assert stats["proposed"] > 0


@pytest.mark.slow
def test_quantized_target_with_smaller_draft():
    """AQLM target + a shallower draft (the intended deployment shape)."""
    import dataclasses

    cfg = llama.ModelConfig.tiny(num_layers=2)
    target = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference")
    dcfg = dataclasses.replace(cfg, num_layers=1)
    draft = llama.init_random_params(jax.random.PRNGKey(1), dcfg, dtype=jnp.float32)

    prompt = np.asarray([3, 2, 1], np.int32)
    ids = list(prompt)
    ref = []
    for _ in range(8):
        logits, _ = llama.forward(target, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        ref.append(tok)
        ids.append(tok)

    dec = SpeculativeDecoder(target, cfg, draft, dcfg, k=2, max_len=64)
    out, _ = dec.generate(prompt, 8)
    assert out == ref, (out, ref)
