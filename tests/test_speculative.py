"""Speculative decoding: greedy draft-and-verify must emit EXACTLY the
target's own greedy decode — with a perfect draft (acceptance 1.0), an
unrelated random draft (mostly rejected), and a quantized target. The
sampled (temperature > 0) accept/resample rule is property-tested: the
emitted token's distribution must equal the target distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.serve.speculative import SpeculativeDecoder, speculative_accept


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


def test_accept_resample_matches_target_distribution():
    """Leviathan correctness: over many trials (draft ~ q, accept/resample),
    the first emitted token is distributed exactly as the target p — even
    when p and q disagree badly."""
    V, k = 7, 3
    kp, kq = jax.random.split(jax.random.PRNGKey(42))
    p = jax.nn.softmax(3.0 * jax.random.normal(kp, (k + 1, V)))
    q = jax.nn.softmax(3.0 * jax.random.normal(kq, (k, V)))

    def trial(key):
        kd, ka = jax.random.split(key)
        draft = jax.vmap(lambda kk, row: jax.random.categorical(kk, jnp.log(row)))(
            jax.random.split(kd, k), q
        ).astype(jnp.int32)
        n_acc, bonus = speculative_accept(p, q, draft, ka)
        return jnp.where(n_acc >= 1, draft[0], bonus)

    n = 40000
    toks = jax.jit(jax.vmap(trial))(jax.random.split(jax.random.PRNGKey(0), n))
    freq = np.bincount(np.asarray(toks), minlength=V) / n
    tv = 0.5 * np.abs(freq - np.asarray(p[0])).sum()
    assert tv < 0.02, (tv, freq, np.asarray(p[0]))


def test_accept_all_bonus_comes_from_last_row():
    """With q == p the accept prob is exactly 1; bonus ~ p[k]."""
    V, k = 5, 2
    p = jax.nn.softmax(2.0 * jax.random.normal(jax.random.PRNGKey(3), (k + 1, V)))
    q = p[:k]

    def trial(key):
        kd, ka = jax.random.split(key)
        draft = jax.vmap(lambda kk, row: jax.random.categorical(kk, jnp.log(row)))(
            jax.random.split(kd, k), q
        ).astype(jnp.int32)
        n_acc, bonus = speculative_accept(p, q, draft, ka)
        return n_acc, bonus

    n = 20000
    n_acc, bonus = jax.jit(jax.vmap(trial))(jax.random.split(jax.random.PRNGKey(1), n))
    assert int(jnp.min(n_acc)) == k  # identical distributions always accept
    freq = np.bincount(np.asarray(bonus), minlength=V) / n
    tv = 0.5 * np.abs(freq - np.asarray(p[k])).sum()
    assert tv < 0.02, (tv, freq)


def test_sampled_self_draft_accepts_everything():
    """temperature > 0 with draft == target: p == q at every position, so
    every proposal is accepted (min(1, p/q) = 1) and decoding still works."""
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 17, 5], np.int32)
    dec = SpeculativeDecoder(
        params, cfg, params, cfg, k=3, max_len=64, temperature=0.8, top_p=0.95, seed=7
    )
    out, stats = dec.generate(prompt, 12)
    assert len(out) == 12
    assert stats["acceptance"] == 1.0, stats


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
