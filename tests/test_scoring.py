"""Loglikelihood scoring + distributed-helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.data import score_batch, score_loglikelihood
from aqlm_tpu.models import llama
from aqlm_tpu.parallel import initialize_distributed, is_multihost, make_multihost_mesh, sync_hosts


def test_score_matches_manual(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    ctx = np.asarray([5, 9, 2], np.int32)
    cont = np.asarray([7, 1], np.int32)

    ll, greedy = score_loglikelihood(params, cfg, ctx, cont)

    ids = jnp.asarray(np.concatenate([ctx, cont]))[None, :]
    logits, _ = llama.forward(params, cfg, ids)
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
    manual = float(lp[2, 7] + lp[3, 1])
    np.testing.assert_allclose(ll, manual, rtol=1e-5)
    expected_greedy = bool(
        (np.asarray(lp[2:4]).argmax(-1) == np.asarray(cont)).all()
    )
    assert greedy == expected_greedy


def test_score_batch_padding_invariance(key):
    """Padding to a longer shared length must not change any score."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    ctxs = [np.asarray([1, 2], np.int32), np.asarray([3, 4, 5, 6], np.int32)]
    conts = [np.asarray([9], np.int32), np.asarray([8, 7], np.int32)]
    a = score_batch(params, cfg, ctxs, conts)
    b = score_batch(params, cfg, ctxs, conts, pad_len=16)
    for (la, ga), (lb, gb) in zip(a, b):
        np.testing.assert_allclose(la, lb, rtol=1e-5)
        assert ga == gb


def test_distributed_helpers_single_host():
    initialize_distributed()  # no-op single process
    assert not is_multihost()
    sync_hosts()  # no-op
    mesh = make_multihost_mesh(model=4)
    assert mesh.shape["model"] == 4
    assert mesh.shape["data"] == 2  # 8 fake devices / 4


def test_rolling_windows_long_document(key):
    """A doc longer than max_position_embeddings scores via rolling windows
    and equals the short-doc path on short input."""
    import dataclasses

    from aqlm_tpu.data.scoring import make_lm_eval_adapter, score_loglikelihood

    lm_eval = pytest.importorskip("lm_eval")

    cfg = dataclasses.replace(llama.ModelConfig.tiny(num_layers=1), max_position_embeddings=16)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg)

    class TinyTok:
        def __call__(self, text, add_special_tokens=False):
            class R: pass
            r = R(); r.input_ids = [ord(c) % 250 for c in text]
            return r

    adapter = make_lm_eval_adapter(params, cfg, TinyTok())

    class Req:
        def __init__(self, *args): self.args = args

    long_doc = "abcdefgh" * 6  # 48 tokens > 16-token context
    (ll_long,), = adapter.loglikelihood_rolling([Req(long_doc)])
    assert np.isfinite(ll_long)

    short_doc = "abcdefgh"  # 8 tokens, single window
    (ll_short,), = adapter.loglikelihood_rolling([Req(short_doc)])
    ids = np.asarray([ord(c) % 250 for c in short_doc], np.int32)
    ll_ref, _ = score_loglikelihood(params, cfg, ids[:1], ids[1:])
    np.testing.assert_allclose(ll_short, ll_ref, rtol=1e-5)


def test_sharded_ppl_matches_single_device(key):
    from aqlm_tpu.data.eval import evaluate_perplexity, evaluate_perplexity_sharded
    from aqlm_tpu.parallel import make_mesh

    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (7, 24), 0, cfg.vocab_size)  # 7 rows: pads to 8

    ref = evaluate_perplexity(params, cfg, ids, batch_size=4)
    mesh = make_mesh(data=8, model=1)
    got = evaluate_perplexity_sharded(params, cfg, ids, mesh)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
