"""Loglikelihood scoring + distributed-helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

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
