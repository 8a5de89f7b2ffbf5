"""ConfigurableAdamW tests against a numpy port of the reference math
(/root/reference/src/configurable_adam.py:100-226) + train-state roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aqlm_tpu.io import load_pytree, save_pytree
from aqlm_tpu.pv import configurable_adamw


def _reference_step(p, g, m, v, vhat, t, lr, b1, b2, eps, wd, debias, amsgrad, lamb, clamp):
    """Numpy port of the reference semantics."""
    p = p.copy()
    if not lamb and wd != 0:
        p *= 1 - lr * wd
    if b1 != 0:
        m = m * b1 + g * (1 - b1)
        upd = m.copy()
    else:
        upd = g.copy()
    if b2 != 1:
        v = v * b2 + g * g * (1 - b2) if b2 != 0 else g * g
        denom_v = v
        if amsgrad:
            # standard AMSGrad: v keeps the EMA, v_hat the running max.
            # (the reference's in-place `out=exp_avg_sq` merges the two when
            # the state dtype equals the compute dtype — a storage quirk)
            vhat = np.maximum(vhat, v)
            denom_v = vhat
        upd = upd / (np.sqrt(denom_v) + eps)
    if lamb and wd != 0:
        upd = upd + wd * p
    scale = -lr
    use_debias = debias if debias is not None else (not lamb)
    if use_debias:
        mt = 1 / (1 - b1 ** t) if b1 != 0 else 1
        vt = 1 / np.sqrt(1 - b2 ** t) if b2 != 0 else 1
        scale *= mt / vt
    if lamb:
        wn = np.linalg.norm(p)
        if clamp is not None:
            wn = min(wn, clamp)
        un = np.linalg.norm(upd)
        trust = 1.0 if (wn == 0 or un == 0) else wn / un
        scale *= trust
    return p + scale * upd, m, v, vhat


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),  # plain adam
        dict(amsgrad=True),
        dict(lamb=True),
        dict(lamb=True, weight_decay=0.01, clamp_value=5.0),
        dict(weight_decay=0.01),
        dict(b1=0.0, b2=0.95, amsgrad=True),  # the calibration optimizer
    ],
)
def test_matches_reference_math(key, kwargs):
    lr, b1, b2, eps = 1e-2, kwargs.pop("b1", 0.9), kwargs.pop("b2", 0.999), 1e-6
    wd = kwargs.get("weight_decay", 0.0)
    lamb = kwargs.get("lamb", False)
    amsgrad = kwargs.get("amsgrad", False)
    clamp = kwargs.get("clamp_value", None)

    p0 = np.asarray(jax.random.normal(key, (6, 5)), np.float64)
    opt = configurable_adamw(lr, b1=b1, b2=b2, eps=eps, **kwargs)
    params = jnp.asarray(p0, jnp.float32)
    state = opt.init(params)

    p_ref = p0.copy()
    m = np.zeros_like(p_ref)
    v = np.zeros_like(p_ref)
    vhat = np.zeros_like(p_ref)
    rng = np.random.RandomState(0)
    for t in range(1, 6):
        g = rng.randn(6, 5)
        upd, state = opt.update(jnp.asarray(g, jnp.float32), state, params)
        params = optax.apply_updates(params, upd)
        p_ref, m, v, vhat = _reference_step(
            p_ref, g, m, v, vhat, t, lr, b1, b2, eps, wd,
            None, amsgrad, lamb, clamp,
        )
        np.testing.assert_allclose(np.asarray(params, np.float64), p_ref, rtol=2e-5, atol=1e-6)


def test_reduced_precision_moments(key):
    opt = configurable_adamw(1e-2, exp_avg_dtype=jnp.bfloat16, exp_avg_sq_dtype=jnp.bfloat16)
    params = jax.random.normal(key, (8,))
    state = opt.init(params)
    upd, state = opt.update(jnp.ones((8,)), state, params)
    assert state.exp_avg.dtype == jnp.bfloat16
    assert state.exp_avg_sq.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(upd).all())


def test_train_state_roundtrip(tmp_path, key):
    opt = configurable_adamw(1e-3, amsgrad=True)
    params = {"a": jax.random.normal(key, (4, 3)), "b": {"c": jnp.ones((2,)), "d": None}}
    state = opt.init(params)
    upd, state = opt.update(jax.tree.map(jnp.ones_like, params), state, params)

    path = str(tmp_path / "state.npz")
    save_pytree(path, (params, state), metadata={"step": 7})
    template = (jax.tree.map(jnp.zeros_like, params), opt.init(params))
    (p2, s2), meta = load_pytree(path, template)
    assert meta["step"] == 7
    for a, b in zip(jax.tree.leaves((params, state)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)