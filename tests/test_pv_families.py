"""PV-tuning over the non-llama families: the chunked-KL training path
(return_hidden + pv/losses head projection, incl. cohere's logit_scale)
must equal the full-logit KL, and a grad+apply step must move the
continuous params. Reference scope: finetune.py drives any supported
family through the same distillation loop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models import cohere, falcon, opt
from aqlm_tpu.models.family import forward_fn
from aqlm_tpu.models.quantize import random_quantize_projections
from aqlm_tpu.pv import PVConfig, init_pv_state, make_pv_step

SCHEME = AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8)

FAMILIES = {
    "cohere": (cohere, cohere.CohereConfig.tiny(num_layers=1)),
    "falcon": (falcon, falcon.FalconConfig.tiny(num_layers=1)),
    "opt": (opt, opt.OptConfig.tiny(num_layers=1)),
}


def _setup(name):
    mod, cfg = FAMILIES[name]
    teacher = mod.init_random_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    student = random_quantize_projections(
        jax.random.PRNGKey(0),
        mod.init_random_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32),
        SCHEME,
    )
    return mod, cfg, teacher, student


@pytest.mark.parametrize("name", list(FAMILIES))
def test_pv_chunked_matches_full_logit(name):
    mod, cfg, teacher, student = _setup(name)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    losses = {}
    for chunk in (0, 8):
        pv = PVConfig(chunk_tokens=chunk)
        fns = make_pv_step(cfg, cfg, pv, forward_fn=forward_fn(cfg))
        state = init_pv_state(student, optax.adamw(pv.lr), optax.adam(pv.code_lr))
        losses[chunk], _ = jax.jit(fns.grad_fn)(state, teacher, ids)
    np.testing.assert_allclose(float(losses[0]), float(losses[8]), rtol=1e-3)


@pytest.mark.parametrize("name", list(FAMILIES))
def test_pv_step_moves_continuous_params(name):
    mod, cfg, teacher, student = _setup(name)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    pv = PVConfig(lr=1e-3, code_lr=3e-3, chunk_tokens=8)
    fns = make_pv_step(cfg, cfg, pv, forward_fn=forward_fn(cfg))
    cont_opt, st_opt = optax.adamw(pv.lr), optax.adam(pv.code_lr)
    state = init_pv_state(student, cont_opt, st_opt)

    qname = next(
        n for n, v in state.trainable["layers"][0].items()
        if getattr(v, "codebooks", None) is not None
    )
    cb_before = np.asarray(state.trainable["layers"][0][qname].codebooks)
    loss, grads = jax.jit(fns.grad_fn)(state, teacher, ids)
    assert np.isfinite(float(loss))
    state = jax.jit(fns.apply_fn)(state, grads)
    cb_after = np.asarray(state.trainable["layers"][0][qname].codebooks)
    assert not np.allclose(cb_before, cb_after)
