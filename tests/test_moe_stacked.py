"""Stacked-expert MoE equivalence: the einsum-over-E form must match the
per-expert loop exactly (dense experts)."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import mixtral


def test_stacked_experts_match_loop(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))

    ref = mixtral._moe_mlp(x, layer, cfg)
    stacked = mixtral.stack_experts(layer, cfg)
    got = mixtral.moe_mlp_stacked(x, stacked, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_stacked_int8_experts_match_loop(key):
    """int8 experts: one all-expert kernel == the per-expert loop."""
    from aqlm_tpu.serve.fuse import int8_linear_from_dense

    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    layer = dict(params["layers"][0])
    for e in range(cfg.num_experts):
        for proj in mixtral.EXPERT_PROJS:
            name = f"experts.{e}.{proj}"
            layer[name] = int8_linear_from_dense(layer[name].weight)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))

    ref = mixtral._moe_mlp(x, layer, cfg)  # per-expert loop, int8 kernels
    stacked = mixtral.stack_experts(layer, cfg)
    assert isinstance(stacked["experts_gate_proj"], mixtral.StackedInt8Experts)
    got = mixtral.moe_mlp_stacked(x, stacked, cfg)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=5e-3, rtol=5e-3
    )
