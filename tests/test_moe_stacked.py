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


def _codes_moe_layer(key, cfg):
    """Replace every expert projection with a codes-mode 2x8 QuantizedLinear."""
    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.ops.dequant import random_aqlm_weight
    from aqlm_tpu.ops.runtime import QuantizedLinear

    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    layer = dict(params["layers"][0])
    h, inter = cfg.hidden_size, cfg.intermediate_size
    dims = {"gate_proj": (inter, h), "up_proj": (inter, h), "down_proj": (h, inter)}
    kk = key
    for e in range(cfg.num_experts):
        for proj in mixtral.EXPERT_PROJS:
            kk, sub = jax.random.split(kk)
            out_f, in_f = dims[proj]
            w = random_aqlm_weight(sub, scheme, out_f, in_f)
            layer[f"experts.{e}.{proj}"] = QuantizedLinear.from_aqlm(w, mode="codes")
    return layer


def test_stacked_codes_experts_match_loop(key):
    """Kx8 codes experts: the all-expert LUT kernel (decode) and the one-hot
    loop (prefill) both match the per-expert loop."""
    cfg = mixtral.MixtralConfig.tiny_moe(
        num_layers=1, hidden_size=128, intermediate_size=128, num_experts=2)
    layer = _codes_moe_layer(key, cfg)
    stacked = mixtral.stack_experts(layer, cfg)
    assert isinstance(stacked["experts_gate_proj"], mixtral.StackedCodesExperts)

    for b, t in ((1, 2), (2, 16)):  # decode (LUT path) and prefill (one-hot)
        x = jax.random.normal(jax.random.PRNGKey(t), (b, t, cfg.hidden_size))
        ref = mixtral._moe_mlp(x, layer, cfg)
        got = mixtral.moe_mlp_stacked(x, stacked, cfg)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-3, rtol=2e-3)


def test_stacked_codes_experts_indexed(key):
    """Layer-indexed codes MoE (scan serving path) == direct stacked form."""
    cfg = mixtral.MixtralConfig.tiny_moe(
        num_layers=1, hidden_size=128, intermediate_size=128, num_experts=2)
    layer = _codes_moe_layer(key, cfg)
    stacked = mixtral.stack_experts(layer, cfg)

    # stack a 2-layer model from two copies of the same layer
    two = jax.tree.map(lambda *xs: jnp.stack(xs), stacked, stacked)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, cfg.hidden_size))
    ref = mixtral.moe_mlp_stacked(x, stacked, cfg)
    for idx in (0, 1):
        got = mixtral.moe_mlp_stacked_indexed(
            x, stacked, two, jnp.asarray(idx, jnp.int32), cfg)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-4, rtol=2e-4)


def test_stacked_int4_experts_match_loop(key):
    """int4 experts: one all-expert W4A16 kernel == the per-expert loop."""
    from aqlm_tpu.serve.fuse import int4_linear_from_dense

    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    layer = dict(params["layers"][0])
    for e in range(cfg.num_experts):
        for proj in mixtral.EXPERT_PROJS:
            name = f"experts.{e}.{proj}"
            layer[name] = int4_linear_from_dense(layer[name].weight)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))

    ref = mixtral._moe_mlp(x, layer, cfg)  # per-expert loop, int4 kernels
    stacked = mixtral.stack_experts(layer, cfg)
    assert isinstance(stacked["experts_gate_proj"], mixtral.StackedInt4Experts)
    got = mixtral.moe_mlp_stacked(x, stacked, cfg)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=5e-3, rtol=5e-3
    )


def test_stacked_int4_experts_indexed(key):
    """Layer-indexed all-expert int4 kernel picks the right layer."""
    from aqlm_tpu.serve.fuse import int4_linear_from_dense

    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=2)
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    stacked_per_layer = []
    for li in range(2):
        layer = dict(params["layers"][li])
        for e in range(cfg.num_experts):
            for proj in mixtral.EXPERT_PROJS:
                name = f"experts.{e}.{proj}"
                layer[name] = int4_linear_from_dense(layer[name].weight)
        stacked_per_layer.append(mixtral.stack_experts(layer, cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.hidden_size))

    stacked_L = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_per_layer)
    for li in range(2):
        ref = mixtral.moe_mlp_stacked(x, stacked_per_layer[li], cfg)
        got = mixtral.moe_mlp_stacked_indexed(
            x, stacked_per_layer[li], stacked_L, jnp.asarray(li), cfg
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=5e-3, rtol=5e-3,
        )
