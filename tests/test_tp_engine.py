"""TP continuous-batching engine on the 8-virtual-device CPU mesh: the
TPEngine must emit token-for-token what the single-chip Engine emits
(greedy), through chunked prefill, staggered admissions, and prefix reuse."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.parallel import make_mesh
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig
from aqlm_tpu.serve.fuse import quantize_lm_head_int8
from aqlm_tpu.serve.tp_engine import TPEngine


def _models(mode):
    cfg = llama.ModelConfig.tiny(num_layers=2, num_heads=8, num_kv_heads=4)
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode=mode, dtype=jnp.float32
    )
    if mode == "int8":
        params = quantize_lm_head_int8(params)
    return cfg, params


@pytest.mark.parametrize("kv_int8", [False, True])
def test_tp_engine_matches_single_chip(kv_int8):
    cfg, params = _models("int8")
    serve = ServeConfig(
        max_batch=2, max_len=64, prefill_buckets=(8, 16), kv_quantized=kv_int8,
        min_prefix=8,
    )
    shared = np.arange(1, 13, dtype=np.int32)
    prompts = [
        np.concatenate([shared, np.asarray([101, 102], np.int32)]),
        np.concatenate([shared, np.asarray([55], np.int32)]),
        np.asarray([9, 8, 7], np.int32),
    ]
    sampling = SamplingParams(max_new_tokens=6)

    cfg2, params2 = _models("int8")
    ref = Engine(params2, cfg2, serve).generate(prompts, sampling)

    mesh = make_mesh(model=4)
    eng = TPEngine(params, cfg, serve, mesh=mesh)
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)
    assert eng.prefix_stats["hits"] >= 1  # prefix caching works sharded too


@pytest.mark.parametrize("quant", [True, False], ids=["int8", "dense"])
def test_tp_engine_mixtral_expert_parallel(quant):
    """Mixtral through the TP engine: attention TP + expert-parallel FFN on
    the same model axis, exact vs the single-chip engine (which serves the
    dense case through the UNstacked per-expert loop — cross-layout check)."""
    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.models import mixtral
    from aqlm_tpu.ops.dequant import random_aqlm_weight
    from aqlm_tpu.ops.runtime import QuantizedLinear

    def quantized_moe(key):
        cfg = mixtral.MixtralConfig.tiny_moe(num_layers=2)
        params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
        if not quant:
            return cfg, params
        scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=8, in_group_size=8)
        kk = jax.random.PRNGKey(7)
        for layer in params["layers"]:
            for name in list(layer):
                lin = layer[name]
                if name == "moe_gate" or not hasattr(lin, "weight"):
                    continue
                if name.startswith(("q_", "k_", "v_", "o_", "experts.")):
                    kk, sub = jax.random.split(kk)
                    w = random_aqlm_weight(sub, scheme, *lin.weight.shape)
                    layer[name] = QuantizedLinear.from_aqlm(w, mode="int8")
        return cfg, params

    cfg, params = quantized_moe(jax.random.PRNGKey(0))
    serve = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,), fuse_projections=False)
    prompts = [np.asarray([1, 2, 3], np.int32), np.asarray([5, 6, 7, 8], np.int32)]
    sampling = SamplingParams(max_new_tokens=6)

    cfg2, params2 = quantized_moe(jax.random.PRNGKey(0))
    ref = Engine(params2, cfg2, serve).generate(prompts, sampling)

    eng = TPEngine(params, cfg, serve, mesh=make_mesh(model=2))
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)


def test_tp_engine_speculative_matches_single_chip():
    """TP x speculation x continuous batching: exact vs the plain engine."""
    cfg, params = _models("int8")
    dcfg = llama.ModelConfig.tiny(num_layers=1, num_heads=8, num_kv_heads=4)
    draft = llama.init_random_params(jax.random.PRNGKey(9), dcfg, dtype=jnp.float32)
    serve = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16))
    prompts = [np.asarray([3, 1, 4, 1], np.int32), np.asarray([2, 7], np.int32)]
    sampling = SamplingParams(max_new_tokens=7)

    cfg2, params2 = _models("int8")
    ref = Engine(params2, cfg2, serve).generate(prompts, sampling)

    eng = TPEngine(
        params, cfg, serve, mesh=make_mesh(model=4),
        draft_params=draft, draft_cfg=dcfg, spec_k=2,
    )
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)
    assert eng.spec_stats["proposed"] > 0


def test_tp_engine_codes_fused_matches_single_chip():
    """codes-mode TP engine with the shard-interleaved FUSED qkv/gate+up
    layout (fuse.py _concat_codes tp>1): token-exact vs the single-chip
    engine, whose fused layout is the plain tp=1 concatenation."""
    from aqlm_tpu.ops.runtime import FusedCodesLinear

    def make():
        # 256-wide everything: per-shard OUT stays a whole tile (tn=128) at
        # tp=2, so every projection takes the fused interleaved layout
        cfg = llama.ModelConfig.tiny(
            num_layers=2, hidden_size=256, intermediate_size=256,
            num_heads=4, num_kv_heads=4,
        )
        params = random_quantized_params(
            jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="codes", dtype=jnp.float32
        )
        return cfg, params

    serve = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16))
    prompts = [np.asarray([1, 2, 3], np.int32), np.asarray([4, 5, 6, 7], np.int32)]
    sampling = SamplingParams(max_new_tokens=6)

    cfg2, params2 = make()
    ref = Engine(params2, cfg2, serve).generate(prompts, sampling)

    cfg, params = make()
    eng = TPEngine(params, cfg, serve, mesh=make_mesh(model=2))
    assert any(
        isinstance(v, FusedCodesLinear) for v in eng.params["layers"].values()
    ), "fused codes layout must land under TP"
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)


def test_tp_engine_decode_chunk():
    cfg, params = _models("int8")
    serve = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,))
    prompts = [np.asarray([1, 2, 3], np.int32), np.asarray([4, 5], np.int32)]
    sampling = SamplingParams(max_new_tokens=9)
    cfg2, params2 = _models("int8")
    ref = Engine(params2, cfg2, serve).generate(prompts, sampling)
    eng = TPEngine(params, cfg, dataclasses.replace(serve, decode_chunk=4),
                   mesh=make_mesh(model=4))
    got = eng.generate(prompts, sampling)
    assert got == ref, (got, ref)
