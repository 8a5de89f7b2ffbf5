"""W4A16 int4 runtime mode: kernel vs dequant oracle, runtime dispatch,
engine serving, fusion, backward, and tensor-parallel sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.ops.dequant import aqlm_matmul_reference, random_aqlm_weight
from aqlm_tpu.ops.int4_matmul import (
    GROUP,
    dequantize_int4,
    int4_matmul,
    int4_matmul_indexed,
    quantize_int4,
)
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul


@pytest.mark.parametrize("out,infeat", [(256, 384), (512, 1024), (384, 1100)])
def test_int4_kernel_matches_oracle(key, out, infeat):
    dense = jax.random.normal(key, (out, infeat), jnp.float32)
    # worst-case roundtrip bound holds for the UNclipped scale (mse_clip
    # trades rare larger outlier errors for lower RMS)
    w4u, gsu = quantize_int4(dense, mse_clip=False)
    assert float(
        jnp.max(jnp.abs(dequantize_int4(w4u, gsu)[:, :infeat] - dense))
    ) < float(jnp.max(jnp.abs(dense))) / 7.0

    w4, gs = quantize_int4(dense)
    deq = dequantize_int4(w4, gs)

    x = jax.random.normal(jax.random.PRNGKey(1), (3, infeat), jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (0, deq.shape[1] - infeat)))
    y = int4_matmul(x, w4, gs)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(xpad @ deq.T), atol=2e-2, rtol=2e-2
    )

    # layer-indexed stacked variant reads the right layer
    w4b, gsb = quantize_int4(dense[::-1] * 0.5)
    w4a, gsa = jnp.stack([w4, w4b]), jnp.stack([gs, gsb])
    for li, (ww, ss) in enumerate(((w4, gs), (w4b, gsb))):
        yl = int4_matmul_indexed(x, w4a, gsa, li)
        ref = xpad @ dequantize_int4(ww, ss).T
        np.testing.assert_allclose(np.asarray(yl), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_int4_runtime_mode_close_to_reference(key):
    """from_aqlm(mode=int4): output within the 4-bit requantization budget of
    the exact AQLM weight, and exactly the int4-dequant oracle."""
    w = random_aqlm_weight(key, SCHEME_2X8, 256, 256)
    q = QuantizedLinear.from_aqlm(w, mode="int4")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.float32)
    y = quantized_matmul(x, q)
    y_oracle = jnp.pad(x, ((0, 0), (0, 0))) @ dequantize_int4(q.w4, q.w4_gscale)[:, :256].T
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_oracle), atol=2e-2, rtol=2e-2)
    y_exact = aqlm_matmul_reference(x, w)
    rel = float(jnp.linalg.norm(y - y_exact) / jnp.linalg.norm(y_exact))
    # analytic int4-g128 requant noise for ~gaussian weights: step ~= amax/7
    # ~= 0.43 sigma (amax of 128 draws ~= 3 sigma), RMS noise ~= step/sqrt(12)
    # ~= 0.12 sigma -> ~12% relative; anything well past that means a layout
    # or scale bug rather than quantization noise
    assert rel < 0.15, rel


def test_int4_backward_matches_dense(key):
    w = random_aqlm_weight(key, SCHEME_2X8, 256, 256)
    q = QuantizedLinear.from_aqlm(w, mode="int4")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256), jnp.float32)
    wt = dequantize_int4(q.w4, q.w4_gscale)[:, :256]  # [OUT, IN]

    f = lambda xx: jnp.sum(quantized_matmul(xx, q) ** 2)
    g = jax.grad(f)(x)
    ref = jax.grad(lambda xx: jnp.sum((xx @ wt.T) ** 2))(x)
    # the serving VJP runs its einsum in bf16 (frozen-weight PEFT path):
    # compare in norm rather than elementwise
    rel = float(jnp.linalg.norm(g - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


@pytest.mark.slow
def test_int4_engine_matches_forward_and_fuses(key):
    """int4 serving through the engine: fused == unfused token-for-token,
    and the fused layout actually lands."""
    from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig

    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="int4", dtype=jnp.float32)
    prompts = [np.asarray([3, 1, 4], np.int32), np.asarray([5, 9], np.int32)]
    sampling = SamplingParams(max_new_tokens=6)

    base = ServeConfig(max_batch=2, max_len=64, prefill_buckets=(8,))
    e_fused = Engine(params, cfg, base)
    assert e_fused.params["layers"]["qkv_proj"].mode == "int4"
    e_plain = Engine(
        params, cfg, dataclasses.replace(base, fuse_projections=False)
    )
    got = e_fused.generate(prompts, sampling)
    ref = e_plain.generate(prompts, sampling)
    assert got == ref, (got, ref)


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_int4_tp_decode_matches_single_device(fused):
    """int4 column/row sharding over the mesh: the block-local packing keeps
    row-parallel shards aligned with contiguous input columns."""
    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
    from aqlm_tpu.parallel import make_mesh
    from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8
    from aqlm_tpu.serve.tp import make_tp_decode_step, tp_shard_serving_params

    # per-shard packed columns must stay 128-aligned: 512-wide dims at tp=2
    cfg = llama.ModelConfig.tiny(
        num_layers=2, hidden_size=512, intermediate_size=512,
        num_heads=4, num_kv_heads=4,
    )
    tp = 2
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="int4", dtype=jnp.float32
    )
    params = quantize_lm_head_int8(params)
    stacked = stack_layer_params(params)

    b = 2
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, 6), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, b, 16)
    logits_ref = []
    for pos in range(ids.shape[1]):
        lg, cache = forward_stacked(
            stacked, cfg, ids[:, pos : pos + 1], cache=cache,
            cache_offset=jnp.full((b,), pos, jnp.int32),
        )
        logits_ref.append(lg[:, 0])

    tp_params = fuse_projections(params, cfg, tp=tp) if fused else params
    if fused:
        assert tp_params["layers"][0]["qkv_proj"].mode == "int4"
    tp_stacked = stack_layer_params(tp_params)
    mesh = make_mesh(data=8 // tp, model=tp)
    with mesh:
        sharded = tp_shard_serving_params(tp_stacked, mesh)
        step = make_tp_decode_step(cfg, mesh)
        cache_tp = init_kv_cache(cfg, b, 16)
        for pos in range(ids.shape[1]):
            lg, cache_tp = step(
                sharded, cache_tp, ids[:, pos : pos + 1], jnp.full((b,), pos, jnp.int32)
            )
            np.testing.assert_allclose(
                np.asarray(lg[:, 0], np.float32),
                np.asarray(logits_ref[pos], np.float32),
                atol=5e-3, rtol=5e-3,
            )


def test_int4_mse_clip_improves_error(key):
    """The per-group clip search must never be worse than plain amax/7."""
    dense = jax.random.normal(key, (256, 512), jnp.float32)
    w_plain, s_plain = quantize_int4(dense, mse_clip=False)
    w_clip, s_clip = quantize_int4(dense, mse_clip=True)
    err = lambda w4, gs: float(
        jnp.sum((dequantize_int4(w4, gs)[:, :512] - dense) ** 2)
    )
    assert err(w_clip, s_clip) <= err(w_plain, s_plain)
    assert err(w_clip, s_clip) < 0.95 * err(w_plain, s_plain)  # and actually helps
