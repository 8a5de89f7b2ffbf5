"""Projection-fusion tests: fused QKV/gate-up and int8 lm_head must match the
unfused int8 model bit-for-bit (same int8 weights, same math)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, stack_layer_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig
from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8


def test_fused_forward_matches_unfused(key):
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="int8", dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)

    ref, _ = forward_stacked(stack_layer_params(params), cfg, ids)

    fused = fuse_projections(params, cfg)
    layer = fused["layers"][0]
    assert "qkv_proj" in layer and "q_proj" not in layer
    assert "gateup_proj" in layer and "gate_proj" not in layer
    got, _ = forward_stacked(stack_layer_params(fused), cfg, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-4, rtol=1e-4
    )


def test_lm_head_int8_close(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="int8", dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    ref, _ = forward_stacked(stack_layer_params(params), cfg, ids)
    q = quantize_lm_head_int8(params)
    got, _ = forward_stacked(stack_layer_params(q), cfg, ids)
    # int8 head is lossy but top-1 should agree nearly everywhere
    agree = (np.asarray(jnp.argmax(got, -1)) == np.asarray(jnp.argmax(ref, -1))).mean()
    assert agree > 0.9, agree


def test_engine_fusion_consistency(key):
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="int8", dtype=jnp.float32)
    prompt = np.asarray([3, 17, 5], np.int32)
    e1 = Engine(params, cfg, ServeConfig(max_batch=1, max_len=32, prefill_buckets=(8,), fuse_projections=False))
    e2 = Engine(params, cfg, ServeConfig(max_batch=1, max_len=32, prefill_buckets=(8,), fuse_projections=True))
    out1 = e1.generate([prompt], SamplingParams(max_new_tokens=5))[0]
    out2 = e2.generate([prompt], SamplingParams(max_new_tokens=5))[0]
    assert out1 == out2, (out1, out2)


def test_concat_codes_interleaved_layout(key):
    """tp>1 fused codes layout contract: shard s's tile block dequantizes to
    [q_s, k_s, v_s] (each part's s-th OUT slice), and out_sizes are the
    per-shard local widths — what serve/tp.py's column sharding relies on."""
    from aqlm_tpu.ops.dequant import random_aqlm_weight
    from aqlm_tpu.ops.kernels import dequantize_onehot
    from aqlm_tpu.ops.lut_gemv import untile_codes
    from aqlm_tpu.ops.runtime import QuantizedLinear
    from aqlm_tpu.serve.fuse import _codes_fusible, _concat_codes

    tp, out, infeat = 2, 256, 128  # tn = 128 -> 2 tiles per projection
    keys = jax.random.split(key, 3)
    lins = [
        QuantizedLinear.from_aqlm(
            random_aqlm_weight(k, SCHEME_2X8, out, infeat), mode="codes"
        )
        for k in keys
    ]
    fused = _concat_codes(lins, tp=tp)
    assert fused.out_sizes == (out // tp,) * 3

    def dense(codes_tl, codebooks, scales, scheme):
        return dequantize_onehot(
            untile_codes(codes_tl, scheme.num_codebooks), codebooks, scales,
            group=scheme.in_group_size, dtype=jnp.float32,
        ).T  # [OUT, IN]

    tn = lins[0].codes_tl.shape[2]
    tiles_per_shard = sum(sz // tn for sz in fused.out_sizes)
    for s in range(tp):
        shard_tiles = fused.codes_tl[s * tiles_per_shard : (s + 1) * tiles_per_shard]
        shard_scales = fused.scales[s * (3 * out // tp) : (s + 1) * (3 * out // tp)]
        off = 0
        for p, l in enumerate(lins):
            w_full = dense(l.codes_tl, l.codebooks, l.scales, l.scheme)
            loc = out // tp
            got = dense(
                shard_tiles[off // tn : (off + loc) // tn],
                fused.codebooks[p],
                shard_scales[off : off + loc],
                fused.scheme,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(w_full[s * loc : (s + 1) * loc]),
                atol=1e-6, rtol=1e-6,
            )
            off += loc

    # non-tile-divisible projections must refuse the interleaved layout
    small = QuantizedLinear.from_aqlm(
        random_aqlm_weight(keys[0], SCHEME_2X8, 128, infeat), mode="codes"
    )
    assert not _codes_fusible([small, small], tp=2)  # 1 tile, tp=2
    assert _codes_fusible(lins, tp=tp)


@pytest.mark.slow
def test_codes_fusion_matches_unfused(key):
    """Fused qkv/gate+up codes decode == unfused codes decode (stacked scan)."""
    import copy

    from aqlm_tpu.models.quantize import random_quantized_params
    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
    from aqlm_tpu.serve.fuse import fuse_projections_codes

    # projection widths must be 128-multiples (proj-map tile granularity)
    cfg = llama.ModelConfig.tiny(
        num_layers=2, hidden_size=128, intermediate_size=256,
        num_heads=8, num_kv_heads=8,
    )
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="codes", dtype=jnp.float32)
    fused = fuse_projections_codes(copy.deepcopy(params), cfg)
    assert "qkv_proj" in fused["layers"][0] and "gateup_proj" in fused["layers"][0]

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)
    s_ref = stack_layer_params(params)
    s_fused = stack_layer_params(fused)

    # decode rollout (B=2 <= LUT_GEMV_MAX_BATCH -> grouped lut kernel)
    cache_a = init_kv_cache(cfg, 2, 16)
    cache_b = init_kv_cache(cfg, 2, 16)
    for pos in range(ids.shape[1]):
        off = jnp.full((2,), pos, jnp.int32)
        la, cache_a = forward_stacked(s_ref, cfg, ids[:, pos : pos + 1], cache=cache_a, cache_offset=off)
        lb, cache_b = forward_stacked(s_fused, cfg, ids[:, pos : pos + 1], cache=cache_b, cache_offset=off)
        np.testing.assert_allclose(
            np.asarray(lb, np.float32), np.asarray(la, np.float32), atol=2e-3, rtol=2e-3
        )

    # prefill (t>1 -> one-hot split path)
    la, _ = forward_stacked(s_ref, cfg, ids)
    lb, _ = forward_stacked(s_fused, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(lb, np.float32), np.asarray(la, np.float32), atol=2e-3, rtol=2e-3
    )
