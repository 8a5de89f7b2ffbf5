"""Flash-decode kernel vs the head-major XLA attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.models.common import attention_headmajor
from aqlm_tpu.ops.flash_decode import flash_decode_attention


def _mask(lengths, b, s):
    key_pos = np.broadcast_to(np.arange(s)[None, :], (b, s))
    return jnp.asarray(key_pos < np.asarray(lengths)[:, None])[:, None, None, :]


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_flash_matches_oracle_bf16(key, hq, hkv):
    b, s, d = 2, 64, 32
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    lengths = jnp.asarray([17, 64], jnp.int32)

    got = flash_decode_attention(q, k, v, None, None, lengths)
    ref = attention_headmajor(  # f32 oracle: CPU XLA lacks some bf16 dots
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), _mask(lengths, b, s)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.03, rtol=0.03
    )


def test_flash_matches_oracle_int8(key):
    b, s, d, hq, hkv = 2, 128, 32, 8, 4
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    k8 = jax.random.randint(kk, (b, hkv, s, d), -127, 128, jnp.int32).astype(jnp.int8)
    v8 = jax.random.randint(kv, (b, hkv, s, d), -127, 128, jnp.int32).astype(jnp.int8)
    ks = jax.random.uniform(kk, (b, hkv, s, 1), jnp.float32, 0.01, 0.03)
    vs = jax.random.uniform(kv, (b, hkv, s, 1), jnp.float32, 0.01, 0.03)
    lengths = jnp.asarray([5, 100], jnp.int32)

    got = flash_decode_attention(q, k8, v8, ks, vs, lengths)
    k = k8.astype(jnp.float32) * ks
    v = v8.astype(jnp.float32) * vs
    ref = attention_headmajor(q.astype(jnp.float32), k, v, _mask(lengths, b, s))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05, rtol=0.05
    )


def test_flash_sliding_window_matches_oracle(key):
    """Windowed flash decode vs the XLA mask oracle with the window BINDING
    (length > window): only keys in (q - window, q] may contribute."""
    b, s, d, hq, hkv, window = 2, 128, 32, 8, 4, 24
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    lengths = jnp.asarray([100, 20], jnp.int32)  # binds for row 0, not row 1

    got = flash_decode_attention(q, k, v, None, None, lengths, window=window)
    key_pos = np.broadcast_to(np.arange(s)[None, :], (b, s))
    L = np.asarray(lengths)[:, None]
    mask = jnp.asarray((key_pos < L) & (key_pos >= L - window))[:, None, None, :]
    ref = attention_headmajor(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), mask
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.03, rtol=0.03
    )


def test_flash_window_tile_skip_matches_oracle(key):
    """Multi-tile cache (2048 keys, 512-key tiles) with a 100-key window:
    the grid visits only ceil(window/ts)+1 = 2 tiles per row (start clamped
    per batch row) and must still match the full masked oracle."""
    b, s, d, hq, hkv, window = 3, 2048, 32, 4, 4, 100
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    # rows exercise: window straddling a tile boundary, start clamped to 0,
    # and length at the cache end
    lengths = jnp.asarray([560, 40, 2048], jnp.int32)

    got = flash_decode_attention(q, k, v, None, None, lengths, window=window)
    key_pos = np.broadcast_to(np.arange(s)[None, :], (b, s))
    L = np.asarray(lengths)[:, None]
    mask = jnp.asarray((key_pos < L) & (key_pos >= L - window))[:, None, None, :]
    ref = attention_headmajor(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), mask
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.03, rtol=0.03
    )


def test_flash_indexed_window_tile_skip_matches_oracle(key):
    """Layer-indexed variant of the tile-skip path over a stacked cache."""
    from aqlm_tpu.ops.flash_decode import flash_decode_attention_indexed

    L_layers, b, s, d, hq, hkv, window = 2, 2, 2048, 32, 4, 4, 100
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    k_all = jax.random.normal(kk, (L_layers, b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v_all = jax.random.normal(kv, (L_layers, b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    lengths = jnp.asarray([560, 2048], jnp.int32)

    for li in range(L_layers):
        got = flash_decode_attention_indexed(
            q, k_all, v_all, None, None, jnp.asarray(li), lengths, window=window
        )
        key_pos = np.broadcast_to(np.arange(s)[None, :], (b, s))
        Lm = np.asarray(lengths)[:, None]
        mask = jnp.asarray((key_pos < Lm) & (key_pos >= Lm - window))[:, None, None, :]
        ref = attention_headmajor(
            q.astype(jnp.float32), k_all[li].astype(jnp.float32),
            v_all[li].astype(jnp.float32), mask,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=0.03, rtol=0.03,
        )


def test_windowed_model_decode_flash_vs_xla(key):
    """End-to-end: a sliding-window model (mistral-style) decodes identically
    through the flash kernel and the XLA mask path once the cache outgrows
    the window — the case that previously forced the XLA fallback."""
    from aqlm_tpu.config import SCHEME_2X8
    from aqlm_tpu.models import llama
    from aqlm_tpu.models.quantize import random_quantized_params
    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params

    cfg = llama.ModelConfig.tiny(num_layers=2, sliding_window=8)
    params = random_quantized_params(
        key, cfg, SCHEME_2X8, mode="codes", dtype=jnp.float32
    )
    stacked = stack_layer_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 14), 0, cfg.vocab_size)

    def rollout(use_flash):
        # one jitted step reused across positions: the eager form re-traced
        # forward_stacked (and its interpret-mode kernels) per token, which
        # alone cost ~4 min of suite time
        step = jax.jit(
            lambda p, c, tok, off: forward_stacked(
                p, cfg, tok, cache=c, cache_offset=off,
                use_flash_decode=use_flash,
            )
        )
        cache = init_kv_cache(cfg, 2, 128)  # 128-aligned: flash-eligible
        outs = []
        for pos in range(ids.shape[1]):
            lg, cache = step(
                stacked, cache, ids[:, pos : pos + 1],
                jnp.full((2,), pos, jnp.int32),
            )
            outs.append(lg[:, 0])
        return outs

    for ref, got in zip(rollout(False), rollout(True)):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


@pytest.mark.parametrize("window", [None, 100])
@pytest.mark.parametrize("quantized", [True, False])
def test_fused_write_attention_matches_two_launch(key, quantized, window):
    """The single-launch write+attend kernel == kv_write[4]_inplace followed
    by flash_decode_attention_indexed: same updated cache, same attention."""
    from aqlm_tpu.ops.flash_decode import (
        flash_decode_attention_indexed,
        flash_decode_write_attention_indexed,
        kv_write4_inplace,
        kv_write_inplace,
    )

    L_layers, b, s, d, hq, hkv = 2, 2, 1024, 32, 8, 4
    kq, kk, kv, kn = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, hq, d), jnp.float32).astype(jnp.bfloat16)
    offsets = jnp.asarray([700, 31], jnp.int32)  # mid-tile and window-edge rows
    li = jnp.asarray(1, jnp.int32)

    if quantized:
        k_all = jax.random.randint(kk, (L_layers, b, hkv, s, d), -127, 128, jnp.int32).astype(jnp.int8)
        v_all = jax.random.randint(kv, (L_layers, b, hkv, s, d), -127, 128, jnp.int32).astype(jnp.int8)
        ks_all = jax.random.uniform(kk, (L_layers, b, hkv, s, 1), jnp.float32, 0.01, 0.03)
        vs_all = jax.random.uniform(kv, (L_layers, b, hkv, s, 1), jnp.float32, 0.01, 0.03)
        k_new = jax.random.randint(kn, (b, 1, hkv, d), -127, 128, jnp.int32).astype(jnp.int8)
        v_new = jax.random.randint(kn, (b, 1, hkv, d), -127, 128, jnp.int32).astype(jnp.int8)
        ks_new = jax.random.uniform(kn, (b, 1, hkv, 1), jnp.float32, 0.01, 0.03)
        vs_new = jax.random.uniform(kn, (b, 1, hkv, 1), jnp.float32, 0.01, 0.03)

        hm = lambda a: jnp.moveaxis(a, 1, 2)
        k2, v2, ks2, vs2 = kv_write4_inplace(
            k_all.copy(), v_all.copy(), ks_all.copy(), vs_all.copy(),
            hm(k_new), hm(v_new), hm(ks_new), hm(vs_new), li, offsets,
        )
        ref_attn = flash_decode_attention_indexed(
            q, k2, v2, ks2, vs2, li, offsets + 1, window=window
        )
        got_attn, gk, gv, gks, gvs = flash_decode_write_attention_indexed(
            q, k_new, v_new, k_all, v_all, ks_all, vs_all, li, offsets,
            k_scale_new=ks_new, v_scale_new=vs_new, window=window,
        )
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(v2))
        np.testing.assert_allclose(np.asarray(gks), np.asarray(ks2), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(gvs), np.asarray(vs2), rtol=0, atol=0)
    else:
        k_all = jax.random.normal(kk, (L_layers, b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
        v_all = jax.random.normal(kv, (L_layers, b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
        k_new = jax.random.normal(kn, (b, 1, hkv, d), jnp.float32).astype(jnp.bfloat16)
        v_new = jax.random.normal(kn, (b, 1, hkv, d), jnp.float32).astype(jnp.bfloat16)

        hm = lambda a: jnp.moveaxis(a, 1, 2)
        k2 = kv_write_inplace(k_all.copy(), hm(k_new), li, offsets)
        v2 = kv_write_inplace(v_all.copy(), hm(v_new), li, offsets)
        ref_attn = flash_decode_attention_indexed(
            q, k2, v2, None, None, li, offsets + 1, window=window
        )
        got_attn, gk, gv, _, _ = flash_decode_write_attention_indexed(
            q, k_new, v_new, k_all, v_all, None, None, li, offsets, window=window
        )
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(v2))

    np.testing.assert_allclose(
        np.asarray(got_attn, np.float32), np.asarray(ref_attn, np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_flash_length_one(key):
    """Degenerate single-valid-key case: output must equal that value row."""
    b, s, d, h = 1, 16, 8, 2
    q = jax.random.normal(key, (b, 1, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d)).astype(jnp.bfloat16)
    out = flash_decode_attention(q, k, v, None, None, jnp.asarray([1]))
    np.testing.assert_allclose(
        np.asarray(out[0, 0], np.float32), np.asarray(v[0, :, 0, :], np.float32), atol=2e-2
    )
