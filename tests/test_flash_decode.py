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
