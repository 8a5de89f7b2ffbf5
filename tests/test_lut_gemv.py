"""LUT-GEMM decode kernel: exactness vs the reference dequant path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import aqlm_matmul_reference, random_aqlm_weight
from aqlm_tpu.ops.lut_gemv import lut_gemv_kx8
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul


@pytest.mark.parametrize("scheme_name,b", [("2x8g8", 1), ("1x8g8", 4), ("2x3g4", 2), ("8x8g8", 1)])
def test_lut_gemv_matches_reference(key, scheme_name, b):
    scheme = AqlmScheme.parse(scheme_name)
    w = random_aqlm_weight(key, scheme, 128, 128)
    q = QuantizedLinear.from_aqlm(w, mode="codes")
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 128), jnp.float32)
    ref = np.asarray(aqlm_matmul_reference(x, w), np.float32)
    from aqlm_tpu.ops.lut_gemv import lut_gemv_kx8_tiled

    got = np.asarray(
        lut_gemv_kx8_tiled(x, q.codes_tl, q.codebooks, q.scales, q.bias, group=scheme.in_group_size),
        np.float32,
    )
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel  # bf16 codebook storage tolerance


def test_dispatcher_picks_lut_for_decode(key):
    """codes-mode matmul at small batch equals the one-hot path exactly
    (same codebooks/scales; both are exact up to accumulation order)."""
    scheme = AqlmScheme.parse("2x8g8")
    w = random_aqlm_weight(key, scheme, 128, 128)
    q = QuantizedLinear.from_aqlm(w, mode="codes")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128), jnp.bfloat16)
    y_small = np.asarray(quantized_matmul(x, q), np.float32)  # lut path (B=2)
    x_big = jnp.broadcast_to(x[:1], (16, 128))  # one-hot path (B=16)
    y_big = np.asarray(quantized_matmul(x_big, q), np.float32)
    np.testing.assert_allclose(y_small[0], y_big[0], atol=0.35, rtol=0.05)


def test_lut_gemv_indexed_matches_sliced(key):
    """Scalar-prefetch layer indexing == slicing the layer out first."""
    from aqlm_tpu.ops.lut_gemv import lut_gemv_kx8, lut_gemv_kx8_indexed

    L, K, IG, OUT, G = 3, 2, 16, 256, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codes = jax.random.randint(k1, (L, K, IG, OUT), 0, 256).astype(jnp.uint8)
    cbs = jax.random.normal(k2, (L, K, 256, G), jnp.float32)
    scales = jax.random.normal(k3, (L, OUT), jnp.float32)
    x = jax.random.normal(k4, (2, IG * G), jnp.bfloat16)
    from aqlm_tpu.ops.lut_gemv import tile_codes

    codes_tl = jnp.stack([tile_codes(codes[li]) for li in range(L)])
    for li in range(L):
        ref = lut_gemv_kx8(
            x, codes[li], cbs[li], scales[li], group=G
        )
        got = lut_gemv_kx8_indexed(
            x, codes_tl, cbs, scales, jnp.int32(li), group=G
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=1e-5, atol=1e-5
        )
