"""Golden tests for the core AQLM representation and reference dequant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import (
    AqlmWeight,
    aqlm_matmul_reference,
    dequantize_weight,
    random_aqlm_weight,
)
from aqlm_tpu.ops.packing import pack_bits, pack_hf_codes, unpack_bits, unpack_hf_codes


def test_scheme_parse():
    s = AqlmScheme.parse("1x16")
    assert (s.num_codebooks, s.nbits_per_codebook, s.in_group_size) == (1, 16, 8)
    s = AqlmScheme.parse("2x8g16")
    assert (s.num_codebooks, s.nbits_per_codebook, s.in_group_size) == (2, 8, 16)
    assert AqlmScheme.parse("1x16g8").name == "1x16g8"
    with pytest.raises(ValueError):
        AqlmScheme.parse("bogus")


def test_scheme_bits_accounting():
    # Llama-2-7B gate_proj: 11008x4096, 1x16g8 => ~2 bits/param + codebook amortization
    s = AqlmScheme(1, 16, 8)
    bits = s.estimate_nbits_per_parameter(11008, 4096)
    assert 2.0 < bits < 2.4
    assert s.code_bits_per_weight() == 2.0
    # 1x8g8 is the ~1-bit scheme
    assert AqlmScheme(1, 8, 8).code_bits_per_weight() == 1.0


def test_dequantize_tiny_golden():
    """Hand-computed dequant: 2 out rows, 4 in cols, groups 1x2, 1 codebook of 4."""
    scheme = AqlmScheme(num_codebooks=1, nbits_per_codebook=2, in_group_size=2)
    codebooks = jnp.array(
        [[[[1.0, 2.0]], [[3.0, 4.0]], [[5.0, 6.0]], [[7.0, 8.0]]]]
    ).transpose(0, 1, 2, 3)  # [1, 4, 1, 2]
    assert codebooks.shape == (1, 4, 1, 2)
    codes = jnp.array([[[0], [3]], [[2], [1]]], dtype=jnp.uint8)  # [og=2, ig=2, k=1]
    scales = jnp.array([1.0, 10.0])
    w = AqlmWeight(codes=codes, codebooks=codebooks, scales=scales, bias=None, scheme=scheme)
    dense = dequantize_weight(w)
    expected = jnp.array(
        [[1.0, 2.0, 7.0, 8.0], [50.0, 60.0, 30.0, 40.0]]
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(expected))


def test_multi_codebook_sum():
    """2 codebooks: dequant = sum of both gathered vectors, times scale."""
    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=1, in_group_size=2)
    codebooks = jnp.array(
        [
            [[[1.0, 1.0]], [[2.0, 2.0]]],
            [[[10.0, 20.0]], [[30.0, 40.0]]],
        ]
    )  # [2, 2, 1, 2]
    codes = jnp.array([[[0, 1]]], dtype=jnp.uint8)  # og=1, ig=1, k=2
    scales = jnp.array([2.0])
    w = AqlmWeight(codes=codes, codebooks=codebooks, scales=scales, bias=None, scheme=scheme)
    dense = dequantize_weight(w)
    np.testing.assert_allclose(np.asarray(dense), [[2 * (1 + 30), 2 * (1 + 40)]])


@pytest.mark.parametrize("scheme_name", ["1x16g8", "2x8g8", "8x8g8", "1x8g8", "1x16g16"])
def test_matmul_reference_vs_dense(key, scheme_name):
    scheme = AqlmScheme.parse(scheme_name)
    w = random_aqlm_weight(key, scheme, out_features=32, in_features=64, with_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64), dtype=jnp.float32)
    y = aqlm_matmul_reference(x, w)
    dense = dequantize_weight(w)
    expected = x @ dense.T + w.bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_weight_is_pytree(key):
    scheme = AqlmScheme.parse("1x8g8")
    w = random_aqlm_weight(key, scheme, 16, 32)
    leaves = jax.tree_util.tree_leaves(w)
    assert len(leaves) == 3  # codes, codebooks, scales (bias is None)
    w2 = jax.tree_util.tree_map(lambda x: x, w)
    assert w2.scheme == scheme

    # jit through the pytree with scheme as static metadata
    @jax.jit
    def f(weight, x):
        return aqlm_matmul_reference(x, weight)

    x = jnp.ones((2, 32))
    np.testing.assert_allclose(
        np.asarray(f(w, x)), np.asarray(aqlm_matmul_reference(x, w)), rtol=1e-6
    )


def test_hf_code_roundtrip():
    scheme = AqlmScheme(1, 16, 8)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**16, size=(4, 8, 1)).astype(np.uint16)
    packed = pack_hf_codes(codes, scheme)
    assert packed.dtype == np.int16
    restored = unpack_hf_codes(packed, scheme)
    np.testing.assert_array_equal(restored, codes)


def test_bit_packing_roundtrip():
    rng = np.random.default_rng(1)
    for nbits in (1, 2, 3, 8, 11, 16):
        codes = rng.integers(0, 2**nbits, size=257).astype(np.uint16)
        packed = pack_bits(codes, nbits)
        assert packed.size == (257 * nbits + 7) // 8
        np.testing.assert_array_equal(unpack_bits(packed, nbits, 257), codes)


def test_gather16_dequant_matches_xla_and_grads():
    """Forced impl='gather16' (the TPU 1x16 calibration path) == exact XLA
    dequant, in value and in codebook/scale gradients."""
    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.ops.dequant import dequantize_weight, random_aqlm_weight
    import dataclasses

    scheme = AqlmScheme.parse("1x16g8")
    w = random_aqlm_weight(jax.random.PRNGKey(0), scheme, 64, 64)

    w_xla = dequantize_weight(w, dtype=jnp.float32, impl="xla")
    w_g16 = dequantize_weight(w, dtype=jnp.float32, impl="gather16")
    np.testing.assert_allclose(
        np.asarray(w_g16), np.asarray(w_xla), rtol=1e-6, atol=1e-6
    )

    def loss(impl):
        def f(cb, sc):
            ww = dataclasses.replace(w, codebooks=cb, scales=sc)
            return jnp.sum(dequantize_weight(ww, dtype=jnp.float32, impl=impl) ** 2)
        return jax.grad(f, argnums=(0, 1))(w.codebooks, w.scales)

    ga = loss("xla")
    gb = loss("gather16")
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
