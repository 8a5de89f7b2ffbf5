"""Sharded-calibration tests: DP XTX capture and out-group-sharded beam
search must equal their single-device counterparts exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.calib import XTXAccumulator, beam_search_optimal_codes
from aqlm_tpu.calib.parallel import beam_search_optimal_codes_sharded, shard_calibration_batch
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import random_aqlm_weight
from aqlm_tpu.parallel import make_mesh


def test_sharded_xtx_matches_single_device(key):
    mesh = make_mesh(data=8, model=1)
    x = jax.random.normal(key, (16, 24, 32))  # [samples, seq, features]

    acc_ref = XTXAccumulator.zeros(32).add(x)

    xs = shard_calibration_batch(x.reshape(16, -1), mesh)  # sample-sharded
    with mesh:
        acc_dp = jax.jit(lambda a, v: a.add(v.reshape(16, 24, 32)))(
            XTXAccumulator.zeros(32), xs
        )
    np.testing.assert_allclose(
        np.asarray(acc_dp.mean), np.asarray(acc_ref.mean), rtol=1e-5, atol=1e-6
    )
    assert float(acc_dp.nsamples) == float(acc_ref.nsamples)


def test_sharded_beam_search_matches_single_device(key):
    mesh = make_mesh(data=2, model=4)
    scheme = AqlmScheme(2, 4, in_group_size=4)
    kw, kx, kc = jax.random.split(key, 3)
    w = random_aqlm_weight(kw, scheme, 32, 32)
    X = jax.random.normal(kx, (64, 32), jnp.float32)
    XTX = X.T @ X / 64
    ref_w = jax.random.normal(kc, (32, 32), jnp.float32)

    codes_ref, losses_ref = beam_search_optimal_codes(
        XTX, ref_w, w.codebooks, w.codes, w.scales, beam_size=2, out_chunk=8
    )
    with mesh:
        codes_sh, losses_sh = beam_search_optimal_codes_sharded(
            XTX, ref_w, w.codebooks, w.codes, w.scales, mesh, beam_size=2, out_chunk=8
        )
    np.testing.assert_array_equal(np.asarray(codes_sh), np.asarray(codes_ref))
    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(losses_ref), rtol=1e-5, atol=1e-6
    )
