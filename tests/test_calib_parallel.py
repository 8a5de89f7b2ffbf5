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


def test_quantize_model_mesh_matches_single_device(key):
    """The whole calibration pipeline under a (data=2, model=4) mesh must
    reproduce the single-device pipeline: sharded XTX capture + out-group
    sharded beam search change reduction grouping only."""
    import copy

    from aqlm_tpu.calib import CalibConfig, QuantizePipelineConfig, quantize_model
    from aqlm_tpu.models import llama
    from aqlm_tpu.ops.dequant import dequantize_weight

    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = llama.init_random_params(key, cfg, dtype=jnp.float32)
    # 4 sequences / 2 Adam steps / 3 kmeans iters: the property is exact
    # mesh-vs-single-device EQUALITY, not quality — smallest config that
    # still exercises sharded XTX + out-group-sharded beam search
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, cfg.vocab_size)

    def pipe(mesh):
        return QuantizePipelineConfig(
            scheme=AqlmScheme(2, 4, in_group_size=8),
            calib=CalibConfig(max_epochs=1, steps_per_epoch=2, beam_size=2,
                              init_max_iter=3, seed=0),
            finetune=None,
            batch_size=4,
            verbose=False,
            mesh=mesh,
        )

    q_ref, stats_ref = quantize_model(copy.deepcopy(params), cfg, ids, pipe(None))
    mesh = make_mesh(data=2, model=4)
    with mesh:
        q_sh, stats_sh = quantize_model(copy.deepcopy(params), cfg, ids, pipe(mesh))

    for li in range(cfg.num_layers):
        for name, q in q_ref["layers"][li].items():
            if not hasattr(q, "scheme") or q.scheme is None:
                continue
            w_ref = np.asarray(dequantize_weight(
                __import__("aqlm_tpu.ops.dequant", fromlist=["AqlmWeight"]).AqlmWeight(
                    codes=q.codes, codebooks=q.codebooks, scales=q.scales,
                    bias=None, scheme=q.scheme),
                dtype=jnp.float32))
            q2 = q_sh["layers"][li][name]
            w_sh = np.asarray(dequantize_weight(
                __import__("aqlm_tpu.ops.dequant", fromlist=["AqlmWeight"]).AqlmWeight(
                    codes=q2.codes, codebooks=q2.codebooks, scales=q2.scales,
                    bias=None, scheme=q2.scheme),
                dtype=jnp.float32))
            err = np.abs(w_ref - w_sh).max()
            assert err < 5e-3, (li, name, err)
    np.testing.assert_allclose(stats_sh["out_loss"], stats_ref["out_loss"], rtol=0.2, atol=1e-5)
