"""Sharding tests on the 8-virtual-device CPU mesh.

Covers the TPU-native replacements for the reference's parallelism (SURVEY.md
§2.3): TP partition specs over quantized/dense linears, sharded forward
equivalence vs single-device, and the driver-facing dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.parallel import make_mesh, model_param_specs, shard_params


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "model": 4}


def test_specs_cover_params_tree():
    cfg = llama.ModelConfig.tiny(num_kv_heads=4)
    params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference")
    specs = model_param_specs(params)
    # same treedef => every leaf got a spec
    pt = jax.tree.structure(params, is_leaf=lambda x: x is None)
    st = jax.tree.structure(specs, is_leaf=lambda x: x is None)
    assert pt == st


@pytest.mark.parametrize("mode", ["reference", "int8"])
def test_sharded_forward_matches_single_device(mesh, mode):
    cfg = llama.ModelConfig.tiny(num_kv_heads=4)
    params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode=mode)
    input_ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)

    ref_logits, _ = jax.jit(lambda p, i: llama.forward(p, cfg, i))(params, input_ids)

    specs = model_param_specs(params)
    with mesh:
        sharded = shard_params(params, specs, mesh)
        ids = jax.device_put(input_ids, NamedSharding(mesh, P("data", None)))
        out, _ = jax.jit(lambda p, i: llama.forward(p, cfg, i))(sharded, ids)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_logits, np.float32), atol=2e-2, rtol=2e-2
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
