"""Mixtral through the serving stack: stacked scan + continuous batching."""

import copy

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import mixtral
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.stacked import forward_stacked, stack_layer_params
from aqlm_tpu.ops.dequant import random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def _quantized_moe_params(key, cfg, mode="int8"):
    params = mixtral.init_random_params(key, cfg, dtype=jnp.float32)
    keys = jax.random.split(key, 100)
    ki = 0
    for layer in params["layers"]:
        for name, lin in list(layer.items()):
            if isinstance(lin, DenseLinear) and name != "moe_gate" and not name.endswith("norm"):
                out_f, in_f = lin.weight.shape
                w = random_aqlm_weight(keys[ki], SCHEME_2X8, out_f, in_f, dtype=jnp.float32)
                layer[name] = QuantizedLinear.from_aqlm(w, mode=mode)
                ki += 1
    return params


def test_stacked_moe_matches_unrolled(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=2)
    params = _quantized_moe_params(key, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    ref, _ = mixtral.forward(params, cfg, ids)
    got, _ = forward_stacked(stack_layer_params(copy.deepcopy(params)), cfg, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-3, rtol=2e-3
    )


@pytest.mark.slow
def test_engine_serves_mixtral(key):
    cfg = mixtral.MixtralConfig.tiny_moe(num_layers=1)
    params = _quantized_moe_params(key, cfg)
    engine = Engine(
        params, cfg,
        ServeConfig(max_batch=2, max_len=32, prefill_buckets=(8,), fuse_projections=False),
    )
    prompts = [np.asarray([1, 2, 3], np.int32), np.asarray([5, 6], np.int32)]
    outs = engine.generate(prompts, SamplingParams(max_new_tokens=4))
    assert [len(o) for o in outs] == [4, 4]

    # against manual greedy with the unrolled forward
    ids = list(prompts[0])
    manual = []
    for _ in range(4):
        logits, _ = mixtral.forward(params, cfg, jnp.asarray(ids, jnp.int32)[None, :])
        tok = int(jnp.argmax(logits[0, -1]))
        manual.append(tok)
        ids.append(tok)
    assert outs[0] == manual, (outs[0], manual)
