"""LoRA / PEFT on frozen quantized models (reference notebook parity:
aqlm_2bit_training.ipynb). Bars: zero-init adapters change nothing; training
moves ONLY adapters and reduces LM loss through the quantized custom-VJP
matmul; dense merge is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.common import LoraLinear
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv.lora import (
    attach_lora,
    init_lora_state,
    make_lora_step,
    merge_lora,
    split_lora,
)
from aqlm_tpu.pv.trainer import merge_trainable


def _tiny_quantized():
    cfg = llama.ModelConfig.tiny(num_layers=2)
    params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference")
    return cfg, params


def test_zero_init_is_identity():
    cfg, params = _tiny_quantized()
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    base_logits, _ = llama.forward(params, cfg, ids)
    wrapped = attach_lora(params, jax.random.PRNGKey(1), r=4)
    lora_logits, _ = llama.forward(wrapped, cfg, ids)
    np.testing.assert_allclose(np.asarray(base_logits), np.asarray(lora_logits), atol=1e-6)


def test_training_moves_only_adapters_and_reduces_loss():
    cfg, params = _tiny_quantized()
    wrapped = attach_lora(params, jax.random.PRNGKey(1), r=4, targets=("q_proj", "v_proj"))
    opt = optax.adam(3e-3)
    state = init_lora_state(wrapped, opt)
    step = make_lora_step(cfg, opt)

    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    losses = []
    for _ in range(8):
        state, loss = step(state, ids)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1e-3, losses

    # frozen tree untouched: quantized codes/codebooks identical to input
    final = merge_trainable(state.adapters, state.frozen)
    q0 = wrapped["layers"][0]["q_proj"]
    q1 = final["layers"][0]["q_proj"]
    assert isinstance(q1, LoraLinear)
    np.testing.assert_array_equal(np.asarray(q0.base.codes), np.asarray(q1.base.codes))
    np.testing.assert_array_equal(
        np.asarray(q0.base.codebooks), np.asarray(q1.base.codebooks)
    )
    # adapters actually moved
    assert float(jnp.abs(q1.lora_b).max()) > 0.0
    # untargeted projections were not wrapped
    assert not isinstance(final["layers"][0]["gate_proj"], LoraLinear)


def test_split_lora_roundtrip():
    cfg, params = _tiny_quantized()
    wrapped = attach_lora(params, jax.random.PRNGKey(1), r=2)
    adapters, frozen = split_lora(wrapped)
    n_adapters = sum(x is not None for x in jax.tree.leaves(
        adapters, is_leaf=lambda x: x is None) if x is not None)
    assert n_adapters == cfg.num_layers * 4 * 2  # 4 targets x (a, b)
    merged = merge_trainable(adapters, frozen)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    a, _ = llama.forward(wrapped, cfg, ids)
    b, _ = llama.forward(merged, cfg, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_lora_dense_exact():
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    wrapped = attach_lora(params, jax.random.PRNGKey(1), r=4)
    # give the adapters real values
    wrapped["layers"][0]["q_proj"] = LoraLinear(
        base=wrapped["layers"][0]["q_proj"].base,
        lora_a=wrapped["layers"][0]["q_proj"].lora_a,
        lora_b=jax.random.normal(jax.random.PRNGKey(2),
                                 wrapped["layers"][0]["q_proj"].lora_b.shape) * 0.1,
        scale=wrapped["layers"][0]["q_proj"].scale,
    )
    merged = merge_lora(wrapped)
    assert not isinstance(merged["layers"][0]["q_proj"], LoraLinear)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    a, _ = llama.forward(wrapped, cfg, ids)
    b, _ = llama.forward(merged, cfg, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
