"""LoRA / PEFT finetuning on frozen quantized models.

The reference demonstrates 2-bit PEFT training (LoRA adapters over frozen
AQLM layers) in notebooks/aqlm_2bit_training.ipynb via HF peft; here it is a
first-class trainer: adapters ride the quantized matmul's custom VJP
(ops/runtime.py) so codes/codebooks/scales never receive gradients, and the
optimizer state covers ONLY the adapters (a 7B model trains with megabytes
of optimizer state instead of the PV optimizer's code-update machinery).

Flow: `attach_lora` wraps target projections with models.common.LoraLinear;
`split_lora` produces (adapters, frozen) same-structure trees (merge with
pv.trainer.merge_trainable); `make_lora_step` is a jitted LM-loss step over
the adapters. `merge_lora` folds adapters into DENSE bases and unwraps
quantized bases back to (base, adapters) for separate serving.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear, LoraLinear
from aqlm_tpu.ops.runtime import QuantizedLinear
from aqlm_tpu.pv.losses import cross_entropy_loss
from aqlm_tpu.pv.trainer import merge_trainable

__all__ = [
    "attach_lora",
    "split_lora",
    "merge_lora",
    "make_lora_step",
    "LoraTrainState",
]

# unfused training-time projection names (llama-family + MoE experts attach
# at the layer dict level; fused serving layouts are built AFTER merge)
DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")

_is_none = lambda x: x is None


def _true_in_features(lin) -> int:
    if isinstance(lin, DenseLinear):
        return lin.weight.shape[1]
    assert isinstance(lin, QuantizedLinear) and lin.codes is not None, (
        "attach_lora needs the canonical (mode='reference') layout; int8/"
        "codes serving layouts pad in_features"
    )
    return lin.codes.shape[1] * lin.scheme.in_group_size


def attach_lora(
    params: dict,
    key: jax.Array,
    *,
    r: int = 8,
    alpha: float = 16.0,
    targets: tuple = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Wrap matching projections in every layer with zero-initialized LoRA."""
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for name in layer:
            if name not in targets or not isinstance(
                layer[name], (DenseLinear, QuantizedLinear)
            ):
                continue
            key, k_a = jax.random.split(key)
            lin = layer[name]
            in_f = _true_in_features(lin)
            a = jax.random.normal(k_a, (r, in_f), dtype) / jnp.sqrt(jnp.asarray(r, dtype))
            b = jnp.zeros((lin.out_features, r), dtype)
            new_layer[name] = LoraLinear(base=lin, lora_a=a, lora_b=b, scale=alpha / r)
        layers.append(new_layer)
    out["layers"] = layers
    return out


def split_lora(params):
    """(adapters, frozen): only lora_a/lora_b leaves are trainable."""

    def mark(path, leaf):
        names = [getattr(p, "name", None) for p in path]
        return leaf if names and names[-1] in ("lora_a", "lora_b") else None

    adapters = jax.tree_util.tree_map_with_path(mark, params)
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, l: None if mark(p, l) is not None else l, params
    )
    return adapters, frozen


def merge_lora(params: dict) -> dict:
    """Fold adapters into dense bases (W += scale·BA); unwrap to the plain
    tree. Quantized bases cannot absorb a dense delta into codes — they are
    returned unwrapped WITH the delta folded into... nothing: callers who
    need a quantized serving artifact should requantize (calib.requantize)
    or serve with adapters attached (apply_linear handles LoraLinear)."""

    def fold(x):
        if not isinstance(x, LoraLinear):
            return x
        if isinstance(x.base, DenseLinear):
            delta = (x.lora_b.astype(jnp.float32) @ x.lora_a.astype(jnp.float32)) * x.scale
            return dataclasses.replace(
                x.base, weight=(x.base.weight.astype(jnp.float32) + delta).astype(x.base.weight.dtype)
            )
        return x  # quantized base: keep the wrapper (exact serving)

    return jax.tree.map(fold, params, is_leaf=lambda x: isinstance(x, LoraLinear))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["adapters", "frozen", "opt_state", "step"],
    meta_fields=[],
)
@dataclasses.dataclass
class LoraTrainState:
    adapters: Any
    frozen: Any
    opt_state: Any
    step: jax.Array


def make_lora_step(
    cfg,
    optimizer: optax.GradientTransformation,
    forward_fn=llama.forward,
):
    """Jitted LM cross-entropy step over the adapters only.

    batch: {"input_ids" [B, T], optional "mask" [B, T-1]}. Returns
    (state, loss)."""

    def loss_fn(adapters, frozen, input_ids, mask):
        params = merge_trainable(adapters, frozen)
        logits, _ = forward_fn(params, cfg, input_ids)
        return cross_entropy_loss(logits[:, :-1], input_ids[:, 1:], mask)

    @jax.jit
    def step(state: LoraTrainState, input_ids, mask=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.adapters, state.frozen, input_ids, mask
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.adapters)
        adapters = optax.apply_updates(state.adapters, updates)
        return (
            dataclasses.replace(
                state, adapters=adapters, opt_state=opt_state, step=state.step + 1
            ),
            loss,
        )

    return step


def init_lora_state(params: dict, optimizer: optax.GradientTransformation) -> LoraTrainState:
    adapters, frozen = split_lora(params)
    return LoraTrainState(
        adapters=adapters,
        frozen=frozen,
        opt_state=optimizer.init(adapters),
        step=jnp.zeros((), jnp.int32),
    )
