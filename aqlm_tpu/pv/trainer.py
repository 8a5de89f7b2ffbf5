"""Continuous-parameter distillation trainer (the "P" phase of PV-tuning).

Reference analogue: finetune.py's teacher-student loop with
`create_p_optimizer` (/root/reference/finetune.py:771-815) — Adam over
codebooks, scales and non-quantized params while codes stay frozen. The "V"
phase (straight-through code updates via L2 beam search,
/root/reference/src/pv_optimizer.py:213-424) plugs in on top of this trainer
as a separate jitted step (see aqlm_tpu/pv/straight_through.py).

Instead of FSDP + IntCodes dtype disguises (/root/reference/src/utils.py:155-180),
parameters live on a ("data", "model") mesh with the PartitionSpecs from
aqlm_tpu.parallel — int codes shard like any other array under XLA SPMD.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from aqlm_tpu.models import llama
from aqlm_tpu.pv.losses import kl_divergence_loss

__all__ = [
    "split_trainable",
    "merge_trainable",
    "TrainState",
    "init_train_state",
    "make_distill_step",
]

_is_none = lambda x: x is None


def _is_float_leaf(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def split_trainable(params):
    """(trainable, frozen): float leaves train, int leaves (codes) freeze.

    Replaces torch's requires_grad bookkeeping (the reference flips
    requires_grad per ParameterRole, /root/reference/src/pv_optimizer.py:83-120);
    here the split is structural: two same-shaped trees with None holes.
    """
    trainable = jax.tree.map(
        lambda x: x if _is_float_leaf(x) else None, params, is_leaf=_is_none
    )
    frozen = jax.tree.map(
        lambda x: None if _is_float_leaf(x) else x, params, is_leaf=_is_none
    )
    return trainable, frozen


def merge_trainable(trainable, frozen):
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen, is_leaf=_is_none
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["trainable", "frozen", "opt_state", "step"],
    meta_fields=[],
)
@dataclasses.dataclass
class TrainState:
    trainable: Any
    frozen: Any
    opt_state: Any
    step: jax.Array


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    trainable, frozen = split_trainable(params)
    return TrainState(
        trainable=trainable,
        frozen=frozen,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def make_distill_step(
    student_cfg: llama.ModelConfig,
    teacher_cfg: llama.ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    forward_fn: Callable = llama.forward,
):
    """Build the jittable KL-distillation train step.

    step(state, teacher_params, input_ids, mask) -> (state, loss)

    Teacher forward runs without gradients (like the reference's
    `with torch.no_grad()` teacher pass, finetune.py:947-952); student
    gradients flow to codebooks/scales/norms/embeddings through the
    reference-mode dequantization.
    """

    def loss_fn(trainable, frozen, teacher_params, input_ids, mask):
        params = merge_trainable(trainable, frozen)
        student_logits, _ = forward_fn(params, student_cfg, input_ids)
        teacher_logits, _ = forward_fn(teacher_params, teacher_cfg, input_ids)
        teacher_logits = jax.lax.stop_gradient(teacher_logits)
        return kl_divergence_loss(student_logits, teacher_logits, mask)

    def step(state: TrainState, teacher_params, input_ids, mask=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.trainable, state.frozen, teacher_params, input_ids, mask
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(
                trainable=trainable,
                frozen=state.frozen,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    return step
