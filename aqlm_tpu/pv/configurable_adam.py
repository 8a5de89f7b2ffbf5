"""ConfigurableAdamW as an optax transformation.

Parity with the reference's ConfigurableAdamW
(/root/reference/src/configurable_adam.py:12-188): Adam / AMSGrad / Lamb with
optional debiasing, weight decay (adam-style pre-decay or lamb-style
in-update), trust-ratio clamping, and reduced-precision optimizer state
(`exp_avg_dtype` / `exp_avg_sq_dtype` / `v_hat_max_dtype`, e.g. bf16 moments
at half the state memory; computation always runs in f32).

The reference's CPU-offloaded states with pinned-memory prefetch
(:164-188) answer a GPU-memory problem; on TPU the equivalent lever is
sharding the optimizer state over the mesh (it is a pytree like any other)
plus these reduced-precision dtypes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["configurable_adamw", "ConfigurableAdamState"]


class ConfigurableAdamState(NamedTuple):
    step: jax.Array
    exp_avg: Optional[dict]
    exp_avg_sq: Optional[dict]
    v_hat_max: Optional[dict]


def configurable_adamw(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    *,
    debias: bool | None = None,
    amsgrad: bool = False,
    lamb: bool = False,
    clamp_value: float | None = None,
    exp_avg_dtype=None,
    exp_avg_sq_dtype=None,
    v_hat_max_dtype=None,
) -> optax.GradientTransformation:
    """Reference semantics (configurable_adam.py:100-160, :191-226):

    - update = m / (sqrt(v) + eps), moments stored in the requested dtypes;
    - debias default: True for Adam, False for Lamb; applied as
      (1/(1-b1^t)) / sqrt(1/(1-b2^t)) on the whole update;
    - adam weight decay pre-scales the param by (1 - lr*wd) (not debiased);
      lamb weight decay adds wd*p to the update before the trust ratio;
    - lamb trust ratio = ||p|| / ||update|| (clamped by clamp_value), 1 when
      either norm is 0.
    """
    use_m = b1 != 0
    use_v = b2 != 1
    if debias is None:
        debias = not lamb

    def cast(tree, dtype):
        if dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(dtype), tree)

    def init(params):
        zeros = lambda: jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return ConfigurableAdamState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=cast(zeros(), exp_avg_dtype) if use_m else None,
            exp_avg_sq=cast(zeros(), exp_avg_sq_dtype) if use_v and b2 != 0 else None,
            v_hat_max=cast(zeros(), v_hat_max_dtype) if amsgrad else None,
        )

    def update_fn(grads, state, params=None):
        assert params is not None, "configurable_adamw requires params"
        step = state.step + 1
        g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)

        if use_m:
            m = jax.tree.map(
                lambda m_, g: m_.astype(jnp.float32) * b1 + g * (1 - b1), state.exp_avg, g32
            )
            new_m = cast(m, exp_avg_dtype)
            upd = m
        else:
            new_m = None
            upd = g32

        new_v = state.exp_avg_sq
        new_vhat = state.v_hat_max
        if use_v:
            if b2 == 0:
                v = jax.tree.map(lambda g: g * g, g32)
            else:
                v = jax.tree.map(
                    lambda v_, g: v_.astype(jnp.float32) * b2 + g * g * (1 - b2),
                    state.exp_avg_sq, g32,
                )
                new_v = cast(v, exp_avg_sq_dtype)
            if amsgrad:
                v = jax.tree.map(
                    lambda vh, v_: jnp.maximum(vh.astype(jnp.float32), v_), state.v_hat_max, v
                )
                new_vhat = cast(v, v_hat_max_dtype)
            upd = jax.tree.map(lambda u, v_: u / (jnp.sqrt(v_) + eps), upd, v)

        if lamb and weight_decay != 0:
            upd = jax.tree.map(lambda u, p: u + weight_decay * p.astype(jnp.float32), upd, params)

        scale = -learning_rate
        if debias:
            mt_debias = 1.0 / (1 - b1 ** step.astype(jnp.float32)) if b1 != 0 else 1.0
            vt_debias = (
                1.0 / jnp.sqrt(1 - b2 ** step.astype(jnp.float32)) if b2 != 0 else 1.0
            )
            scale = scale * (mt_debias / vt_debias)

        if lamb:
            def lamb_update(u, p):
                wnorm = jnp.linalg.norm(p.astype(jnp.float32))
                if clamp_value is not None:
                    wnorm = jnp.minimum(wnorm, clamp_value)
                unorm = jnp.linalg.norm(u)
                trust = jnp.where((wnorm == 0) | (unorm == 0), 1.0, wnorm / jnp.maximum(unorm, 1e-30))
                return (scale * trust * u).astype(p.dtype)

            deltas = jax.tree.map(lamb_update, upd, params)
        else:
            deltas = jax.tree.map(lambda u, p: (scale * u).astype(p.dtype), upd, params)
            if weight_decay != 0:
                # adam-style decay: p *= (1 - lr*wd) expressed as an additive delta
                deltas = jax.tree.map(
                    lambda d, p: d - (learning_rate * weight_decay) * p, deltas, params
                )

        return deltas, ConfigurableAdamState(
            step=step, exp_avg=new_m, exp_avg_sq=new_v, v_hat_max=new_vhat
        )

    return optax.GradientTransformation(init, update_fn)
