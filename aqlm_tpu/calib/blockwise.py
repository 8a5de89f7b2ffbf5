"""Block-wise post-quantization finetuning (calibration-time).

TPU-native analogue of finetune_groupwise (/root/reference/src/finetune.py:20-211):
after a transformer block's linears are quantized, train every float leaf of
the block (codebooks, scales, norms, leftover dense weights/biases) to match
the block's pre-quantization outputs under token-mean MSE, with per-epoch
validation and early stopping.

The reference shards batches across GPUs with replicate/parameter-replacement
tables; here one jitted Adam step runs over the ("data",) mesh axis when the
inputs are sharded — no replication machinery needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.models import llama
from aqlm_tpu.models.llama import ModelConfig
from aqlm_tpu.pv.trainer import merge_trainable, split_trainable

__all__ = ["BlockFinetuneConfig", "finetune_block"]


@dataclasses.dataclass
class BlockFinetuneConfig:
    """Defaults follow the reference CLI (/root/reference/main.py:761-797)."""

    lr: float = 1e-5
    max_epochs: int = 5
    early_stop: int = 3
    batch_size: int = 1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    # rematerialize the block forward in the backward pass (the reference's
    # --use_checkpointing, main.py:615-619): trades recompute for activation
    # memory — worth it at real widths/seqlens
    use_checkpointing: bool = False
    verbose: bool = False


def finetune_block(
    layer: dict,
    cfg: ModelConfig,
    train_inps: jax.Array,  # [N, T, H]
    train_outs: jax.Array,  # [N, T, H] pre-quantization targets
    config: BlockFinetuneConfig = BlockFinetuneConfig(),
    *,
    valid_inps: jax.Array | None = None,
    valid_outs: jax.Array | None = None,
    taps_fn=llama.block_forward_with_taps,
) -> dict:
    """Returns the finetuned block params (best-by-validation if val given)."""
    if config.max_epochs <= 0:
        return layer
    positions = jnp.arange(train_inps.shape[1])[None, :]
    trainable, frozen = split_trainable(layer)
    opt = optax.adam(config.lr, b1=config.adam_beta1, b2=config.adam_beta2)
    opt_state = opt.init(trainable)

    fwd = lambda x, block: taps_fn(x, block, cfg, positions)[0]
    if config.use_checkpointing:
        fwd = jax.checkpoint(fwd)

    @jax.jit
    def train_step(trainable, opt_state, x, y):
        def loss_fn(tr):
            block = merge_trainable(tr, frozen)
            pred = fwd(x.astype(jnp.float32), block)
            return jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    @jax.jit
    def eval_loss(trainable, x, y):
        block = merge_trainable(trainable, frozen)
        pred, _ = taps_fn(x.astype(jnp.float32), block, cfg, positions)
        return jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)

    n = train_inps.shape[0]
    bs = min(config.batch_size, n)
    run_validation = valid_inps is not None and valid_outs is not None

    def validate(tr):
        losses = [
            float(eval_loss(tr, valid_inps[i : i + bs], valid_outs[i : i + bs]))
            for i in range(0, valid_inps.shape[0], bs)
        ]
        return float(np.mean(losses))

    best_loss = validate(trainable) if run_validation else float("inf")
    best_trainable = trainable
    epochs_since_best = 0
    rng = np.random.RandomState(0)

    for epoch in range(config.max_epochs):
        order = rng.permutation(n)
        for start in range(0, n - bs + 1, bs):
            idx = order[start : start + bs]
            trainable, opt_state, loss = train_step(
                trainable, opt_state, train_inps[idx], train_outs[idx]
            )
        if run_validation:
            val = validate(trainable)
            if config.verbose:
                print(f"blockwise epoch {epoch}: val_mse={val:.3e}")
            if val < best_loss:
                best_loss, best_trainable, epochs_since_best = val, trainable, 0
            else:
                epochs_since_best += 1
                if epochs_since_best >= config.early_stop:
                    break
        else:
            best_trainable = trainable

    return merge_trainable(best_trainable, frozen)
