"""Host-resident teacher for PV distillation.

The reference holds an FSDP-sharded fp16 teacher across ranks
(/root/reference/finetune.py:527-552, 666-681). On a single 16 GB chip a
7B bf16 teacher (13.5 GB) cannot coexist with the student, so the teacher's
weights live in HOST memory and the forward is layer-streamed: one jitted
block step whose weights are an argument, fed layer-by-layer from host RAM
(same pattern as the calibration pipeline's layer streaming,
aqlm_tpu/calib/pipeline.py). Output is the post-final-norm hidden state
[B, T, H] plus the head weights — the `teacher_kind="hidden"` input of
make_pv_step; the lm_head projection happens inside the chunked KL loss.

Teacher activations and outputs are fp, no gradients (reference:
torch.no_grad() teacher pass, finetune.py:947-952).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import llama
from aqlm_tpu.models.llama import ModelConfig, rms_norm

__all__ = ["HostTeacher"]


def _to_host(tree, dtype):
    np_dtype = np.dtype(dtype)
    memo = {}  # id -> converted array (keeps aliased leaves aliased)

    def conv(x):
        if not hasattr(x, "dtype"):
            return x
        if id(x) in memo:
            return memo[id(x)]
        a = np.asarray(x)
        # cast float leaves to the compute dtype ON THE HOST: the teacher is
        # transfer-bound through the dev tunnel (a 7B f32 teacher is 26 GB of
        # host->device traffic per batch; bf16 halves it) and bf16 teachers
        # are the reference norm (finetune.py --load_dtype)
        out = a.astype(np_dtype) if np.issubdtype(a.dtype, np.floating) else a
        memo[id(x)] = out
        return out

    return jax.tree.map(conv, tree)


class HostTeacher:
    """Keeps dense teacher params in host RAM; computes hidden states
    layer-streamed with only one block's weights resident on device."""

    def __init__(self, params: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.host_params = _to_host(params, dtype)
        self._block_jit = jax.jit(partial(self._block_step, cfg))

    @staticmethod
    def _block_step(cfg, x, layer, positions):
        out, _ = llama._block(x, layer, cfg, positions, None, None, None)
        return out

    def head(self) -> dict:
        """{head, embed} entry for the teacher_kind="hidden" contract."""
        hp = self.host_params
        if hp.get("lm_head") is not None:
            return {"head": jnp.asarray(hp["lm_head"].weight), "embed": None}
        return {"head": None, "embed": jnp.asarray(hp["embed"])}

    def hidden(self, input_ids) -> jax.Array:
        """Post-final-norm hidden states [B, T, H] for one batch."""
        cfg = self.cfg
        ids = jnp.asarray(input_ids, jnp.int32)
        b, t = ids.shape
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        x = jnp.take(jnp.asarray(self.host_params["embed"]), ids, axis=0)
        if cfg.gemma_norm:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        for layer in self.host_params["layers"]:
            x = self._block_jit(x, jax.tree.map(jnp.asarray, layer), positions)
        x = rms_norm(x, jnp.asarray(self.host_params["final_norm"]), cfg.rms_eps,
                     plus_one=cfg.gemma_norm)
        return x

    def batch(self, input_ids) -> dict:
        """Full teacher input for make_pv_step(teacher_kind="hidden")."""
        out = {"hidden": self.hidden(input_ids)}
        out.update(self.head())
        return out
