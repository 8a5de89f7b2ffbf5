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

__all__ = ["HostTeacher", "TeacherPrefetcher"]


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

    def hidden_many(self, input_ids_list) -> list[jax.Array]:
        """Hidden states for MANY batches in ONE weight-streaming pass.

        The teacher stream is transfer-bound through the host<->device
        tunnel (~13.5 GB of bf16 weights per pass: 505-771 s/batch measured
        at T=512, NOTES.md r4e). Amortize it: each layer's weights are
        staged to the device ONCE and applied to every batch's activations
        before moving on — N batches cost one pass plus N * [B, T, H]
        resident activations (~4 MB each at 7B/T=512), cutting per-batch
        teacher cost by ~N."""
        cfg = self.cfg
        xs, poss = [], []
        embed = jnp.asarray(self.host_params["embed"])
        for input_ids in input_ids_list:
            ids = jnp.asarray(input_ids, jnp.int32)
            b, t = ids.shape
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
            x = jnp.take(embed, ids, axis=0)
            if cfg.gemma_norm:
                x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
            xs.append(x)
            poss.append(positions)
        del embed
        for layer in self.host_params["layers"]:
            lw = jax.tree.map(jnp.asarray, layer)
            xs = [self._block_jit(x, lw, p) for x, p in zip(xs, poss)]
            # keep exactly one layer's weights resident: block on the last
            # batch so lw's buffers can be freed before the next upload
            jax.block_until_ready(xs[-1])
            del lw
        fn = jnp.asarray(self.host_params["final_norm"])
        return [
            rms_norm(x, fn, cfg.rms_eps, plus_one=cfg.gemma_norm) for x in xs
        ]

    def batch(self, input_ids) -> dict:
        """Full teacher input for make_pv_step(teacher_kind="hidden")."""
        out = {"hidden": self.hidden(input_ids)}
        out.update(self.head())
        return out


class TeacherPrefetcher:
    """Background-thread teacher pipeline: compute hidden states for the
    NEXT group of batches while the device runs the current PV steps.

    The reference computes teacher logits inline in the train loop
    (/root/reference/finetune.py:947-952, 1111-1179) — on one chip with a
    host-resident teacher that serializes a ~500 s weight stream against
    every step. Here `group_size` batches share one streaming pass
    (HostTeacher.hidden_many) and a depth-bounded queue double-buffers
    groups, so the stream overlaps device compute instead of gating it.

    Iterating yields (input_ids, teacher_dict) pairs ready for
    make_pv_step(teacher_kind="hidden")."""

    def __init__(self, teacher: HostTeacher, batch_iter, *, group_size: int = 4,
                 depth: int = 2):
        import queue as _queue
        import threading

        self._teacher = teacher
        self._iter = iter(batch_iter)
        self._group = max(1, group_size)
        self._q = _queue.Queue(maxsize=max(1, depth) * self._group)
        self._head = teacher.head()
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        import itertools

        try:
            while True:
                group = list(itertools.islice(self._iter, self._group))
                if not group:
                    break
                hs = self._teacher.hidden_many(group)
                for ids, h in zip(group, hs):
                    self._q.put((ids, h))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        ids, h = item
        out = {"hidden": h}
        out.update(self._head)
        return ids, out
