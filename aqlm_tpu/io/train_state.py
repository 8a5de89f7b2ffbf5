"""Training-state checkpointing: save/restore arbitrary pytrees.

Counterpart of the reference's save/load_training_state
(/root/reference/finetune.py:816-867, FSDP LOCAL_STATE_DICT per rank +
optimizer state + metadata). Here the whole PVState / TrainState is one
pytree: leaves go to an .npz in deterministic flatten order and are restored
into a structurally-identical template (rebuild the state with the same
init code, then load into it)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _is_none(x):
    return x is None


def save_pytree(path: str, tree, metadata: dict | None = None) -> str:
    from aqlm_tpu.io.checkpoint import _savez

    leaves = [l for l in jax.tree.leaves(tree) if l is not None]
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays["__meta__"] = np.asarray(
        json.dumps({"num_leaves": len(leaves), "metadata": metadata or {}})
    )
    _savez(path, arrays)
    return path


def load_pytree(path: str, template):
    """Restore leaves saved by save_pytree into `template`'s structure.

    The template must have the same treedef (build it with the same init
    code, e.g. init_pv_state on freshly loaded params). Returns
    (tree, metadata)."""
    from aqlm_tpu.io.checkpoint import _loadz

    if not path.endswith(".npz"):
        path = path + ".npz"
    data = _loadz(path)
    meta = json.loads(str(data["__meta__"]))
    saved = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]

    leaves, treedef = jax.tree.flatten(template)
    non_none = [l for l in leaves if l is not None]
    if len(non_none) != len(saved):
        raise ValueError(
            f"checkpoint has {len(saved)} leaves, template has {len(non_none)}"
        )
    it = iter(saved)
    new_leaves = []
    for l in leaves:
        if l is None:
            new_leaves.append(None)
            continue
        arr = next(it)
        if tuple(arr.shape) != tuple(l.shape):
            raise ValueError(f"leaf shape mismatch: {arr.shape} vs {l.shape}")
        new_leaves.append(jax.numpy.asarray(arr).astype(l.dtype))
    return jax.tree.unflatten(treedef, new_leaves), meta["metadata"]
