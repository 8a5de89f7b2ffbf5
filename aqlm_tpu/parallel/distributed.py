"""Multi-host initialization and DCN-aware mesh construction.

TPU-native replacement for the reference's torchrun + NCCL process-group
setup (/root/reference/finetune.py:993, src/utils.py:183-210). On TPU pods
`jax.distributed.initialize()` autodetects coordinator/rank from the TPU
environment; the hybrid mesh puts the model axis on ICI (fast intra-slice
links) and the data axis across DCN (hosts), which is how collectives should
ride the fabric (scaling-book recipe).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

__all__ = ["initialize_distributed", "make_multihost_mesh", "is_multihost", "sync_hosts"]

_initialized = False


def initialize_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Idempotent jax.distributed.initialize (no-op for single-process)."""
    global _initialized
    if _initialized:
        return
    if num_processes is None and coordinator_address is None and jax.process_count() == 1:
        # single host and no explicit cluster spec: nothing to do (on TPU
        # pods the runtime autodetects and jax.process_count() > 1)
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_multihost() -> bool:
    return jax.process_count() > 1


def make_multihost_mesh(
    data: int | None = None,
    model: int | None = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """("data", "model") mesh with model on ICI, data across hosts (DCN).

    Defaults: model = devices per host (all local ICI), data = host count.
    Falls back to a flat mesh when the hybrid helper is unavailable.
    """
    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    if model is None:
        model = n_local
    if data is None:
        data = (n_hosts * n_local) // model
    total = jax.device_count()
    if data * model != total:
        raise ValueError(f"data*model = {data}*{model} != {total} devices")

    if n_hosts > 1 and model <= n_local:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(data // n_hosts if data >= n_hosts else 1, model),
                dcn_mesh_shape=(min(data, n_hosts), 1),
            )
            return Mesh(dev_array, axis_names)
        except Exception:
            pass
    from aqlm_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, model=model, axis_names=axis_names)


def sync_hosts(tag: str = "sync") -> None:
    """Barrier across hosts (the reference's one_rank_at_a_time / barrier
    helpers, src/utils.py:183-210)."""
    if not is_multihost():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
