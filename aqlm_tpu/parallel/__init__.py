"""Mesh construction and sharding specs (TP/DP over ICI+DCN)."""

from aqlm_tpu.parallel.distributed import (
    initialize_distributed,
    is_multihost,
    make_multihost_mesh,
    sync_hosts,
)
from aqlm_tpu.parallel.ring_attention import ring_attention, sequence_parallel_attention
from aqlm_tpu.parallel.mesh import (
    COLUMN_PARALLEL,
    ROW_PARALLEL,
    kv_cache_specs,
    make_mesh,
    model_param_specs,
    shard_params,
)

__all__ = [
    "ring_attention",
    "sequence_parallel_attention",
    "COLUMN_PARALLEL",
    "ROW_PARALLEL",
    "kv_cache_specs",
    "make_mesh",
    "model_param_specs",
    "shard_params",
    "initialize_distributed",
    "is_multihost",
    "make_multihost_mesh",
    "sync_hosts",
]
