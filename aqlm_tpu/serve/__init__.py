"""Serving: continuous-batching engine, sampler, KV cache."""

from aqlm_tpu.models.stacked import KVCache, forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve.engine import Engine, Request, ServeConfig
from aqlm_tpu.serve.sampler import SamplingParams, sample_tokens

__all__ = [
    "KVCache",
    "forward_stacked",
    "init_kv_cache",
    "stack_layer_params",
    "Engine",
    "Request",
    "ServeConfig",
    "SamplingParams",
    "sample_tokens",
]
