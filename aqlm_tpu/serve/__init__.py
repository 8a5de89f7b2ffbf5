"""Serving: continuous-batching engine, sampler, KV cache."""

from aqlm_tpu.models.stacked import KVCache, forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve.engine import Engine, Request, ServeConfig
from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8
from aqlm_tpu.serve.sampler import SamplingParams, sample_tokens
from aqlm_tpu.serve.speculative import SpeculativeDecoder
from aqlm_tpu.serve.tp import make_tp_decode_step, make_tp_prefill_step, tp_shard_serving_params
from aqlm_tpu.serve.tp_engine import TPEngine

__all__ = [
    "fuse_projections",
    "quantize_lm_head_int8",
    "make_tp_decode_step",
    "make_tp_prefill_step",
    "tp_shard_serving_params",
    "TPEngine",
    "KVCache",
    "forward_stacked",
    "init_kv_cache",
    "stack_layer_params",
    "Engine",
    "Request",
    "ServeConfig",
    "SamplingParams",
    "sample_tokens",
    "SpeculativeDecoder",
]
