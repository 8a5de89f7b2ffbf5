"""Utilities: device timing, phase profiling, metrics, entropy estimators."""

from aqlm_tpu.utils.compression import (
    code_entropy,
    get_mean_nbits_by_codebook,
    huffman_mean_code_length,
)
from aqlm_tpu.utils.monitoring import (
    MetricLogger,
    device_memory_stats,
    print_runtime_stats,
    profile_trace,
)
from aqlm_tpu.utils.timing import chain_time, dispatch_time

__all__ = [
    "code_entropy",
    "get_mean_nbits_by_codebook",
    "huffman_mean_code_length",
    "MetricLogger",
    "device_memory_stats",
    "print_runtime_stats",
    "profile_trace",
    "chain_time",
    "dispatch_time",
]
