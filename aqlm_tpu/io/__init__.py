"""Checkpoint format, per-layer resume, HF AQLM checkpoint import."""

from aqlm_tpu.io.checkpoint import (
    load_layer_checkpoint,
    load_quantized_model,
    save_layer_checkpoint,
    save_quantized_model,
)

__all__ = [
    "load_layer_checkpoint",
    "load_quantized_model",
    "save_layer_checkpoint",
    "save_quantized_model",
]
