"""Checkpoint format, per-layer resume, HF AQLM checkpoint import."""

from aqlm_tpu.io.checkpoint import (
    load_layer_checkpoint,
    load_quantized_model,
    save_layer_checkpoint,
    save_quantized_model,
)
from aqlm_tpu.io.hf_import import (
    export_hf_aqlm_state_dict,
    load_hf_aqlm_checkpoint,
    model_config_from_hf,
)
from aqlm_tpu.io.legacy_import import (
    load_legacy_checkpoint,
    load_legacy_fsdp_checkpoint,
)
from aqlm_tpu.io.train_state import load_pytree, save_pytree

__all__ = [
    "load_legacy_checkpoint",
    "load_legacy_fsdp_checkpoint",
    "load_layer_checkpoint",
    "load_quantized_model",
    "save_layer_checkpoint",
    "save_quantized_model",
    "export_hf_aqlm_state_dict",
    "load_hf_aqlm_checkpoint",
    "model_config_from_hf",
    "load_pytree",
    "save_pytree",
]
