"""Model definitions: llama family, mixtral MoE, stacked serving execution."""

from aqlm_tpu.models import llama, mixtral
from aqlm_tpu.models.common import (
    DenseLinear,
    apply_linear,
    attention,
    attention_headmajor,
    make_causal_mask,
    rms_norm,
    rope,
)

__all__ = [
    "llama",
    "mixtral",
    "DenseLinear",
    "apply_linear",
    "attention",
    "attention_headmajor",
    "make_causal_mask",
    "rms_norm",
    "rope",
]
