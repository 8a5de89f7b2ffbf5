"""Model definitions: llama family, mixtral MoE, parallel-attention families
(falcon / opt / cohere), stacked serving execution."""

from aqlm_tpu.models import cohere, falcon, llama, mixtral, opt
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
    "cohere",
    "falcon",
    "llama",
    "mixtral",
    "opt",
    "DenseLinear",
    "apply_linear",
    "attention",
    "attention_headmajor",
    "make_causal_mask",
    "rms_norm",
    "rope",
]
