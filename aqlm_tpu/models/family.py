"""Model-family registry: ONE place mapping a config to its module, forward,
calibration taps, and checkpoint metadata.

The reference spreads this over dispatch tables keyed by model_type strings
(/root/reference/src/modelutils.py:14-23 LLAMA_LIKE/FALCON_TYPES, :140-176
get_layers/sequential groups); here the config dataclass IS the dispatch key,
and everything downstream (quantization pipeline, eval, serving, checkpoint
round-trip) asks this module instead of hard-coding llama.
"""

from __future__ import annotations

from aqlm_tpu.models import cohere, falcon, llama, mixtral, opt

__all__ = [
    "FAMILY_REGISTRY",
    "family_name",
    "family_module",
    "config_class",
    "forward_fn",
    "taps_fn",
]

# name -> (config class, module). Order matters for family_name: subclasses
# of ModelConfig must be checked before the base class.
FAMILY_REGISTRY = {
    "mixtral": (mixtral.MixtralConfig, mixtral),
    "cohere": (cohere.CohereConfig, cohere),
    "falcon": (falcon.FalconConfig, falcon),
    "opt": (opt.OptConfig, opt),
    "llama": (llama.ModelConfig, llama),
}


def family_name(cfg: llama.ModelConfig) -> str:
    for name, (cls, _) in FAMILY_REGISTRY.items():
        if name != "llama" and isinstance(cfg, cls):
            return name
    return "llama"


def family_module(cfg: llama.ModelConfig):
    return FAMILY_REGISTRY[family_name(cfg)][1]


def config_class(name: str):
    return FAMILY_REGISTRY[name][0]


def forward_fn(cfg: llama.ModelConfig):
    """The family's unrolled `forward(params, cfg, ids, ...)` (eval path)."""
    return family_module(cfg).forward


def taps_fn(cfg: llama.ModelConfig):
    """The family's `block_forward_with_taps` (calibration pipeline contract)."""
    return family_module(cfg).block_forward_with_taps
