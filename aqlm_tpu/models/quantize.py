"""Model-level quantization plumbing: swap dense projections for
QuantizedLinear, mirroring the reference's layer swap (main.py:272-283) and
its skip-list convention (`linear_weights_not_to_quantize` — embeddings and
lm_head stay dense, convert_to_hf.py:90-100)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS, ModelConfig
from aqlm_tpu.ops.dequant import AqlmWeight, random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = [
    "random_quantized_params", "map_quantized_linears", "swap_in_quantized",
    "convert_runtime_mode",
]


def convert_runtime_mode(params: dict, mode: str) -> dict:
    """Transcode every QuantizedLinear (any name, incl. MoE experts) from the
    canonical reference layout to the given runtime mode.

    This is the LOAD-TIME path (94-310 s for a 7B model, BENCH_r04); ship a
    materialized checkpoint instead with `convert --to int8|int4|codes` when
    cold start matters — resolve_model then skips this entirely."""
    if mode == "reference":
        return params
    for layer in params["layers"]:
        for name, lin in list(layer.items()):
            if not isinstance(lin, QuantizedLinear) or lin.mode == mode:
                continue
            assert lin.mode == "reference", (
                f"cannot transcode a materialized {lin.mode!r} layout to "
                f"{mode!r}; reconvert from the canonical checkpoint"
            )
            w = AqlmWeight(codes=lin.codes, codebooks=lin.codebooks,
                           scales=lin.scales, bias=lin.bias, scheme=lin.scheme)
            layer[name] = QuantizedLinear.from_aqlm(w, mode=mode)
    return params


def random_quantized_params(
    key, cfg: ModelConfig, scheme: AqlmScheme, mode: str = "codes", dtype=jnp.bfloat16
) -> dict:
    """Random model with quantized projections (benchmarks / smoke tests)."""
    from aqlm_tpu.models.llama import init_random_params

    params = init_random_params(key, cfg, dtype=dtype)
    keys = jax.random.split(key, cfg.num_layers * len(QUANTIZABLE_PROJS))
    ki = 0
    for layer in params["layers"]:
        for name in QUANTIZABLE_PROJS:
            dense: DenseLinear = layer[name]
            out_f, in_f = dense.weight.shape
            if out_f % scheme.out_group_size or in_f % scheme.in_group_size:
                ki += 1
                continue
            w = random_aqlm_weight(keys[ki], scheme, out_f, in_f, dtype=jnp.float32)
            layer[name] = QuantizedLinear.from_aqlm(w, mode=mode)
            ki += 1
    return params


def map_quantized_linears(params: dict, fn):
    """Apply fn(layer_idx, name, qlin) -> qlin to every QuantizedLinear."""
    for li, layer in enumerate(params["layers"]):
        for name in QUANTIZABLE_PROJS:
            if isinstance(layer.get(name), QuantizedLinear):
                layer[name] = fn(li, name, layer[name])
    return params


def swap_in_quantized(params: dict, layer_idx: int, name: str, w: AqlmWeight, mode: str):
    """Replace one projection with a freshly quantized weight."""
    params["layers"][layer_idx][name] = QuantizedLinear.from_aqlm(w, mode=mode)
    return params


def random_quantize_projections(
    key, params: dict, scheme: AqlmScheme, mode: str = "reference", skip=("moe_gate",)
):
    """Swap every quantizable 2-D DenseLinear inside the layer dicts for a
    random-codes QuantizedLinear — the family-agnostic scaffold (falcon's
    fc1/fc2, opt's out_proj, mixtral's experts.{e}.* all qualify; router
    gates are skipped like the reference's linear_weights_not_to_quantize).
    Biases are preserved on the swapped-in quantized linears."""
    import dataclasses as _dc

    for layer in params["layers"]:
        for name, lin in list(layer.items()):
            if name in skip or not isinstance(lin, DenseLinear) or lin.weight.ndim != 2:
                continue
            out_f, in_f = lin.weight.shape
            if out_f % scheme.out_group_size or in_f % scheme.in_group_size:
                continue
            key, sub = jax.random.split(key)
            w = random_aqlm_weight(sub, scheme, out_f, in_f, dtype=jnp.float32)
            if lin.bias is not None:
                w = _dc.replace(w, bias=lin.bias)
            layer[name] = QuantizedLinear.from_aqlm(w, mode=mode)
    return params
