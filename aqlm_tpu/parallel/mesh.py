"""Device mesh construction and partition specs for AQLM-quantized models.

TPU-native replacement for the reference's four parallelism mechanisms
(SURVEY.md §2.3): instead of replicate/parallel_apply (calibration DP,
/root/reference/main.py:487-522), FSDP (/root/reference/finetune.py:666-681),
and hand-rolled P2P weight ownership (/root/reference/src/pv_optimizer.py:379-409),
one `jax.sharding.Mesh` with ("data", "model") axes carries everything:

- data axis: batch sharding (calibration samples, finetune batches, eval).
- model axis: megatron-style tensor parallelism over the quantized linears —
  column-parallel q/k/v/gate/up (shard OUT), row-parallel o/down (shard IN,
  XLA inserts the all-reduce) — plus vocab-sharded embed/lm_head.

Codebooks are tiny (<=2 MiB) and stay replicated; codes and scales shard with
the features they encode. Everything is expressed as PartitionSpecs on the
parameter pytree; XLA SPMD inserts the collectives (ICI intra-slice).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = [
    "make_mesh",
    "model_param_specs",
    "kv_cache_specs",
    "shard_params",
    "COLUMN_PARALLEL",
    "ROW_PARALLEL",
]

# which projections shard which way (megatron TP layout)
COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
ROW_PARALLEL = ("o_proj", "down_proj")


def make_mesh(
    data: int | None = None,
    model: int | None = None,
    devices=None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the available devices.

    Defaults: model = all devices, data = 1. The model axis should map to
    ICI-adjacent devices; `mesh_utils.create_device_mesh` handles the physical
    layout when available.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model is None:
        model = n // (data or 1)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data}*{model} != {n} devices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names)


def _dense_spec(lin: DenseLinear, kind: str, model_axis: str) -> DenseLinear:
    """PartitionSpec-leaved DenseLinear. kind: 'column' | 'row' | 'replicated'."""
    if kind == "column":
        w = P(model_axis, None)
        b = P(model_axis) if lin.bias is not None else None
    elif kind == "row":
        w = P(None, model_axis)
        b = P() if lin.bias is not None else None
    else:
        w = P(None, None)
        b = P() if lin.bias is not None else None
    return DenseLinear(weight=w, bias=b)


def _quantized_spec(q: QuantizedLinear, kind: str, model_axis: str) -> QuantizedLinear:
    """PartitionSpec-leaved QuantizedLinear for TP kind 'column' or 'row'.

    Layout notes (shapes from ops/runtime.py):
      codes     [OG, IG, K]      OG tracks OUT, IG tracks IN
      codes_t   [K, IG, OUT]
      packed_cb small, replicated
      w8        [OUT, IN_padded]
      scales / w8_scale / bias   [OUT]
    """
    col = kind == "column"
    ma = model_axis

    def spec_if(arr, spec):
        return spec if arr is not None else None

    if q.scales.ndim == 2:  # per-(out,in)-group scales (scale_nbits>0)
        out1 = P(ma, None) if col else P(None, ma)
    else:
        out1 = P(ma) if col else P()
    return QuantizedLinear(
        codes=spec_if(q.codes, P(ma, None, None) if col else P(None, ma, None)),
        codes_t=spec_if(q.codes_t, P(None, None, ma) if col else P(None, ma, None)),
        codebooks=spec_if(q.codebooks, P()),
        packed_cb=spec_if(q.packed_cb, P()),
        w8=spec_if(q.w8, P(ma, None) if col else P(None, ma)),
        w8_scale=spec_if(q.w8_scale, P(ma) if col else P()),
        scales=out1,
        bias=spec_if(q.bias, P(ma) if col else P()),
        scheme=q.scheme,
        mode=q.mode,
        codes_tl=spec_if(q.codes_tl, P(ma, None, None) if col else P(None, ma, None)),
        # int4: w4 [OUT, INpad/2] (block-local packing keeps row shards
        # contiguous in original columns); gscale [INpad/G, OUT]
        w4=spec_if(q.w4, P(ma, None) if col else P(None, ma)),
        w4_gscale=spec_if(q.w4_gscale, P(None, ma) if col else P(ma, None)),
    )


def _linear_spec(lin, kind: str, model_axis: str):
    if isinstance(lin, QuantizedLinear):
        return _quantized_spec(lin, kind, model_axis)
    return _dense_spec(lin, kind, model_axis)


def model_param_specs(params: dict, model_axis: str = "model") -> dict:
    """PartitionSpec pytree matching a llama-family params pytree.

    Vocab-sharded embed/lm_head, megatron TP for the block projections,
    replicated norms. Mirrors the structural swap-compatibility of the params
    tree: works whether projections are DenseLinear or QuantizedLinear in any
    runtime mode.
    """
    ma = model_axis
    layer_specs = []
    for layer in params["layers"]:
        spec = {}
        for name, value in layer.items():
            if name.endswith("norm"):
                spec[name] = P()
            elif name in COLUMN_PARALLEL:
                spec[name] = _linear_spec(value, "column", ma)
            elif name in ROW_PARALLEL:
                spec[name] = _linear_spec(value, "row", ma)
            else:  # unknown leaf: replicate
                spec[name] = jax.tree.map(lambda _: P(), value)
        layer_specs.append(spec)
    specs = {
        "embed": P(ma, None),
        "layers": layer_specs,
        "final_norm": P(),
        "lm_head": None
        if params.get("lm_head") is None
        else _linear_spec(params["lm_head"], "column", ma),
    }
    return specs


def kv_cache_specs(num_layers: int, data_axis: str = "data", model_axis: str = "model"):
    """KV cache [B, L, n_kv, D]: batch over data, kv heads over model."""
    spec = (P(data_axis, None, model_axis, None), P(data_axis, None, model_axis, None))
    return [spec for _ in range(num_layers)]


def shard_params(params, specs, mesh: Mesh):
    """Place a params pytree onto the mesh per its spec pytree."""

    def place(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        place, params, specs, is_leaf=lambda x: x is None or isinstance(x, jax.Array)
    )
