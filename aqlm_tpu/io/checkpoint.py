"""Canonical checkpoint format + per-layer resume checkpoints.

The reference has three checkpoint formats (SURVEY.md §5.4; the legacy
converter calls the situation "this abomination",
/root/reference/convert_legacy_model_format.py:1-5). This build uses ONE
canonical on-disk format from day 1:

- model dir: `config.json` (model + quantization config, with a
  `quantization_config` block whose keys match the HF AQLM convention of
  /root/reference/convert_to_hf.py:90-100) + one `layer_{i}.npz` per block +
  `shared.npz` (embeddings, final norm, lm_head).
- layer .npz: flat `name.field -> array` entries; integer codes are stored in
  their smallest unsigned dtype (no packing tricks needed — JAX has native
  unsigned ints, cf. /root/reference/inference_lib/src/aqlm/utils.py:23-31).

Per-layer files double as the resume unit, like the reference's `{i}.pth`
(/root/reference/main.py:207-214, 310-316).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS, ModelConfig
from aqlm_tpu.ops.dequant import AqlmWeight
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = [
    "save_layer_checkpoint",
    "load_layer_checkpoint",
    "save_quantized_model",
    "load_quantized_model",
]

_NORM_KEYS = ("input_norm", "post_attn_norm")

# numpy's npz cannot represent ml_dtypes (bfloat16 round-trips as void2);
# store such arrays as a uint16 view under a suffixed key
_BF16_SUFFIX = "::bf16"


def _savez(path: str, arrays: dict) -> None:
    enc = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if v.dtype == jnp.bfloat16:
            enc[k + _BF16_SUFFIX] = v.view(np.uint16)
        else:
            enc[k] = v
    np.savez(path, **enc)


def _loadz(path: str) -> dict:
    out = {}
    with np.load(path, allow_pickle=False) as data:
        for k in data.files:
            if k.endswith(_BF16_SUFFIX):
                out[k[: -len(_BF16_SUFFIX)]] = data[k].view(jnp.bfloat16)
            else:
                out[k] = data[k]
    return out


_RUNTIME_FIELDS = (
    "codes", "codes_t", "codebooks", "packed_cb", "w8", "w8_scale",
    "scales", "bias", "codes_tl", "w4", "w4_gscale",
)


def _layer_to_flat(layer: dict) -> tuple[dict, dict]:
    """(arrays, meta) for one block."""
    arrays, meta = {}, {}
    for name, value in layer.items():
        if isinstance(value, QuantizedLinear) and value.mode != "reference":
            # MATERIALIZED runtime layout (convert --to int8|int4|codes):
            # the load-time from_aqlm transcode measured 94-310 s for a 7B
            # model (BENCH_r04 cold start) — a materialized checkpoint loads
            # the serving arrays directly. Reference counterpart: the pip
            # package's second-per-checkpoint load (inference.py:11-76).
            for field in _RUNTIME_FIELDS:
                v = getattr(value, field)
                if v is not None:
                    arrays[f"{name}.{field}"] = np.asarray(v)
            meta[name] = {
                "kind": "runtime", "mode": value.mode,
                "scheme": value.scheme.name,
            }
        elif isinstance(value, QuantizedLinear):
            arrays[f"{name}.codes"] = np.asarray(value.codes)
            arrays[f"{name}.codebooks"] = np.asarray(value.codebooks)
            arrays[f"{name}.scales"] = np.asarray(value.scales)
            if value.bias is not None:
                arrays[f"{name}.bias"] = np.asarray(value.bias)
            meta[name] = {"kind": "quantized", "scheme": value.scheme.name}
        elif isinstance(value, DenseLinear):
            arrays[f"{name}.weight"] = np.asarray(value.weight)
            if value.bias is not None:
                arrays[f"{name}.bias"] = np.asarray(value.bias)
            meta[name] = {"kind": "dense"}
        else:  # bare array (norm weights)
            arrays[name] = np.asarray(value)
            meta[name] = {"kind": "array"}
    return arrays, meta


def _layer_from_flat(arrays: dict, meta: dict) -> dict:
    layer = {}
    for name, m in meta.items():
        if m["kind"] == "runtime":
            fields = {
                f: (jnp.asarray(arrays[f"{name}.{f}"])
                    if f"{name}.{f}" in arrays else None)
                for f in _RUNTIME_FIELDS
            }
            layer[name] = QuantizedLinear(
                scheme=AqlmScheme.parse(m["scheme"]), mode=m["mode"], **fields
            )
        elif m["kind"] == "quantized":
            scheme = AqlmScheme.parse(m["scheme"])
            w = AqlmWeight(
                codes=jnp.asarray(arrays[f"{name}.codes"]),
                codebooks=jnp.asarray(arrays[f"{name}.codebooks"]),
                scales=jnp.asarray(arrays[f"{name}.scales"]),
                bias=jnp.asarray(arrays[f"{name}.bias"]) if f"{name}.bias" in arrays else None,
                scheme=scheme,
            )
            layer[name] = QuantizedLinear.from_aqlm(w, mode="reference")
        elif m["kind"] == "dense":
            layer[name] = DenseLinear(
                weight=jnp.asarray(arrays[f"{name}.weight"]),
                bias=jnp.asarray(arrays[f"{name}.bias"]) if f"{name}.bias" in arrays else None,
            )
        else:
            layer[name] = jnp.asarray(arrays[name])
    return layer


def save_layer_checkpoint(save_dir: str, layer_index: int, layer: dict) -> str:
    os.makedirs(save_dir, exist_ok=True)
    arrays, meta = _layer_to_flat(layer)
    path = os.path.join(save_dir, f"layer_{layer_index}.npz")
    _savez(path, {"__meta__": np.asarray(json.dumps(meta)), **arrays})
    return path


def load_layer_checkpoint(save_dir: str, layer_index: int, scheme: AqlmScheme | None = None):
    """Returns the block params dict, or None if no checkpoint exists."""
    path = os.path.join(save_dir, f"layer_{layer_index}.npz")
    if not os.path.exists(path):
        return None
    arrays = _loadz(path)
    meta = json.loads(str(arrays.pop("__meta__")))
    return _layer_from_flat(arrays, meta)


def save_quantized_model(save_dir: str, params: dict, cfg: ModelConfig, extra_config: dict | None = None):
    """Full-model save: config.json + shared.npz + per-layer npz files."""
    os.makedirs(save_dir, exist_ok=True)
    scheme_name = None
    for layer in params["layers"]:
        for value in layer.values():
            if isinstance(value, QuantizedLinear):
                scheme_name = value.scheme.name
                break
        if scheme_name:
            break
    scheme = AqlmScheme.parse(scheme_name) if scheme_name else None
    from aqlm_tpu.models.family import family_name

    config = {
        "model_family": family_name(cfg),
        "model_config": dataclasses.asdict(cfg),
        "quantization_config": None
        if scheme is None
        else {
            "quant_method": "aqlm",
            "nbits_per_codebook": scheme.nbits_per_codebook,
            "num_codebooks": scheme.num_codebooks,
            "out_group_size": scheme.out_group_size,
            "in_group_size": scheme.in_group_size,
            "linear_weights_not_to_quantize": ["model.embed_tokens.weight", "lm_head.weight"],
        },
    }
    modes = {
        v.mode
        for layer in params["layers"]
        for v in layer.values()
        if isinstance(v, QuantizedLinear)
    }
    if modes and modes != {"reference"}:
        assert len(modes) == 1, f"mixed runtime modes in one checkpoint: {modes}"
        config["runtime_mode"] = next(iter(modes))
    if extra_config:
        config.update(extra_config)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    shared = {"embed": np.asarray(params["embed"]), "final_norm": np.asarray(params["final_norm"])}
    # family extras: falcon/opt biased final LayerNorm, opt learned positions
    for extra in ("final_norm_bias", "pos_embed"):
        if params.get(extra) is not None:
            shared[extra] = np.asarray(params[extra])
    if params.get("lm_head") is not None:
        shared["lm_head.weight"] = np.asarray(params["lm_head"].weight)
        if params["lm_head"].bias is not None:
            shared["lm_head.bias"] = np.asarray(params["lm_head"].bias)
    _savez(os.path.join(save_dir, "shared.npz"), shared)

    for li, layer in enumerate(params["layers"]):
        save_layer_checkpoint(save_dir, li, layer)
    return save_dir


def load_quantized_model(save_dir: str) -> tuple[dict, ModelConfig]:
    with open(os.path.join(save_dir, "config.json")) as f:
        config = json.load(f)
    from aqlm_tpu.models.family import config_class

    cfg = config_class(config.get("model_family", "llama"))(**config["model_config"])
    extras = {}
    data = _loadz(os.path.join(save_dir, "shared.npz"))
    embed = jnp.asarray(data["embed"])
    final_norm = jnp.asarray(data["final_norm"])
    for extra in ("final_norm_bias", "pos_embed"):
        if extra in data:
            extras[extra] = jnp.asarray(data[extra])
    lm_head = None
    if "lm_head.weight" in data:
        lm_head = DenseLinear(
            weight=jnp.asarray(data["lm_head.weight"]),
            bias=jnp.asarray(data["lm_head.bias"]) if "lm_head.bias" in data else None,
        )
    layers = []
    for li in range(cfg.num_layers):
        layer = load_layer_checkpoint(save_dir, li)
        if layer is None:
            raise FileNotFoundError(f"missing layer_{li}.npz in {save_dir}")
        layers.append(layer)
    return (
        {"embed": embed, "layers": layers, "final_norm": final_norm, "lm_head": lm_head, **extras},
        cfg,
    )
