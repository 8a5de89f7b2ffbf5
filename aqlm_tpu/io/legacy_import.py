"""Legacy (reference-format) checkpoint importer.

The reference saves quantized models in three formats
(convert_legacy_model_format.py:1-5 calls the zoo "this abomination"):

1. **Calibration format** (main.py:310-316): one *pickled torch layer module*
   per file ``{i}.pth`` + ``not_quantized_weights.pt`` + ``args.pt``. The
   pickles reference the repo's own classes (``src.aq.QuantizedWeight``,
   transformers blocks), so naive ``torch.load`` requires the exact reference
   source tree and transformers version.
2. **PV/FSDP per-tensor format** (finetune.py:879-917 save_pv_model): one
   pickled ``QuantizedWeight`` per quantized projection, named
   ``{module_path}.weight.pth``, + ``non_quantized_state_dict.pth``.
3. HF hub format (convert_to_hf.py) — handled by `aqlm_tpu.io.hf_import`.

This module imports formats 1 and 2 **without the reference code**: a
permissive unpickler resolves torch/stdlib classes for real and replaces
everything else (reference classes, any-version transformers blocks) with
attribute-bag stubs, then the importer walks the recovered object graph and
lifts codes/codebooks/scales into our pytree (the counterpart of
``load_quantized_model``, src/modelutils.py:251-265, and
``load_quantized_model_from_fdsp_checkpoint``,
convert_legacy_model_format.py:71-101).

Covered reference behaviours:
- ``codes`` stored directly or wrapped in ``IntCodes`` FSDP storage
  (src/utils.py:155-180: int codes viewed as a float64 parameter);
- signed code dtypes with uint semantics (inference_lib utils.py:23-31);
- per-channel ``[OG,1,1,1]`` or per-group ``[OG,IG,1,1]`` scales, and the
  kmeans-quantized ``scales_clusters``/``scales_indices`` pair
  (src/aq.py:180-194 get_scales);
- dense (unquantized) projections left as ``nn.Linear``.

Not covered: ``codebook_value_nbits < 16`` second-level codebook re-fitting
(src/aq.py:142-178 re-runs kmeans on every forward; we import the raw
codebooks and report the flag so callers can re-quantize with
`aqlm_tpu.calib` if exact parity is needed).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.io.hf_import import unpack_codes
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS, ModelConfig
from aqlm_tpu.ops.dequant import AqlmWeight
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = [
    "load_legacy_checkpoint",
    "load_legacy_fsdp_checkpoint",
    "permissive_torch_load",
]

# Module roots resolved for real during unpickling. Everything else (the
# reference's `src.*`, any transformers version, accelerate hooks...) becomes
# an attribute-bag stub: we only need the tensors, not working modules.
_REAL_ROOTS = ("torch", "collections", "builtins", "numpy", "_codecs", "copyreg", "functools")


class _Stub:
    """Attribute bag standing in for any unresolvable pickled class."""

    def __init__(self, *args, **kwargs):
        self._stub_init_args = args
        self._stub_init_kwargs = kwargs

    def __new__(cls, *args, **kwargs):
        return object.__new__(cls)

    def __setstate__(self, state):
        if isinstance(state, tuple) and len(state) == 2:  # (dict, slots) protocol
            d, slots = state
            if d:
                self.__dict__.update(d)
            if slots:
                self.__dict__.update(slots)
        elif isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state


class _PermissiveUnpickler(pickle.Unpickler):
    _class_cache: dict[tuple[str, str], type] = {}

    def find_class(self, module: str, name: str):
        if module.split(".")[0] in _REAL_ROOTS:
            return super().find_class(module, name)
        key = (module, name)
        cls = self._class_cache.get(key)
        if cls is None:
            cls = type(name, (_Stub,), {"__module__": module})
            self._class_cache[key] = cls
        return cls


class _ShimPickleModule:
    """Just enough of the pickle-module surface for torch.load."""

    Unpickler = _PermissiveUnpickler
    load = staticmethod(pickle.load)
    loads = staticmethod(pickle.loads)


def permissive_torch_load(path: str) -> Any:
    """torch.load that stubs out unresolvable classes instead of failing."""
    import torch

    return torch.load(
        path, map_location="cpu", pickle_module=_ShimPickleModule, weights_only=False
    )


# ---------------------------------------------------------------------------
# object-graph helpers (stubbed nn.Modules keep state in __dict__ exactly the
# way real ones do: _parameters / _buffers / _modules OrderedDicts)
# ---------------------------------------------------------------------------


def _attr(obj, name, default=None):
    d = getattr(obj, "__dict__", {})
    if name in d:
        return d[name]
    for table in ("_parameters", "_buffers", "_modules"):
        t = d.get(table)
        if t and name in t:
            return t[name]
    return getattr(obj, name, default)


def _child(obj, dotted: str, default=None):
    for part in dotted.split("."):
        obj = _attr(obj, part)
        if obj is None:
            return default
    return obj


def _np(t) -> np.ndarray | None:
    if t is None:
        return None
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


_TORCH_TO_NP = {"torch.int8": np.int8, "torch.int16": np.int16, "torch.int32": np.int32,
                "torch.int64": np.int64, "torch.uint8": np.uint8}


def _codes_from_int_codes(storage) -> np.ndarray:
    """Recover int codes from an IntCodes stub (src/utils.py:155-180): the
    codes' raw bytes live in a float64 parameter; shape/dtype ride alongside."""
    data = _np(_attr(storage, "data"))
    np_dtype = _TORCH_TO_NP[str(_attr(storage, "dtype"))]
    numel = int(_attr(storage, "numel"))
    shape = tuple(_attr(storage, "shape"))
    flat = np.frombuffer(data.tobytes(), dtype=np_dtype)[:numel]
    return flat.reshape(shape)


def _extract_quantized_weight(qw, *, dtype) -> tuple[AqlmWeight, dict]:
    """Reference QuantizedWeight (stub) -> our AqlmWeight + import notes."""
    codes = _attr(qw, "codes")
    if codes is not None:
        codes = _np(codes)
    else:
        codes = _codes_from_int_codes(_attr(qw, "codes_storage"))
    codebooks = _np(_attr(qw, "codebooks"))  # [K, S, og, ig]
    num_codebooks, codebook_size, og, ig = codebooks.shape
    nbits = int(round(np.log2(codebook_size)))
    scheme = AqlmScheme(
        num_codebooks=num_codebooks, nbits_per_codebook=nbits,
        in_group_size=ig, out_group_size=og,
    )
    # signed storage dtypes carry uint semantics (e.g. int16 codes for S=65536)
    codes = unpack_codes(codes, nbits)

    notes = {}
    scales = _attr(qw, "scales")
    if scales is not None:
        scales = _np(scales).astype(np.float32)
        if scales.shape[1] == 1:  # [OG, 1, 1, 1] per-output-channel
            scales = scales.reshape(-1)
        else:  # [OG, IG, 1, 1] per-group (scale_nbits > 0)
            scales = scales.reshape(scales.shape[0], scales.shape[1])
    else:  # kmeans-quantized scales: clusters[OG, 2^b] gathered by indices[OG, IG]
        clusters = _np(_attr(qw, "scales_clusters")).astype(np.float32)
        indices = _np(_attr(qw, "scales_indices")).astype(np.int64)
        scales = np.take_along_axis(clusters, indices, axis=1)
        notes["scales_were_clustered"] = True

    cv_nbits = _attr(qw, "codebook_value_nbits", 16)
    if cv_nbits is not None and int(cv_nbits) < 16:
        notes["codebook_value_nbits"] = int(cv_nbits)

    w = AqlmWeight(
        codes=jnp.asarray(codes),
        codebooks=jnp.asarray(codebooks.astype(np.float32), dtype),
        scales=jnp.asarray(scales),
        bias=None,
        scheme=scheme,
    )
    return w, notes


_PROJ_PATHS = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def _import_linear(mod, *, mode, dtype, notes_sink: list):
    """Reference QuantizedLinear stub OR real nn.Linear -> our layer entry."""
    qw = _attr(mod, "quantized_weight")
    bias = _np(_attr(mod, "bias"))
    if qw is not None:
        w, notes = _extract_quantized_weight(qw, dtype=dtype)
        if notes:
            notes_sink.append(notes)
        if bias is not None:
            w = AqlmWeight(codes=w.codes, codebooks=w.codebooks, scales=w.scales,
                           bias=jnp.asarray(bias.astype(np.float32), dtype), scheme=w.scheme)
        return QuantizedLinear.from_aqlm(w, mode=mode)
    weight = _np(_attr(mod, "weight"))
    assert weight is not None, "projection has neither quantized_weight nor weight"
    return DenseLinear(
        weight=jnp.asarray(weight.astype(np.float32), dtype),
        bias=None if bias is None else jnp.asarray(bias.astype(np.float32), dtype),
    )


def _finish_params(params, sd, cfg, dtype):
    """Fill embed / final norm / lm_head from a top-level state dict."""

    def arr(key):
        t = sd.get(key)
        return None if t is None else jnp.asarray(_np(t).astype(np.float32), dtype)

    params["embed"] = arr("model.embed_tokens.weight")
    params["final_norm"] = arr("model.norm.weight")
    lm = arr("lm_head.weight")
    params["lm_head"] = None if (lm is None or cfg.tie_embeddings) else DenseLinear(weight=lm, bias=None)
    return params


def load_legacy_checkpoint(
    load_path: str, cfg: ModelConfig, *, mode: str = "reference", dtype=jnp.float32
) -> tuple[dict, AqlmScheme, list[dict]]:
    """Import a reference *calibration-format* checkpoint directory
    (``{i}.pth`` pickled layers + ``not_quantized_weights.pt``).

    The model config must be supplied by the caller (the reference format
    stores only the HF model *name* in args.pt — mirroring how
    convert_legacy_model_format.py requires ``--base_model``).

    Returns (params, scheme, import_notes).
    """
    notes: list[dict] = []
    scheme = None
    layers = []
    for i in range(cfg.num_layers):
        layer_mod = permissive_torch_load(os.path.join(load_path, f"{i}.pth"))
        layer = {
            "input_norm": jnp.asarray(
                _np(_child(layer_mod, "input_layernorm.weight")).astype(np.float32), dtype),
            "post_attn_norm": jnp.asarray(
                _np(_child(layer_mod, "post_attention_layernorm.weight")).astype(np.float32), dtype),
        }
        for ours in QUANTIZABLE_PROJS:
            mod = _child(layer_mod, _PROJ_PATHS[ours])
            assert mod is not None, f"layer {i}: missing {_PROJ_PATHS[ours]}"
            entry = _import_linear(mod, mode=mode, dtype=dtype, notes_sink=notes)
            if isinstance(entry, QuantizedLinear):
                scheme = entry.scheme
            layer[ours] = entry
        layers.append(layer)

    sd = permissive_torch_load(os.path.join(load_path, "not_quantized_weights.pt"))
    params = _finish_params({"layers": layers}, sd, cfg, dtype)
    assert scheme is not None, "no quantized projections found"
    return params, scheme, notes


def load_legacy_fsdp_checkpoint(
    load_path: str, cfg: ModelConfig, *, mode: str = "reference", dtype=jnp.float32
) -> tuple[dict, AqlmScheme, list[dict]]:
    """Import a reference *PV/FSDP per-tensor* checkpoint directory
    (``model.layers.{i}.{proj}.weight.pth`` pickled QuantizedWeights +
    ``non_quantized_state_dict.pth``); the loader counterpart of
    convert_legacy_model_format.py:71-101."""
    notes: list[dict] = []
    scheme = None
    sd = permissive_torch_load(os.path.join(load_path, "non_quantized_state_dict.pth"))

    def arr(key):
        return jnp.asarray(_np(sd[key]).astype(np.float32), dtype)

    layers = []
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}"
        layer = {
            "input_norm": arr(f"{prefix}.input_layernorm.weight"),
            "post_attn_norm": arr(f"{prefix}.post_attention_layernorm.weight"),
        }
        for ours in QUANTIZABLE_PROJS:
            fname = f"{prefix}.{_PROJ_PATHS[ours]}.weight.pth"
            fpath = os.path.join(load_path, fname)
            if os.path.exists(fpath):
                qw = permissive_torch_load(fpath)
                w, n = _extract_quantized_weight(qw, dtype=dtype)
                if n:
                    notes.append(n)
                layer[ours] = QuantizedLinear.from_aqlm(w, mode=mode)
                scheme = w.scheme
            else:  # unquantized projection lives in the state dict
                layer[ours] = DenseLinear(
                    weight=arr(f"{prefix}.{_PROJ_PATHS[ours]}.weight"), bias=None)
        layers.append(layer)

    params = _finish_params({"layers": layers}, sd, cfg, dtype)
    assert scheme is not None, "no quantized projections found"
    return params, scheme, notes
