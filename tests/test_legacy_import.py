"""Legacy (reference-format) checkpoint import.

Builds checkpoints that are byte-for-byte shaped like the reference's
calibration format (main.py:310-316: pickled torch layer modules referencing
`src.aq.*` classes) and PV/FSDP per-tensor format
(convert_legacy_model_format.py:71-101), then *removes* the fake source
modules before importing — proving the permissive unpickler needs no
reference code on the import side.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from aqlm_tpu.io.legacy_import import (  # noqa: E402
    load_legacy_checkpoint,
    load_legacy_fsdp_checkpoint,
)
from aqlm_tpu.models.common import DenseLinear  # noqa: E402
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS, ModelConfig  # noqa: E402
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight  # noqa: E402
from aqlm_tpu.ops.runtime import QuantizedLinear  # noqa: E402

CFG = ModelConfig.tiny()
IG, NBITS, K = 4, 8, 2  # 2x8-style scheme at toy size
S = 2**NBITS


# --- fake "reference source tree", registered only while SAVING ------------


def _register_fake_reference():
    mods = {}

    def module(name):
        m = types.ModuleType(name)
        mods[name] = m
        sys.modules[name] = m
        return m

    src = module("src")
    aq = module("src.aq")
    ut = module("src.utils")
    modeling = module("fake_transformers.modeling_llama")
    module("fake_transformers")
    src.aq, src.utils = aq, ut

    def export(mod, cls):
        cls.__module__ = mod.__name__
        cls.__qualname__ = cls.__name__
        setattr(mod, cls.__name__, cls)
        return cls

    class IntCodes(nn.Module):
        # mirrors the reference's FSDP storage trick (src/utils.py:155-180):
        # int codes' raw bytes live in a float64 parameter
        def __init__(self, codes):
            super().__init__()
            self.dtype, self.shape, self.numel = codes.dtype, tuple(codes.shape), codes.numel()
            ratio = 8 // codes.element_size()
            flat = F.pad(codes.flatten().clone(), (0, -codes.numel() % ratio))
            self.storage_dtype = torch.float64
            self.data = nn.Parameter(flat.view(torch.float64), requires_grad=False)

    class QuantizedWeight(nn.Module):
        def __init__(self, codes, codebooks, scales=None, scales_clusters=None,
                     scales_indices=None, codebook_value_nbits=16, wrap_codes=False):
            super().__init__()
            self.codebooks = nn.Parameter(codebooks)
            if wrap_codes:
                self.codes = None
                self.codes_storage = IntCodes(codes)
            else:
                self.codes = nn.Parameter(codes, requires_grad=False)
                self.codes_storage = None
            self.scales = None if scales is None else nn.Parameter(scales)
            self.scales_clusters = None if scales_clusters is None else nn.Parameter(scales_clusters)
            self.scales_indices = None if scales_indices is None else nn.Parameter(
                scales_indices, requires_grad=False)
            self.codebook_value_nbits = codebook_value_nbits

    class QuantizedLinearRef(nn.Module):
        def __init__(self, qw, bias=None):
            super().__init__()
            self.quantized_weight = qw
            self.bias = None if bias is None else nn.Parameter(bias)

    QuantizedLinearRef.__name__ = QuantizedLinearRef.__qualname__ = "QuantizedLinear"

    class FakeRMSNorm(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.rand(dim) + 0.5)

    class FakeAttention(nn.Module):
        pass

    class FakeMLP(nn.Module):
        pass

    class FakeDecoderLayer(nn.Module):
        pass

    for m, classes in ((ut, [IntCodes]), (aq, [QuantizedWeight, QuantizedLinearRef]),
                       (modeling, [FakeRMSNorm, FakeAttention, FakeMLP, FakeDecoderLayer])):
        for cls in classes:
            export(m, cls)

    return mods, aq, modeling


def _unregister(mods):
    for name in mods:
        sys.modules.pop(name, None)


def _random_qw(rng, aq, out_f, in_f, *, signed_codes=False, wrap_codes=False,
               per_group_scales=False, clustered_scales=False):
    og_n, ig_n = out_f, in_f // IG
    codes = torch.from_numpy(rng.integers(0, S, (og_n, ig_n, K)).astype(np.int64))
    codes = codes.to(torch.int8) if signed_codes else codes.to(torch.int32)
    codebooks = torch.from_numpy(rng.standard_normal((K, S, 1, IG)).astype(np.float32))
    kw = {}
    if clustered_scales:
        clusters = torch.from_numpy((rng.random((og_n, 4)) + 0.5).astype(np.float32))
        indices = torch.from_numpy(rng.integers(0, 4, (og_n, ig_n)).astype(np.int64))
        kw = dict(scales_clusters=clusters, scales_indices=indices)
    elif per_group_scales:
        kw = dict(scales=torch.from_numpy(
            (rng.random((og_n, ig_n, 1, 1)) + 0.5).astype(np.float32)))
    else:
        kw = dict(scales=torch.from_numpy(
            (rng.random((og_n, 1, 1, 1)) + 0.5).astype(np.float32)))
    return aq.QuantizedWeight(codes, codebooks, wrap_codes=wrap_codes, **kw)


def _expected_dense(qw) -> np.ndarray:
    """Dequantize a fake-reference QuantizedWeight with plain numpy."""
    if qw.codes is not None:
        codes = qw.codes.detach().numpy()
    else:
        st = qw.codes_storage
        flat = np.frombuffer(st.data.detach().numpy().tobytes(),
                             dtype={torch.int8: np.int8, torch.int32: np.int32}[st.dtype])
        codes = flat[: st.numel].reshape(st.shape)
    codes = codes.astype(np.int64) % S
    cb = qw.codebooks.detach().numpy()  # [K, S, 1, IG]
    og_n, ig_n, _ = codes.shape
    groups = np.zeros((og_n, ig_n, IG), np.float32)
    for k in range(K):
        groups += cb[k, codes[:, :, k], 0, :]
    if qw.scales is not None:
        s = qw.scales.detach().numpy()
        scale = s.reshape(og_n, 1, 1) if s.shape[1] == 1 else s.reshape(og_n, ig_n, 1)
    else:
        cl = qw.scales_clusters.detach().numpy()
        idx = qw.scales_indices.detach().numpy()
        scale = np.take_along_axis(cl, idx, axis=1).reshape(og_n, ig_n, 1)
    return (groups * scale).reshape(og_n, ig_n * IG)


def _build_layer(rng, aq, modeling, cfg, *, variant=0):
    layer = modeling.FakeDecoderLayer()
    layer.self_attn = modeling.FakeAttention()
    layer.mlp = modeling.FakeMLP()
    layer.input_layernorm = modeling.FakeRMSNorm(cfg.hidden_size)
    layer.post_attention_layernorm = modeling.FakeRMSNorm(cfg.hidden_size)
    d = cfg.dim_per_head
    dims = {
        "q_proj": (cfg.num_heads * d, cfg.hidden_size),
        "k_proj": (cfg.num_kv_heads * d, cfg.hidden_size),
        "v_proj": (cfg.num_kv_heads * d, cfg.hidden_size),
        "o_proj": (cfg.hidden_size, cfg.num_heads * d),
        "gate_proj": (cfg.intermediate_size, cfg.hidden_size),
        "up_proj": (cfg.intermediate_size, cfg.hidden_size),
        "down_proj": (cfg.hidden_size, cfg.intermediate_size),
    }
    expected = {}
    for j, name in enumerate(QUANTIZABLE_PROJS):
        out_f, in_f = dims[name]
        parent = layer.self_attn if name[0] in "qkvo" else layer.mlp
        if name == "up_proj" and variant == 0:
            # one projection deliberately left dense (linear_weights_not_to_quantize)
            lin = nn.Linear(in_f, out_f, bias=False)
            parent.up_proj = lin
            expected[name] = ("dense", lin.weight.detach().numpy().copy())
            continue
        qw = _random_qw(
            rng, aq, out_f, in_f,
            signed_codes=(j % 3 == 0), wrap_codes=(variant == 1 and j % 2 == 0),
            per_group_scales=(j % 3 == 1), clustered_scales=(j % 3 == 2),
        )
        bias = torch.from_numpy(rng.standard_normal(out_f).astype(np.float32)) if j == 0 else None
        setattr(parent, name, aq.QuantizedLinear(qw, bias=bias))
        expected[name] = ("quant", _expected_dense(qw),
                          None if bias is None else bias.numpy().copy())
    return layer, expected


def _not_quantized_sd(rng, cfg):
    return {
        "model.embed_tokens.weight": torch.from_numpy(
            rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32)),
        "model.norm.weight": torch.from_numpy(
            (rng.random(cfg.hidden_size) + 0.5).astype(np.float32)),
        "lm_head.weight": torch.from_numpy(
            rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32)),
    }


def _check_imported(params, expected_per_layer, cfg):
    for li, expected in enumerate(expected_per_layer):
        layer = params["layers"][li]
        for name, exp in expected.items():
            entry = layer[name]
            if exp[0] == "dense":
                assert isinstance(entry, DenseLinear)
                np.testing.assert_allclose(np.asarray(entry.weight), exp[1], rtol=1e-6)
            else:
                assert isinstance(entry, QuantizedLinear)
                w = AqlmWeight(codes=entry.codes, codebooks=entry.codebooks,
                               scales=entry.scales, bias=entry.bias, scheme=entry.scheme)
                got = np.asarray(dequantize_weight(w, dtype=jnp.float32))
                np.testing.assert_allclose(got, exp[1], rtol=2e-5, atol=2e-5)
                if exp[2] is not None:
                    np.testing.assert_allclose(np.asarray(entry.bias), exp[2], rtol=1e-6)
    assert params["embed"].shape == (cfg.vocab_size, cfg.hidden_size)
    assert params["lm_head"].weight.shape == (cfg.vocab_size, cfg.hidden_size)


def test_calibration_format_roundtrip(tmp_path):
    mods, aq, modeling = _register_fake_reference()
    rng = np.random.default_rng(0)
    try:
        expected_per_layer = []
        for i in range(CFG.num_layers):
            layer, expected = _build_layer(rng, aq, modeling, CFG, variant=i)
            torch.save(layer, tmp_path / f"{i}.pth")
            expected_per_layer.append(expected)
        torch.save(_not_quantized_sd(rng, CFG), tmp_path / "not_quantized_weights.pt")
    finally:
        _unregister(mods)  # the importer must not need the source classes

    params, scheme, notes = load_legacy_checkpoint(str(tmp_path), CFG)
    assert (scheme.num_codebooks, scheme.nbits_per_codebook, scheme.in_group_size) == (K, NBITS, IG)
    _check_imported(params, expected_per_layer, CFG)


def test_fsdp_format_roundtrip(tmp_path):
    mods, aq, modeling = _register_fake_reference()
    rng = np.random.default_rng(1)
    try:
        sd = _not_quantized_sd(rng, CFG)
        expected_per_layer = []
        for i in range(CFG.num_layers):
            expected = {}
            for name in ("input_layernorm", "post_attention_layernorm"):
                sd[f"model.layers.{i}.{name}.weight"] = torch.rand(CFG.hidden_size) + 0.5
            d = CFG.dim_per_head
            dims = {
                "q_proj": (CFG.num_heads * d, CFG.hidden_size),
                "k_proj": (CFG.num_kv_heads * d, CFG.hidden_size),
                "v_proj": (CFG.num_kv_heads * d, CFG.hidden_size),
                "o_proj": (CFG.hidden_size, CFG.num_heads * d),
                "gate_proj": (CFG.intermediate_size, CFG.hidden_size),
                "up_proj": (CFG.intermediate_size, CFG.hidden_size),
                "down_proj": (CFG.hidden_size, CFG.intermediate_size),
            }
            for j, name in enumerate(QUANTIZABLE_PROJS):
                out_f, in_f = dims[name]
                sub = "self_attn" if name[0] in "qkvo" else "mlp"
                if name == "gate_proj" and i == 0:  # unquantized projection
                    w = torch.from_numpy(rng.standard_normal((out_f, in_f)).astype(np.float32))
                    sd[f"model.layers.{i}.{sub}.{name}.weight"] = w
                    expected[name] = ("dense", w.numpy().copy())
                    continue
                qw = _random_qw(rng, aq, out_f, in_f, wrap_codes=(j % 2 == 1),
                                per_group_scales=(j % 2 == 0))
                torch.save(qw, tmp_path / f"model.layers.{i}.{sub}.{name}.weight.pth")
                expected[name] = ("quant", _expected_dense(qw), None)
            expected_per_layer.append(expected)
        torch.save(sd, tmp_path / "non_quantized_state_dict.pth")
    finally:
        _unregister(mods)

    params, scheme, notes = load_legacy_fsdp_checkpoint(str(tmp_path), CFG)
    _check_imported(params, expected_per_layer, CFG)


def test_forward_runs_on_imported_params(tmp_path):
    from aqlm_tpu.models import llama

    mods, aq, modeling = _register_fake_reference()
    rng = np.random.default_rng(2)
    try:
        for i in range(CFG.num_layers):
            layer, _ = _build_layer(rng, aq, modeling, CFG, variant=i)
            torch.save(layer, tmp_path / f"{i}.pth")
        torch.save(_not_quantized_sd(rng, CFG), tmp_path / "not_quantized_weights.pt")
    finally:
        _unregister(mods)

    params, _, _ = load_legacy_checkpoint(str(tmp_path), CFG)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    logits = llama.forward(params, CFG, ids)
    if isinstance(logits, tuple):
        logits = logits[0]
    assert logits.shape == (1, 8, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_convert_cli_from_legacy(tmp_path):
    """legacy calibration dir -> canonical format via the convert CLI."""
    from aqlm_tpu.cli import convert as cli_convert
    from aqlm_tpu.io import load_quantized_model

    src = tmp_path / "legacy"
    src.mkdir()
    mods, aq, modeling = _register_fake_reference()
    rng = np.random.default_rng(3)
    try:
        expected_per_layer = []
        for i in range(CFG.num_layers):
            layer, expected = _build_layer(rng, aq, modeling, CFG, variant=i)
            torch.save(layer, src / f"{i}.pth")
            expected_per_layer.append(expected)
        torch.save(_not_quantized_sd(rng, CFG), src / "not_quantized_weights.pt")
        import json

        cfg_json = tmp_path / "config.json"
        cfg_json.write_text(json.dumps({
            "model_type": "llama", "vocab_size": CFG.vocab_size,
            "hidden_size": CFG.hidden_size,
            "intermediate_size": CFG.intermediate_size,
            "num_hidden_layers": CFG.num_layers,
            "num_attention_heads": CFG.num_heads,
            "num_key_value_heads": CFG.num_kv_heads,
            "max_position_embeddings": CFG.max_position_embeddings,
        }))
    finally:
        _unregister(mods)

    out = tmp_path / "canonical"
    cli_convert.main([str(src), str(out), "--to", "canonical",
                      "--from_format", "legacy", "--base_config", str(cfg_json)])
    params, cfg2 = load_quantized_model(str(out))
    assert cfg2.num_layers == CFG.num_layers
    _check_imported(params, expected_per_layer, CFG)
