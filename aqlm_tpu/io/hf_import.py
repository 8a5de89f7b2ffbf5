"""Import/export of HF-hub AQLM checkpoints (ISTA-DASLab/*-AQLM-*).

Import reads the format written by the reference's converter
(/root/reference/convert_to_hf.py:50-100): per-projection tensors
`<prefix>.{codes,codebooks,scales,bias}` with codes packed into the smallest
SIGNED int dtype (unsigned semantics restored via mod 2^nbits,
/root/reference/inference_lib/src/aqlm/utils.py:23-31), plus a
`quantization_config` block in config.json. Export writes the same layout so
checkpoints produced here load in the reference's `aqlm` pip package.

torch (CPU) is used only as a (de)serializer for .bin files; safetensors
loads via its numpy API.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import ModelConfig
from aqlm_tpu.ops.dequant import AqlmWeight
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = [
    "load_hf_aqlm_checkpoint",
    "load_hf_dense_checkpoint",
    "export_hf_aqlm_state_dict",
    "model_config_from_hf",
]

_PROJ_MAP = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def unpack_codes(codes: np.ndarray, nbits: int) -> np.ndarray:
    """Signed-storage -> unsigned codes (reference utils.py:34-36)."""
    return (codes.astype(np.int64) % (2 ** nbits)).astype(np.uint16 if nbits > 8 else np.uint8)


def pack_codes(codes: np.ndarray, nbits: int) -> np.ndarray:
    """Unsigned codes -> smallest signed dtype (reference utils.py:28-31)."""
    c = codes.astype(np.int64)
    c = np.where(c >= 2 ** (nbits - 1), c - 2 ** nbits, c)
    return c.astype(np.int8 if nbits <= 8 else np.int16)


def _load_state_dict(path: str) -> dict:
    """All tensors from a HF checkpoint dir (safetensors and/or .bin, sharded ok)."""
    tensors = {}
    files = sorted(os.listdir(path))
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin") and "pytorch_model" in f]
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
    elif bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                t = v
                if t.dtype == torch.bfloat16:
                    t = t.float()
                tensors[k] = t.numpy()
    else:
        raise FileNotFoundError(f"no .safetensors or pytorch_model*.bin in {path}")
    return tensors


def _rope_scaling_from_hf(hf_config: dict):
    rs = hf_config.get("rope_scaling")
    if not rs:
        return None
    kind = rs.get("rope_type", rs.get("type"))
    if kind in ("default", None):
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return (
            "llama3", float(rs["factor"]), float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]), float(rs["original_max_position_embeddings"]),
        )
    raise NotImplementedError(f"rope_scaling type {kind!r} (supported: linear, llama3)")


def model_config_from_hf(hf_config: dict) -> ModelConfig:
    """Map a HF config.json (llama/mistral/qwen2/gemma family) to ModelConfig."""
    mt = hf_config.get("model_type", "llama")
    return ModelConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_size=hf_config["hidden_size"],
        intermediate_size=hf_config["intermediate_size"],
        num_layers=hf_config["num_hidden_layers"],
        num_heads=hf_config["num_attention_heads"],
        num_kv_heads=hf_config.get("num_key_value_heads", hf_config["num_attention_heads"]),
        head_dim=hf_config.get("head_dim"),
        rope_theta=hf_config.get("rope_theta", 10000.0),
        rms_eps=hf_config.get("rms_norm_eps", 1e-5),
        tie_embeddings=hf_config.get("tie_word_embeddings", False),
        attention_bias=hf_config.get("attention_bias", mt == "qwen2"),
        gemma_norm=mt == "gemma",
        max_position_embeddings=hf_config.get("max_position_embeddings", 4096),
        sliding_window=(
            None
            if mt == "qwen2" and not hf_config.get("use_sliding_window", False)
            else hf_config.get("sliding_window")
        ),
        rope_scaling=_rope_scaling_from_hf(hf_config),
    )


def load_hf_aqlm_checkpoint(
    path: str, *, mode: str = "reference", dtype=jnp.float32
) -> tuple[dict, ModelConfig, AqlmScheme]:
    """Load an HF-format AQLM checkpoint directory into a params pytree.

    Returns (params, model config, scheme). `mode` picks the runtime layout
    for the quantized projections.
    """
    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    qcfg = hf_config["quantization_config"]
    assert qcfg["quant_method"] == "aqlm", qcfg
    scheme = AqlmScheme(
        num_codebooks=qcfg["num_codebooks"],
        nbits_per_codebook=qcfg["nbits_per_codebook"],
        in_group_size=qcfg["in_group_size"],
        out_group_size=qcfg["out_group_size"],
    )
    mt = hf_config.get("model_type", "llama")
    if mt == "mixtral":
        from aqlm_tpu.models.mixtral import MixtralConfig

        cfg = MixtralConfig(
            vocab_size=hf_config["vocab_size"],
            hidden_size=hf_config["hidden_size"],
            intermediate_size=hf_config["intermediate_size"],
            num_layers=hf_config["num_hidden_layers"],
            num_heads=hf_config["num_attention_heads"],
            num_kv_heads=hf_config.get("num_key_value_heads", hf_config["num_attention_heads"]),
            rope_theta=hf_config.get("rope_theta", 1e6),
            rms_eps=hf_config.get("rms_norm_eps", 1e-5),
            max_position_embeddings=hf_config.get("max_position_embeddings", 32768),
            num_experts=hf_config.get("num_local_experts", 8),
            num_experts_per_tok=hf_config.get("num_experts_per_tok", 2),
        )
    else:
        cfg = model_config_from_hf(hf_config)
    sd = _load_state_dict(path)

    def arr(key, dt=dtype):
        return jnp.asarray(np.asarray(sd[key], np.float32), dt)

    def read_lin(base):
        """Quantized (codes/codebooks/scales) or dense (not-to-quantize) linear."""
        if f"{base}.codes" in sd:
            codes = unpack_codes(np.asarray(sd[f"{base}.codes"]), scheme.nbits_per_codebook)
            # [OG, 1, 1, 1] -> [OG] per-channel; [OG, IG, 1, 1] -> [OG, IG]
            scales = np.asarray(sd[f"{base}.scales"], np.float32)
            scales = scales.reshape(scales.shape[0], -1)
            scales = scales[:, 0] if scales.shape[1] == 1 else scales
            w = AqlmWeight(
                codes=jnp.asarray(codes),
                codebooks=arr(f"{base}.codebooks", jnp.float32),
                scales=jnp.asarray(scales),
                bias=arr(f"{base}.bias") if f"{base}.bias" in sd else None,
                scheme=scheme,
            )
            return QuantizedLinear.from_aqlm(w, mode=mode)
        if f"{base}.weight" in sd:  # in linear_weights_not_to_quantize
            return DenseLinear(
                weight=arr(f"{base}.weight"),
                bias=arr(f"{base}.bias") if f"{base}.bias" in sd else None,
            )
        raise KeyError(f"missing tensors for {base}")

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "final_norm": arr("model.norm.weight"),
        "lm_head": None
        if cfg.tie_embeddings or "lm_head.weight" not in sd
        else DenseLinear(weight=arr("lm_head.weight"), bias=None),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layer = {
            "input_norm": arr(f"{p}.input_layernorm.weight"),
            "post_attn_norm": arr(f"{p}.post_attention_layernorm.weight"),
        }
        if mt == "mixtral":
            # published Mixtral AQLM checkpoints (e.g. ISTA-DASLab
            # Mixtral-8x7b-AQLM-2Bit-1x16) quantize attention + expert
            # w1/w2/w3; the router gate stays dense
            for ours, hf in list(_PROJ_MAP.items())[:4]:  # q/k/v/o
                layer[ours] = read_lin(f"{p}.{hf}")
            layer["moe_gate"] = read_lin(f"{p}.block_sparse_moe.gate")
            for e in range(cfg.num_experts):
                ep = f"{p}.block_sparse_moe.experts.{e}"
                layer[f"experts.{e}.gate_proj"] = read_lin(f"{ep}.w1")
                layer[f"experts.{e}.down_proj"] = read_lin(f"{ep}.w2")
                layer[f"experts.{e}.up_proj"] = read_lin(f"{ep}.w3")
        else:
            for ours, hf in _PROJ_MAP.items():
                layer[ours] = read_lin(f"{p}.{hf}")
        params["layers"].append(layer)
    return params, cfg, scheme


def load_hf_dense_checkpoint(path: str, *, dtype=jnp.float32) -> tuple[dict, ModelConfig]:
    """Load an UNquantized HF llama-family checkpoint into dense params.

    The input side of the quantization pipeline (the reference's get_model,
    /root/reference/src/modelutils.py:48-114). phi3-style checkpoints store
    fused `qkv_proj` / `gate_up_proj`; those are split into our per-projection
    layout on load (the reference quantizes them fused; splitting is exact
    and quantizes each part independently — at worst equal quality).
    """
    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    cfg = model_config_from_hf(hf_config)
    sd = _load_state_dict(path)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], np.float32), dtype)

    def lin(base):
        return DenseLinear(
            weight=arr(f"{base}.weight"),
            bias=arr(f"{base}.bias") if f"{base}.bias" in sd else None,
        )

    d = cfg.dim_per_head
    nq, nkv = cfg.num_heads * d, cfg.num_kv_heads * d

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "final_norm": arr("model.norm.weight"),
        "lm_head": None if cfg.tie_embeddings or "lm_head.weight" not in sd else lin("lm_head"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layer = {
            "input_norm": arr(f"{p}.input_layernorm.weight"),
            "post_attn_norm": arr(f"{p}.post_attention_layernorm.weight"),
        }
        if f"{p}.self_attn.qkv_proj.weight" in sd:  # phi3-style fused qkv
            qkv = arr(f"{p}.self_attn.qkv_proj.weight")
            layer["q_proj"] = DenseLinear(weight=qkv[:nq], bias=None)
            layer["k_proj"] = DenseLinear(weight=qkv[nq : nq + nkv], bias=None)
            layer["v_proj"] = DenseLinear(weight=qkv[nq + nkv :], bias=None)
            layer["o_proj"] = lin(f"{p}.self_attn.o_proj")
            gu = arr(f"{p}.mlp.gate_up_proj.weight")
            half = gu.shape[0] // 2
            layer["gate_proj"] = DenseLinear(weight=gu[:half], bias=None)
            layer["up_proj"] = DenseLinear(weight=gu[half:], bias=None)
            layer["down_proj"] = lin(f"{p}.mlp.down_proj")
        else:
            for ours, hf in _PROJ_MAP.items():
                layer[ours] = lin(f"{p}.{hf}")
        params["layers"].append(layer)
    return params, cfg


def export_hf_aqlm_state_dict(params: dict, cfg: ModelConfig) -> tuple[dict, dict]:
    """params pytree -> (HF state dict of np arrays, quantization_config).

    Inverse of load_hf_aqlm_checkpoint; codes re-packed to signed storage so
    the result matches what convert_to_hf.py produces.
    """
    sd = {}
    not_quantized = ["model.embed_tokens.weight", "model.norm.weight", "lm_head.weight"]
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float16)
    sd["model.norm.weight"] = np.asarray(params["final_norm"], np.float16)
    if params.get("lm_head") is not None:
        sd["lm_head.weight"] = np.asarray(params["lm_head"].weight, np.float16)

    scheme = None
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.asarray(layer["input_norm"], np.float16)
        sd[f"{p}.post_attention_layernorm.weight"] = np.asarray(layer["post_attn_norm"], np.float16)
        not_quantized += [f"{p}.input_layernorm.weight", f"{p}.post_attention_layernorm.weight"]
        pairs = list(_PROJ_MAP.items())
        if "moe_gate" in layer:  # mixtral: expert w1/w2/w3 + dense router
            pairs = pairs[:4]  # q/k/v/o
            pairs.append(("moe_gate", "block_sparse_moe.gate"))
            e = 0
            while f"experts.{e}.gate_proj" in layer:
                ep = f"block_sparse_moe.experts.{e}"
                pairs += [
                    (f"experts.{e}.gate_proj", f"{ep}.w1"),
                    (f"experts.{e}.down_proj", f"{ep}.w2"),
                    (f"experts.{e}.up_proj", f"{ep}.w3"),
                ]
                e += 1
        for ours, hf in pairs:
            base = f"{p}.{hf}"
            lin = layer.get(ours)
            if isinstance(lin, QuantizedLinear):
                assert lin.mode == "reference", "export from the canonical (reference) layout"
                scheme = lin.scheme
                sd[f"{base}.codes"] = pack_codes(np.asarray(lin.codes), scheme.nbits_per_codebook)
                sd[f"{base}.codebooks"] = np.asarray(lin.codebooks, np.float16)
                scales = np.asarray(lin.scales, np.float16)
                # hub layout: [OG, 1, 1, 1] per-channel (convert_to_hf.py);
                # per-group [OG, IG] scales keep their structure as
                # [OG, IG, 1, 1] (a compatible extension — reference
                # checkpoints always have shape[1] == 1)
                sd[f"{base}.scales"] = (
                    scales.reshape(-1, 1, 1, 1) if scales.ndim == 1
                    else scales.reshape(*scales.shape, 1, 1)
                )
                if lin.bias is not None:
                    sd[f"{base}.bias"] = np.asarray(lin.bias, np.float16)
            elif isinstance(lin, DenseLinear):
                sd[f"{base}.weight"] = np.asarray(lin.weight, np.float16)
                not_quantized.append(f"{base}.weight")
    qcfg = None
    if scheme is not None:
        qcfg = {
            "quant_method": "aqlm",
            "nbits_per_codebook": scheme.nbits_per_codebook,
            "num_codebooks": scheme.num_codebooks,
            "out_group_size": scheme.out_group_size,
            "in_group_size": scheme.in_group_size,
            "linear_weights_not_to_quantize": not_quantized,
        }
    return sd, qcfg


# ---------------------------------------------------------------------------
# falcon / opt importers (parallel-attention families)
# ---------------------------------------------------------------------------


def load_hf_falcon_checkpoint(path: str, *, dtype=jnp.float32):
    """Import an HF falcon checkpoint (falcon-7b layout: parallel_attn, one
    input_layernorm, fused query_key_value) into falcon.py params.

    The fused query_key_value rows are ordered [q heads..., k, v] per HF
    FalconAttention._split_heads (MQA); splitting them is exact (reference
    quantizes the fused projection, modelutils.py:159-176 — split parts are
    quantized independently here, at worst equal quality)."""
    import json as _json
    import os as _os

    from aqlm_tpu.models.falcon import FalconConfig

    with open(_os.path.join(path, "config.json")) as f:
        hc = _json.load(f)
    assert hc.get("model_type") == "falcon", hc.get("model_type")
    assert not hc.get("new_decoder_architecture", False), (
        "new_decoder_architecture (falcon-40b+) fused-QKV grouping not supported yet"
    )
    assert hc.get("multi_query", True), "per-head-interleaved QKV (multi_query=False) unsupported"
    assert not hc.get("alibi", False), "alibi falcon variants unsupported (rope only)"
    cfg = FalconConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc.get("ffn_hidden_size", 4 * hc["hidden_size"]),
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        # multi_query=True means ONE shared kv head regardless of the
        # config's num_kv_heads field (HF writes num_attention_heads there)
        num_kv_heads=1,
        rope_theta=hc.get("rope_theta", 10000.0),
        max_position_embeddings=hc.get("max_position_embeddings", 2048),
        ln_eps=hc.get("layer_norm_epsilon", 1e-5),
    )
    sd = _load_state_dict(path)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], np.float32), dtype)

    d = cfg.dim_per_head
    nq = cfg.num_heads * d
    nkv = cfg.num_kv_heads * d
    embed_w = arr("transformer.word_embeddings.weight")
    params = {
        "embed": embed_w,
        "final_norm": arr("transformer.ln_f.weight"),
        "final_norm_bias": arr("transformer.ln_f.bias"),
        "lm_head": DenseLinear(
            weight=arr("lm_head.weight") if "lm_head.weight" in sd else embed_w,
            bias=None,
        ),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}"
        qkv = arr(f"{p}.self_attention.query_key_value.weight")
        params["layers"].append(
            dict(
                input_norm=arr(f"{p}.input_layernorm.weight"),
                input_norm_bias=arr(f"{p}.input_layernorm.bias"),
                q_proj=DenseLinear(weight=qkv[:nq], bias=None),
                k_proj=DenseLinear(weight=qkv[nq : nq + nkv], bias=None),
                v_proj=DenseLinear(weight=qkv[nq + nkv :], bias=None),
                o_proj=DenseLinear(weight=arr(f"{p}.self_attention.dense.weight"), bias=None),
                fc1=DenseLinear(weight=arr(f"{p}.mlp.dense_h_to_4h.weight"), bias=None),
                fc2=DenseLinear(weight=arr(f"{p}.mlp.dense_4h_to_h.weight"), bias=None),
            )
        )
    return params, cfg


def load_hf_opt_checkpoint(path: str, *, dtype=jnp.float32):
    """Import an HF OPT checkpoint into opt.py params (pre-norm models)."""
    import json as _json
    import os as _os

    from aqlm_tpu.models.opt import OptConfig

    with open(_os.path.join(path, "config.json")) as f:
        hc = _json.load(f)
    assert hc.get("model_type") == "opt", hc.get("model_type")
    assert hc.get("do_layer_norm_before", True), "post-norm OPT-350m layout unsupported"
    assert hc.get("word_embed_proj_dim", hc["hidden_size"]) == hc["hidden_size"], (
        "project_in/out (opt-350m) unsupported"
    )
    cfg = OptConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["ffn_dim"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc["num_attention_heads"],
        max_position_embeddings=hc["max_position_embeddings"],
    )
    sd = _load_state_dict(path)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], np.float32), dtype)

    def lin(base):
        bias = f"{base}.bias"
        return DenseLinear(
            weight=arr(f"{base}.weight"),
            bias=arr(bias) if bias in sd else None,
        )

    embed = arr("model.decoder.embed_tokens.weight")
    params = {
        "embed": embed,
        "pos_embed": arr("model.decoder.embed_positions.weight"),
        "final_norm": arr("model.decoder.final_layer_norm.weight"),
        "final_norm_bias": arr("model.decoder.final_layer_norm.bias"),
        "lm_head": DenseLinear(
            weight=arr("lm_head.weight") if "lm_head.weight" in sd else embed, bias=None
        ),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.decoder.layers.{i}"
        params["layers"].append(
            dict(
                attn_norm=arr(f"{p}.self_attn_layer_norm.weight"),
                attn_norm_bias=arr(f"{p}.self_attn_layer_norm.bias"),
                q_proj=lin(f"{p}.self_attn.q_proj"),
                k_proj=lin(f"{p}.self_attn.k_proj"),
                v_proj=lin(f"{p}.self_attn.v_proj"),
                out_proj=lin(f"{p}.self_attn.out_proj"),
                mlp_norm=arr(f"{p}.final_layer_norm.weight"),
                mlp_norm_bias=arr(f"{p}.final_layer_norm.bias"),
                fc1=lin(f"{p}.fc1"),
                fc2=lin(f"{p}.fc2"),
            )
        )
    return params, cfg


def load_hf_cohere_checkpoint(path: str, *, dtype=jnp.float32):
    """Import an HF cohere (Command-R) checkpoint into cohere.py params.

    Cohere is in the reference's LLAMA_LIKE dispatch set
    (/root/reference/src/modelutils.py:17) with llama-shaped projections;
    the parallel block / interleaved rope / logit_scale live in
    models/cohere.py. lm_head is tied to the embedding."""
    import json as _json
    import os as _os

    from aqlm_tpu.models.cohere import CohereConfig

    with open(_os.path.join(path, "config.json")) as f:
        hc = _json.load(f)
    assert hc.get("model_type") == "cohere", hc.get("model_type")
    cfg = CohereConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["intermediate_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        rope_theta=hc.get("rope_theta", 10000.0),
        max_position_embeddings=hc.get("max_position_embeddings", 8192),
        ln_eps=hc.get("layer_norm_eps", 1e-5),
        logit_scale=hc.get("logit_scale", 1.0),
        use_qk_norm=hc.get("use_qk_norm", False),
    )
    sd = _load_state_dict(path)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], np.float32), dtype)

    def lin(prefix):
        return DenseLinear(weight=arr(f"{prefix}.weight"), bias=None)

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "final_norm": arr("model.norm.weight"),
        "layers": [],
    }
    d = cfg.dim_per_head
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layer = dict(
            input_norm=arr(f"{p}.input_layernorm.weight"),
            q_proj=lin(f"{p}.self_attn.q_proj"),
            k_proj=lin(f"{p}.self_attn.k_proj"),
            v_proj=lin(f"{p}.self_attn.v_proj"),
            o_proj=lin(f"{p}.self_attn.o_proj"),
            gate_proj=lin(f"{p}.mlp.gate_proj"),
            up_proj=lin(f"{p}.mlp.up_proj"),
            down_proj=lin(f"{p}.mlp.down_proj"),
        )
        if cfg.use_qk_norm:
            layer["q_norm"] = arr(f"{p}.self_attn.q_norm.weight").reshape(cfg.num_heads, d)
            layer["k_norm"] = arr(f"{p}.self_attn.k_norm.weight").reshape(cfg.num_kv_heads, d)
        params["layers"].append(layer)
    return params, cfg


def load_hf_mixtral_checkpoint(path: str, *, dtype=jnp.float32):
    """Import an HF Mixtral checkpoint into mixtral.py params.

    The reference quantizes Mixtral through its hub model + per-expert
    sequential groups (/root/reference/main.py:232-264 handles
    block_sparse_moe.experts.*); here the expert projections land in the
    flat `experts.{e}.{gate,up,down}_proj` layout that the generic pipeline
    and the stacked-expert serving kernels consume. HF naming: w1=gate,
    w2=down, w3=up."""
    import json as _json
    import os as _os

    from aqlm_tpu.models.mixtral import MixtralConfig

    with open(_os.path.join(path, "config.json")) as f:
        hc = _json.load(f)
    assert hc.get("model_type") == "mixtral", hc.get("model_type")
    cfg = MixtralConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["intermediate_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        rope_theta=hc.get("rope_theta", 1e6),
        rms_eps=hc.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hc.get("max_position_embeddings", 32768),
        num_experts=hc.get("num_local_experts", 8),
        num_experts_per_tok=hc.get("num_experts_per_tok", 2),
    )
    sd = _load_state_dict(path)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], np.float32), dtype)

    def lin(prefix):
        return DenseLinear(weight=arr(f"{prefix}.weight"), bias=None)

    params = {
        "embed": arr("model.embed_tokens.weight"),
        "final_norm": arr("model.norm.weight"),
        "lm_head": lin("lm_head") if "lm_head.weight" in sd else None,
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        layer = dict(
            input_norm=arr(f"{p}.input_layernorm.weight"),
            post_attn_norm=arr(f"{p}.post_attention_layernorm.weight"),
            q_proj=lin(f"{p}.self_attn.q_proj"),
            k_proj=lin(f"{p}.self_attn.k_proj"),
            v_proj=lin(f"{p}.self_attn.v_proj"),
            o_proj=lin(f"{p}.self_attn.o_proj"),
            moe_gate=lin(f"{p}.block_sparse_moe.gate"),
        )
        for e in range(cfg.num_experts):
            ep = f"{p}.block_sparse_moe.experts.{e}"
            layer[f"experts.{e}.gate_proj"] = lin(f"{ep}.w1")
            layer[f"experts.{e}.down_proj"] = lin(f"{ep}.w2")
            layer[f"experts.{e}.up_proj"] = lin(f"{ep}.w3")
        params["layers"].append(layer)
    return params, cfg
