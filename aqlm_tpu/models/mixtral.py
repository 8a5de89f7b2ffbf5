"""Mixtral-style sparse-MoE causal LM in pure JAX.

Covers the reference's Mixtral support: quantized expert FFNs with the router
("gate") kept dense — the reference explicitly skips `.gate` sublayers when
quantizing mixtral (/root/reference/main.py:232-238) — and top-k softmax
routing with renormalization (HF Mixtral semantics).

TPU-first choice: experts run DENSELY (every expert computes every token,
combined with the routing weights, zeros for unrouted tokens). For the
decode/small-batch regime this is the standard TPU MoE pattern: with the
expert axis sharded over the mesh ("expert parallelism"), each device runs
its experts over all tokens with zero dynamic shapes, no sort/dispatch, and
collectives only at the combine (psum). The XTX taps are routing-masked so
calibration statistics match the reference's dispatched-tokens semantics.

Layer params are a FLAT dict (attention projections + `moe_gate` +
`experts.{e}.{gate,up,down}_proj`) so the generic quantization pipeline
treats every DenseLinear uniformly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.models import llama
from aqlm_tpu.models.common import (
    DenseLinear,
    apply_linear,
    attention,
    make_causal_mask,
    rms_norm,
    rope,
)

__all__ = ["MixtralConfig", "init_random_params", "forward", "block_forward_with_taps", "QUANTIZABLE_PROJS"]

ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj")
EXPERT_PROJS = ("gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass(frozen=True)
class MixtralConfig(llama.ModelConfig):
    num_experts: int = 8
    num_experts_per_tok: int = 2

    @classmethod
    def mixtral_8x7b(cls) -> "MixtralConfig":
        return cls(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, rope_theta=1e6,
            max_position_embeddings=32768, num_experts=8, num_experts_per_tok=2,
        )

    @classmethod
    def tiny_moe(cls, **kw) -> "MixtralConfig":
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=96, num_layers=2,
            num_heads=4, num_kv_heads=2, max_position_embeddings=128,
            num_experts=4, num_experts_per_tok=2,
        )
        defaults.update(kw)
        return cls(**defaults)


def quantizable_proj_names(cfg: MixtralConfig):
    names = list(ATTN_PROJS)
    for e in range(cfg.num_experts):
        names += [f"experts.{e}.{p}" for p in EXPERT_PROJS]
    return tuple(names)


QUANTIZABLE_PROJS = None  # depends on num_experts; use quantizable_proj_names(cfg)


def init_random_params(key, cfg: MixtralConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    h, d, i = cfg.hidden_size, cfg.dim_per_head, cfg.intermediate_size

    def dense(k, out_f, in_f):
        w = jax.random.normal(k, (out_f, in_f), jnp.float32) * in_f ** -0.5
        return DenseLinear(weight=w.astype(dtype), bias=None)

    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(keys[li], 5 + 3 * cfg.num_experts)
        layer = {
            "input_norm": jnp.ones((h,), dtype),
            "q_proj": dense(ks[0], cfg.num_heads * d, h),
            "k_proj": dense(ks[1], cfg.num_kv_heads * d, h),
            "v_proj": dense(ks[2], cfg.num_kv_heads * d, h),
            "o_proj": dense(ks[3], h, cfg.num_heads * d),
            "post_attn_norm": jnp.ones((h,), dtype),
            "moe_gate": dense(ks[4], cfg.num_experts, h),
        }
        for e in range(cfg.num_experts):
            layer[f"experts.{e}.gate_proj"] = dense(ks[5 + 3 * e], i, h)
            layer[f"experts.{e}.up_proj"] = dense(ks[6 + 3 * e], i, h)
            layer[f"experts.{e}.down_proj"] = dense(ks[7 + 3 * e], h, i)
        layers.append(layer)

    embed = jax.random.normal(keys[-2], (cfg.vocab_size, h), jnp.float32) * 0.02
    return {
        "embed": embed.astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": dense(keys[-1], cfg.vocab_size, h),
    }


def _routing(xn: jax.Array, layer: dict, cfg: MixtralConfig):
    """Top-k softmax routing with renormalization (HF Mixtral semantics).
    Returns per-expert combine weights [B, T, E] (zero for unrouted)."""
    logits = apply_linear(xn, layer["moe_gate"]).astype(jnp.float32)  # [B, T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, _ = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    threshold = top_vals[..., -1:]
    mask = probs >= threshold
    weights = jnp.where(mask, probs, 0.0)
    weights = weights / jnp.maximum(weights.sum(-1, keepdims=True), 1e-9)
    return weights


def _moe_mlp(xn: jax.Array, layer: dict, cfg: MixtralConfig, taps: dict | None = None):
    weights = _routing(xn, layer, cfg)  # [B, T, E]
    out = jnp.zeros_like(xn)
    for e in range(cfg.num_experts):
        w_e = weights[..., e].astype(xn.dtype)[..., None]  # [B, T, 1]
        routed = (weights[..., e] > 0).astype(xn.dtype)[..., None]
        if taps is not None:
            # calibration statistics must only see tokens routed to this
            # expert (masked tap -> masked XTX, matching the reference's
            # dispatched-inputs capture)
            taps[f"experts.{e}.gate_proj"] = xn * routed
            taps[f"experts.{e}.up_proj"] = xn * routed
        gate = apply_linear(xn, layer[f"experts.{e}.gate_proj"])
        up = apply_linear(xn, layer[f"experts.{e}.up_proj"])
        mlp_in = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        if taps is not None:
            taps[f"experts.{e}.down_proj"] = mlp_in * routed
        out = out + w_e * apply_linear(mlp_in, layer[f"experts.{e}.down_proj"])
    return out


@dataclasses.dataclass
class StackedInt8Experts:
    """All experts of one projection as a single [E, OUT, IN_padded] int8
    array + per-(expert, out) scale — the operand of
    ops.int8_matmul.int8_moe_matmul (one kernel launch for all experts)."""

    w8: jax.Array
    scale: jax.Array


jax.tree_util.register_dataclass(
    StackedInt8Experts, data_fields=["w8", "scale"], meta_fields=[]
)


@dataclasses.dataclass
class StackedCodesExperts:
    """All experts of one projection in the codes-resident (Kx8 LUT-GEMV)
    layout: codes_tl [E, NT, K*IG, tn] uint8 tiles, codebooks [E, K, S, g],
    scales [E, OUT] — the operand of ops.lut_gemv.lut_moe_gemv_kx8 (decode)
    and, per expert, gather_prefill.gather_prefill_matmul (prefill)."""

    codes_tl: jax.Array
    codebooks: jax.Array
    scales: jax.Array
    group: int  # in_group_size (static)
    num_codebooks: int  # static

jax.tree_util.register_dataclass(
    StackedCodesExperts,
    data_fields=["codes_tl", "codebooks", "scales"],
    meta_fields=["group", "num_codebooks"],
)


@dataclasses.dataclass
class StackedInt4Experts:
    """All experts of one projection in the W4A16 layout: w4
    [E, OUT, INpad/2] packed nibbles + gscale [E, INpad/G, OUT] — the
    operand of ops.int4_matmul.int4_moe_matmul."""

    w4: jax.Array
    gscale: jax.Array


jax.tree_util.register_dataclass(
    StackedInt4Experts, data_fields=["w4", "gscale"], meta_fields=[]
)


def stack_experts(layer: dict, cfg: MixtralConfig) -> dict:
    """Stack per-expert FFN weights into [E, ...] arrays.

    The expert-parallel serving form: with the E axis sharded over the mesh's
    "model" axis, each device computes its experts over all tokens (static
    shapes, no dispatch) and the combine is one psum — the TPU-idiomatic MoE
    layout. Returns a layer dict with `experts_gate/up/down` replacing the
    per-expert keys: [E, OUT, IN] dense arrays for dense experts, or
    StackedInt8Experts for int8-mode QuantizedLinear experts (served through
    int8_moe_matmul instead of a per-expert python loop)."""
    from aqlm_tpu.ops.runtime import QuantizedLinear

    out = {k: v for k, v in layer.items() if not k.startswith("experts.")}
    for proj in EXPERT_PROJS:
        ws = [layer[f"experts.{e}.{proj}"] for e in range(cfg.num_experts)]
        if all(isinstance(w, DenseLinear) for w in ws):
            out[f"experts_{proj}"] = jnp.stack([w.weight for w in ws])
        elif all(isinstance(w, QuantizedLinear) and w.mode == "int8" for w in ws):
            assert all(w.bias is None for w in ws), "expert biases unsupported"
            out[f"experts_{proj}"] = StackedInt8Experts(
                w8=jnp.stack([w.w8 for w in ws]),
                scale=jnp.stack([w.w8_scale for w in ws]),
            )
        elif all(isinstance(w, QuantizedLinear) and w.mode == "int4" for w in ws):
            assert all(w.bias is None for w in ws), "expert biases unsupported"
            out[f"experts_{proj}"] = StackedInt4Experts(
                w4=jnp.stack([w.w4 for w in ws]),
                gscale=jnp.stack([w.w4_gscale for w in ws]),
            )
        elif all(
            isinstance(w, QuantizedLinear) and w.mode == "codes"
            and w.scheme.nbits_per_codebook <= 8
            for w in ws
        ):
            from aqlm_tpu.ops.lut_gemv import tile_codes

            assert all(w.bias is None for w in ws), "expert biases unsupported"
            sch = ws[0].scheme
            tls = [w.codes_tl if w.codes_tl is not None else tile_codes(w.codes_t)
                   for w in ws]
            out[f"experts_{proj}"] = StackedCodesExperts(
                codes_tl=jnp.stack(tls),
                codebooks=jnp.stack([w.codebooks for w in ws]),
                scales=jnp.stack([w.scales for w in ws]),
                group=sch.in_group_size,
                num_codebooks=sch.num_codebooks,
            )
        else:
            raise NotImplementedError(
                "stack_experts supports dense, int8-mode, or Kx8 codes-mode "
                "experts; transcode 1x16 experts to 2x8 or int8 for stacked "
                "serving (S=65536 tables don't fit the LUT kernel's VMEM)"
            )
    return out


def _moe_codes_ffn(flat, gate_q: StackedCodesExperts, up_q, down_q):
    """Codes-resident stacked-expert FFN on flattened tokens [N, H].

    Decode (N <= LUT_GEMV_MAX_BATCH): one lut_moe_gemv_kx8 launch per
    projection. Prefill: per-expert gather-dequant MXU matmuls (the LUT cost
    is per-token; the dequantized tile amortizes over many tokens)."""
    from aqlm_tpu.ops.gather_prefill import gather_prefill_matmul
    from aqlm_tpu.ops.lut_gemv import LUT_GEMV_MAX_BATCH, lut_moe_gemv_kx8

    n = flat.shape[0]
    if n <= LUT_GEMV_MAX_BATCH:
        gate = lut_moe_gemv_kx8(flat, gate_q.codes_tl, gate_q.codebooks,
                                gate_q.scales, group=gate_q.group)  # [E, N, I]
        up = lut_moe_gemv_kx8(flat, up_q.codes_tl, up_q.codebooks,
                              up_q.scales, group=up_q.group)
        act = jax.nn.silu(gate).astype(jnp.float32) * up
        # each expert's down-proj consumes ITS OWN activations ([E, N, I])
        return lut_moe_gemv_kx8(act.astype(flat.dtype), down_q.codes_tl,
                                down_q.codebooks, down_q.scales,
                                group=down_q.group)
    # prefill: loop experts through the gather-dequant MXU kernel (reads
    # each expert's tiled codes in place — no untile, no one-hot compares)
    E = gate_q.codes_tl.shape[0]
    outs = []
    for e in range(E):
        def proj(q, v):
            return gather_prefill_matmul(v, q.codes_tl[e], q.codebooks[e],
                                         q.scales[e], group=q.group)
        gate = proj(gate_q, flat)
        up = proj(up_q, flat)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        outs.append(proj(down_q, act))
    return jnp.stack(outs).astype(jnp.float32)


def moe_mlp_stacked(xn: jax.Array, layer: dict, cfg: MixtralConfig) -> jax.Array:
    """MoE FFN as single all-expert contractions over the stacked E axis."""
    weights = _routing(xn, layer, cfg).astype(xn.dtype)  # [B, T, E]
    gate_w = layer["experts_gate_proj"]
    if isinstance(gate_w, StackedCodesExperts):
        b, t, h = xn.shape
        out = _moe_codes_ffn(
            xn.reshape(b * t, h), gate_w,
            layer["experts_up_proj"], layer["experts_down_proj"],
        )  # [E, N, H]
        out = out.reshape(-1, b, t, h)
        return jnp.einsum("ebth,bte->bth", out.astype(xn.dtype), weights)
    if isinstance(gate_w, StackedInt8Experts):
        from aqlm_tpu.ops.int8_matmul import int8_moe_matmul

        b, t, h = xn.shape
        flat = xn.reshape(b * t, h)
        gate = int8_moe_matmul(flat, gate_w.w8, gate_w.scale)        # [E, N, I]
        upq = layer["experts_up_proj"]
        up = int8_moe_matmul(flat, upq.w8, upq.scale)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        dq = layer["experts_down_proj"]
        down = int8_moe_matmul(act, dq.w8, dq.scale)                 # [E, N, H]
        down = down.reshape(-1, b, t, h)
        return jnp.einsum("ebth,bte->bth", down.astype(xn.dtype), weights)
    if isinstance(gate_w, StackedInt4Experts):
        from aqlm_tpu.ops.int4_matmul import int4_moe_matmul

        b, t, h = xn.shape
        flat = xn.reshape(b * t, h)
        gate = int4_moe_matmul(flat, gate_w.w4, gate_w.gscale)       # [E, N, I]
        upq = layer["experts_up_proj"]
        up = int4_moe_matmul(flat, upq.w4, upq.gscale)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        dq = layer["experts_down_proj"]
        down = int4_moe_matmul(act, dq.w4, dq.gscale)                # [E, N, H]
        down = down.reshape(-1, b, t, h)
        return jnp.einsum("ebth,bte->bth", down.astype(xn.dtype), weights)
    up_w = layer["experts_up_proj"]
    down_w = layer["experts_down_proj"]  # [E, H, I]
    gate = jnp.einsum("bth,eih->btei", xn, gate_w.astype(xn.dtype))
    up = jnp.einsum("bth,eih->btei", xn, up_w.astype(xn.dtype))
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    act = act * weights[..., None]  # fold combine weights in before down-proj
    return jnp.einsum("btei,ehi->bth", act, down_w.astype(xn.dtype))


def moe_mlp_stacked_indexed(
    xn, layer, stacked_layers, idx, cfg: MixtralConfig, expert_offset=None
):
    """Scan-over-layers MoE FFN: all experts of layer `idx` in one kernel.

    `layer` is the scan-sliced per-layer dict (supplies moe_gate for
    routing); `stacked_layers` holds [L, E, ...] StackedInt8Experts or
    StackedCodesExperts accessed via scalar-prefetch layer indexing (a
    scan-xs slice would copy all experts' weights to HBM each step).

    expert_parallel: with `expert_offset` given (a traced scalar), the
    stacked operands hold only a LOCAL expert shard; routing still runs over
    all num_experts (moe_gate is replicated) and the combine uses the
    matching weight slice — the caller psums the partial outputs over the
    expert/model axis (serve/tp.py)."""
    weights = _routing(xn, layer, cfg).astype(xn.dtype)  # [B, T, E_total]
    if expert_offset is not None:
        e_local = jax.tree.leaves(stacked_layers["experts_gate_proj"])[0].shape[1]
        weights = jax.lax.dynamic_slice_in_dim(weights, expert_offset, e_local, axis=2)
    b, t, h = xn.shape
    flat = xn.reshape(b * t, h)
    gw = stacked_layers["experts_gate_proj"]
    uw = stacked_layers["experts_up_proj"]
    dw = stacked_layers["experts_down_proj"]
    if isinstance(gw, StackedCodesExperts):
        from aqlm_tpu.ops.lut_gemv import lut_moe_gemv_kx8_indexed

        gate = lut_moe_gemv_kx8_indexed(flat, gw.codes_tl, gw.codebooks,
                                        gw.scales, idx, group=gw.group)
        up = lut_moe_gemv_kx8_indexed(flat, uw.codes_tl, uw.codebooks,
                                      uw.scales, idx, group=uw.group)
        act = jax.nn.silu(gate).astype(jnp.float32) * up
        down = lut_moe_gemv_kx8_indexed(act.astype(flat.dtype), dw.codes_tl,
                                        dw.codebooks, dw.scales, idx,
                                        group=dw.group)  # [E, N, H]
    elif isinstance(gw, StackedInt8Experts):
        from aqlm_tpu.ops.int8_matmul import int8_moe_matmul_indexed

        gate = int8_moe_matmul_indexed(flat, gw.w8, gw.scale, idx)  # [E, N, I]
        up = int8_moe_matmul_indexed(flat, uw.w8, uw.scale, idx)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        down = int8_moe_matmul_indexed(act, dw.w8, dw.scale, idx)  # [E, N, H]
    elif isinstance(gw, StackedInt4Experts):
        from aqlm_tpu.ops.int4_matmul import int4_moe_matmul_indexed

        gate = int4_moe_matmul_indexed(flat, gw.w4, gw.gscale, idx)  # [E, N, I]
        up = int4_moe_matmul_indexed(flat, uw.w4, uw.gscale, idx)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        down = int4_moe_matmul_indexed(act, dw.w4, dw.gscale, idx)  # [E, N, H]
    else:  # dense stacked experts [L, E, OUT, IN]
        g_l, u_l, d_l = gw[idx], uw[idx], dw[idx]
        gate = jnp.einsum("nh,eih->eni", flat, g_l.astype(flat.dtype))
        up = jnp.einsum("nh,eih->eni", flat, u_l.astype(flat.dtype))
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        down = jnp.einsum("eni,ehi->enh", act, d_l.astype(act.dtype))  # [E, N, H]
    down = down.reshape(-1, b, t, h)
    return jnp.einsum("ebth,bte->bth", down.astype(xn.dtype), weights)


def block_forward_with_taps(x, layer, cfg: MixtralConfig, positions):
    """Mixtral block with calibration taps (pipeline contract, cf.
    llama.block_forward_with_taps)."""
    b, t, h = x.shape
    d = cfg.dim_per_head
    taps = {}
    res = x
    xn = rms_norm(x, layer["input_norm"], cfg.rms_eps)
    taps["q_proj"] = taps["k_proj"] = taps["v_proj"] = xn
    q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)
    attn = attention(
        q, k, v, make_causal_mask(positions, positions, window=cfg.sliding_window)
    ).reshape(b, t, -1)
    taps["o_proj"] = attn
    x = res + apply_linear(attn, layer["o_proj"])

    res = x
    xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps)
    x = res + _moe_mlp(xn, layer, cfg, taps)
    return x, taps


def forward(
    params: dict,
    cfg: MixtralConfig,
    input_ids: jax.Array,
    *,
    positions: jax.Array | None = None,
    kv_caches: list | None = None,
    cache_offset: jax.Array | None = None,
):
    """Causal LM forward (matches llama.forward's contract)."""
    b, t = input_ids.shape
    if positions is None:
        base = cache_offset if cache_offset is not None else 0
        positions = jnp.asarray(base) + jnp.arange(t)[None, :]
    positions = jnp.broadcast_to(positions, (b, t))

    x = jnp.take(params["embed"], input_ids, axis=0)
    d = cfg.dim_per_head

    kv_len_mask = None
    if kv_caches is not None:
        max_len = kv_caches[0][0].shape[1]
        key_pos = jnp.broadcast_to(jnp.arange(max_len)[None, :], (b, max_len))
        kv_len_mask = make_causal_mask(positions, key_pos, window=cfg.sliding_window)

    new_caches = []
    for li, layer in enumerate(params["layers"]):
        res = x
        xn = rms_norm(x, layer["input_norm"], cfg.rms_eps)
        q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
        k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
        v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
        q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)
        if kv_caches is not None:
            k_c, v_c = kv_caches[li]
            k_c = jax.lax.dynamic_update_slice_in_dim(k_c, k.astype(k_c.dtype), cache_offset, axis=1)
            v_c = jax.lax.dynamic_update_slice_in_dim(v_c, v.astype(v_c.dtype), cache_offset, axis=1)
            attn = attention(q, k_c.astype(q.dtype), v_c.astype(q.dtype), kv_len_mask)
            new_caches.append((k_c, v_c))
        else:
            attn = attention(
                q, k, v, make_causal_mask(positions, positions, window=cfg.sliding_window)
            )
        x = res + apply_linear(attn.reshape(b, t, -1), layer["o_proj"])
        res = x
        xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps)
        x = res + _moe_mlp(xn, layer, cfg)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = apply_linear(x, params["lm_head"])
    return logits, (new_caches if kv_caches is not None else None)
