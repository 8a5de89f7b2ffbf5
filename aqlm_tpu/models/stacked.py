"""Scan-over-layers model execution + quantizable KV cache — the serving form.

The list-of-layers `llama.forward` unrolls every block into the XLA program
(fine for calibration, where blocks are processed one at a time, but an
80-layer unroll compiles for minutes). For serving, identical blocks are
stacked into one pytree with a leading layer axis and executed with
`lax.scan`: compile time is O(1) in depth, and the weights stream through
the same program — the TPU analogue of the reference's CUDA-graph serving
path (/root/reference/notebooks/aqlm_cuda_graph.ipynb, README.md:23).

The KV cache is a preallocated [L, B, max_len, H_kv, D] ring with optional
int8 storage + per-(token, head) scales — the INT8 KV-cache item from
BASELINE.json's north star (the reference delegates KV handling to HF).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.models import llama
from aqlm_tpu.models.cohere import CohereConfig, cohere_layer_norm, rope_interleaved
from aqlm_tpu.models.common import (
    apply_linear,
    attention,
    attention_headmajor,
    make_causal_mask,
    rms_norm,
    rope,
)
from aqlm_tpu.models.falcon import FalconConfig, layer_norm
from aqlm_tpu.models.opt import OptConfig
from aqlm_tpu.ops.flash_decode import (
    flash_decode_attention,
    flash_decode_write_attention_indexed,
)

__all__ = ["KVCache", "stack_layer_params", "forward_stacked", "init_kv_cache", "model_family"]


def model_family(cfg: llama.ModelConfig) -> str:
    """Block-style dispatch for the stacked/serving path.

    The reference serves every family through HF's per-architecture modules
    (/root/reference/src/modelutils.py:140-176 dispatch tables); here ONE
    scan program covers all of them — the family only selects the block
    front (norm + rope) and back (MLP + residual topology), while the KV
    cache, flash-decode kernels, fusion, and quantized-matmul machinery are
    shared."""
    if isinstance(cfg, CohereConfig):
        return "cohere"
    if isinstance(cfg, FalconConfig):
        return "falcon"
    if isinstance(cfg, OptConfig):
        return "opt"
    return "llama"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """Stacked head-major KV cache. k/v: [L, B, H_kv, max_len, D] (bf16 or
    int8); scales: [L, B, H_kv, max_len, 1] f32 when int8, else None.

    Head-major (sequence contiguous per head) so flash-decode BlockSpecs tile
    [S, D] directly and cache-write DMAs are contiguous runs."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None
    v_scale: jax.Array | None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8


def init_kv_cache(
    cfg: llama.ModelConfig, batch: int, max_len: int, *, dtype=jnp.bfloat16, quantized: bool = False
) -> KVCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.dim_per_head)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            v_scale=jnp.zeros(shape[:-1] + (1,), jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), k_scale=None, v_scale=None)


def stack_layer_params(params: dict, donate: bool = False) -> dict:
    """Stack the per-layer param list into one pytree with a leading L axis.

    Requires homogeneous layers (same structure/modes) — true for whole-model
    quantization; mixed-precision models keep the unrolled path.

    donate=True frees each per-layer leaf right after its stacked copy is
    built (peak HBM = model + largest single stacked leaf instead of 2x model).
    """
    layers = params["layers"]
    if not donate:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return {**params, "layers": stacked}
    stacked = {}
    for name in list(layers[0].keys()):
        stacked[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *[l[name] for l in layers])
        jax.block_until_ready(jax.tree.leaves(stacked[name]))
        for l in layers:
            l[name] = None
    return {**params, "layers": stacked}


def _quantize_kv(x: jax.Array):
    """[B, T, H, D] -> int8 values + per-(token, head) scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [B, T, H]
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-8)[..., None]).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q: jax.Array, scale: jax.Array, dtype):
    # scale carries a trailing singleton dim that broadcasts over D;
    # dequantize straight to the compute dtype (an f32 intermediate would
    # double the HBM traffic of the whole cache)
    return q.astype(dtype) * scale.astype(dtype)


def forward_stacked(
    params: dict,
    cfg: llama.ModelConfig,
    input_ids: jax.Array,
    *,
    cache: KVCache | None = None,
    cache_offset: jax.Array | int = 0,
    positions: jax.Array | None = None,
    use_flash_decode: bool | None = None,
):
    """Causal LM forward over stacked layers. Returns (logits, new_cache).

    With a cache: writes K/V at [cache_offset, cache_offset+T) and attends
    over positions <= current. Shapes are static; `cache_offset` may be a
    traced scalar (decode loop friendly).

    use_flash_decode routes single-token attention through the layer-indexed
    Pallas flash-decode kernel: the cache rides the scan carry, writes go
    through an input/output-ALIASED pallas kernel (plain dynamic_update_slice
    on the carry stops aliasing at batch>=8 and copies the whole cache per
    layer), and reads index the stacked cache in place via scalar prefetch.
    Measured (v5e, repeated): codes-mode flash is neutral at 256 ctx
    (348-365 us/layer both ways, 2x8 8-layer slice B=1) and wins at 2k+
    (B=8: 3.44 vs 4.15 ms/layer); int8 flash costs ~12 us/layer at 256 ctx
    and wins from >=1024 (3.72 vs 4.10 ms/step at b1/2k). Default (None):
    flash for codes-mode layers at any length, int8 from 1024 ctx.
    """
    b, t = input_ids.shape
    offsets = jnp.broadcast_to(jnp.asarray(cache_offset), (b,))  # per-row cache offsets
    if positions is None:
        positions = offsets[:, None] + jnp.arange(t)[None, :]
    positions = jnp.broadcast_to(positions, (b, t))

    def write_rows(buf, new):
        """Head-major write: buf [B, H, S, ...] <- new [B, T, H, ...] at
        per-row sequence offsets."""
        new_hm = jnp.moveaxis(new, 1, 2)  # [B, H, T, ...]
        return jax.vmap(
            lambda c, x, off: jax.lax.dynamic_update_slice_in_dim(c, x, off, axis=1)
        )(buf, new_hm, offsets)

    fam = model_family(cfg)

    x = jnp.take(params["embed"], input_ids, axis=0)
    if fam == "opt":
        # learned positions with OPT's +2 offset (models/opt.py::embed)
        x = x + jnp.take(params["pos_embed"], positions + 2, axis=0)
    elif cfg.gemma_norm:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)

    d = cfg.dim_per_head

    if cache is not None:
        key_pos = jnp.broadcast_to(jnp.arange(cache.max_len)[None, :], (b, cache.max_len))
        mask = make_causal_mask(positions, key_pos, window=cfg.sliding_window)
    else:
        mask = make_causal_mask(positions, positions, window=cfg.sliding_window)

    # Big quantized arrays are NOT scanned over (a scan-sliced operand feeding
    # a pallas_call costs an HBM copy of the whole layer); they are closed
    # over and indexed inside the kernels via IndexedQuantizedLinear. Small
    # leaves (norms, dense weights, kv slices) go through scan xs as usual.
    from aqlm_tpu.ops.runtime import IndexedQuantizedLinear, QuantizedLinear

    from aqlm_tpu.models.mixtral import (
        StackedCodesExperts,
        StackedInt4Experts,
        StackedInt8Experts,
    )
    from aqlm_tpu.ops.runtime import FusedCodesLinear, IndexedFusedCodesLinear

    stacked_layers = params["layers"]
    qnames = [n for n, v in stacked_layers.items() if isinstance(v, QuantizedLinear)]
    fnames = [n for n, v in stacked_layers.items() if isinstance(v, FusedCodesLinear)]
    # Stacked experts / FusedCodesLinear are accessed via scalar-prefetch
    # layer indexing, not scanned (a scan-xs slice would copy the weights to
    # HBM every step)
    rest = {
        n: v for n, v in stacked_layers.items()
        if n not in qnames and n not in fnames
        and not isinstance(v, (StackedInt8Experts, StackedInt4Experts, StackedCodesExperts))
    }
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    # flash path: the cache rides the scan CARRY (full stacked arrays) and
    # the kernel indexes layer i via scalar prefetch — scan-xs slices feeding
    # an opaque pallas_call would copy the layer's cache to HBM every step
    if use_flash_decode is None:
        # codes-mode flash is neutral at short contexts and wins at long;
        # int8 decode pays ~12 us/layer of launch overhead at tiny contexts
        # and only wins from >=1024 ctx (3.72 vs 4.10 ms/step at b1/2k)
        has_codes = any(
            isinstance(v, FusedCodesLinear)
            or (isinstance(v, QuantizedLinear) and v.mode == "codes")
            for v in stacked_layers.values()
        )
        # kernel tiling floor: the aliased KV-write and flash BlockSpecs need
        # 128-aligned cache lengths (tiny test caches fall back to XLA)
        flash_ok = cache is not None and cache.max_len % 128 == 0
        use_flash_decode = flash_ok and (has_codes or cache.max_len >= 1024)
    flash = cache is not None and t == 1 and use_flash_decode

    def block(carry, scan_in):
        if flash:
            x, kv_full = carry
            i, rest_i = scan_in
            kv = None
        else:
            x = carry
            i, rest_i, kv = scan_in
        layer = dict(rest_i)
        for n in qnames:
            layer[n] = IndexedQuantizedLinear(stacked=stacked_layers[n], idx=i)
        for n in fnames:
            layer[n] = IndexedFusedCodesLinear(stacked=stacked_layers[n], idx=i)
        res = x
        if fam == "llama":
            xn = rms_norm(x, layer["input_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
        elif fam == "cohere":
            xn = cohere_layer_norm(x, layer["input_norm"], cfg.ln_eps)
        elif fam == "falcon":
            xn = layer_norm(x, layer["input_norm"], layer["input_norm_bias"], cfg.ln_eps)
        else:  # opt
            xn = layer_norm(x, layer["attn_norm"], layer["attn_norm_bias"], cfg.ln_eps)
        if "qkv_proj" in layer:  # fused (serve/fuse.py)
            nq, nkv = cfg.num_heads * d, cfg.num_kv_heads * d
            qkv = apply_linear(xn, layer["qkv_proj"])
            q = qkv[..., :nq].reshape(b, t, cfg.num_heads, d)
            k = qkv[..., nq : nq + nkv].reshape(b, t, cfg.num_kv_heads, d)
            v = qkv[..., nq + nkv :].reshape(b, t, cfg.num_kv_heads, d)
        else:
            q = apply_linear(xn, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
            k = apply_linear(xn, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
            v = apply_linear(xn, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
        if fam == "cohere":
            if cfg.use_qk_norm:  # per-head LayerNorm over head_dim (command-r-plus)
                q = cohere_layer_norm(q, layer["q_norm"], cfg.ln_eps)
                k = cohere_layer_norm(k, layer["k_norm"], cfg.ln_eps)
            q, k = rope_interleaved(q, k, positions, cfg.rope_theta)
        elif fam != "opt":  # opt: learned positions, no rope
            q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)

        new_kv = None
        if flash:
            if cache.quantized:
                # fused single launch: write the new row + attend (the
                # separate kv_write4 + attention launches cost ~launch
                # overhead x layers; the row is merged in-register)
                k_all, v_all, ks_all, vs_all = kv_full
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                attn, k_all, v_all, ks_all, vs_all = flash_decode_write_attention_indexed(
                    q, k8, v8, k_all, v_all, ks_all, vs_all, i, offsets,
                    k_scale_new=ks[..., None], v_scale_new=vs[..., None],
                    window=cfg.sliding_window,
                )
                kv_full = (k_all, v_all, ks_all, vs_all)
            else:
                k_all, v_all = kv_full
                attn, k_all, v_all, _, _ = flash_decode_write_attention_indexed(
                    q, k, v, k_all, v_all, None, None, i, offsets,
                    window=cfg.sliding_window,
                )
                kv_full = (k_all, v_all)
        elif kv is not None:
            if len(kv) == 4:  # int8
                k_c, v_c, ks_c, vs_c = kv
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                k_c = write_rows(k_c, k8)
                v_c = write_rows(v_c, v8)
                ks_c = write_rows(ks_c, ks[..., None])
                vs_c = write_rows(vs_c, vs[..., None])
                new_kv = (k_c, v_c, ks_c, vs_c)
                if t == 1 and use_flash_decode:
                    attn = flash_decode_attention(
                        q, k_c, v_c, ks_c, vs_c, offsets + 1,
                        window=cfg.sliding_window,
                    )
                else:
                    k_all = _dequantize_kv(k_c, ks_c, q.dtype)
                    v_all = _dequantize_kv(v_c, vs_c, q.dtype)
                    attn = attention_headmajor(q, k_all, v_all, mask)
            else:
                k_c, v_c = kv
                k_c = write_rows(k_c, k.astype(k_c.dtype))
                v_c = write_rows(v_c, v.astype(v_c.dtype))
                new_kv = (k_c, v_c)
                if t == 1 and use_flash_decode:
                    attn = flash_decode_attention(
                        q, k_c, v_c, None, None, offsets + 1,
                        window=cfg.sliding_window,
                    )
                else:
                    attn = attention_headmajor(q, k_c.astype(q.dtype), v_c.astype(q.dtype), mask)
        else:
            attn = attention(q, k, v, mask)
        attn = attn.astype(x.dtype)

        if fam == "cohere":
            # PARALLEL block: attention and SwiGLU MLP both read the shared
            # xn and residual-add into the block input (models/cohere.py)
            attn_out = apply_linear(attn.reshape(b, t, -1), layer["o_proj"])
            if "gateup_proj" in layer:  # fused (serve/fuse.py)
                gu = apply_linear(xn, layer["gateup_proj"]).astype(jnp.float32)
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = apply_linear(xn, layer["gate_proj"]).astype(jnp.float32)
                up = apply_linear(xn, layer["up_proj"]).astype(jnp.float32)
            hidden = (jax.nn.silu(gate) * up).astype(x.dtype)
            x = res + attn_out + apply_linear(hidden, layer["down_proj"])
            if flash:
                return (x, kv_full), None
            return x, new_kv
        if fam == "falcon":
            # PARALLEL block, GELU MLP from the shared xn (models/falcon.py)
            attn_out = apply_linear(attn.reshape(b, t, -1), layer["o_proj"])
            h1 = jax.nn.gelu(apply_linear(xn, layer["fc1"]).astype(jnp.float32)).astype(x.dtype)
            x = res + attn_out + apply_linear(h1, layer["fc2"])
            if flash:
                return (x, kv_full), None
            return x, new_kv
        if fam == "opt":
            # sequential pre-LN block, ReLU MLP (models/opt.py)
            x = res + apply_linear(attn.reshape(b, t, -1), layer["out_proj"])
            res = x
            xn2 = layer_norm(x, layer["mlp_norm"], layer["mlp_norm_bias"], cfg.ln_eps)
            h1 = jax.nn.relu(apply_linear(xn2, layer["fc1"]).astype(jnp.float32)).astype(x.dtype)
            x = res + apply_linear(h1, layer["fc2"])
            if flash:
                return (x, kv_full), None
            return x, new_kv

        x = res + apply_linear(attn.reshape(b, t, -1), layer["o_proj"])
        res = x
        xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
        if "moe_gate" in layer:  # sparse-MoE block (mixtral)
            from aqlm_tpu.models import mixtral

            if "experts_gate_proj" in stacked_layers:
                # stacked int8 experts: ONE all-expert kernel per projection,
                # layer picked via scalar prefetch (serve/moe.py stacking)
                x = res + mixtral.moe_mlp_stacked_indexed(xn, layer, stacked_layers, i, cfg)
            else:
                # per-expert loop over layer-indexed quantized kernels
                x = res + mixtral._moe_mlp(xn, layer, cfg)
        elif "gateup_proj" in layer:  # fused (serve/fuse.py)
            gu = apply_linear(xn, layer["gateup_proj"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = res + apply_linear(
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up, layer["down_proj"]
            )
        else:
            gate = apply_linear(xn, layer["gate_proj"])
            up = apply_linear(xn, layer["up_proj"])
            x = res + apply_linear(
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up, layer["down_proj"]
            )
        if flash:
            return (x, kv_full), None
        return x, new_kv

    if flash:
        kv0 = (
            (cache.k, cache.v, cache.k_scale, cache.v_scale)
            if cache.quantized
            else (cache.k, cache.v)
        )
        (x, kv_out), _ = jax.lax.scan(block, (x, kv0), (layer_ids, rest))
        if cache.quantized:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=kv_out[2], v_scale=kv_out[3])
        else:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=None, v_scale=None)
    elif cache is not None:
        kv_in = (
            (cache.k, cache.v, cache.k_scale, cache.v_scale)
            if cache.quantized
            else (cache.k, cache.v)
        )
        x, kv_out = jax.lax.scan(block, x, (layer_ids, rest, kv_in))
        if cache.quantized:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=kv_out[2], v_scale=kv_out[3])
        else:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=None, v_scale=None)
    else:
        x, _ = jax.lax.scan(lambda c, s: block(c, (s[0], s[1], None)), x, (layer_ids, rest))
        new_cache = None

    if fam == "llama":
        x = rms_norm(x, params["final_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
    elif fam == "cohere":
        x = cohere_layer_norm(x, params["final_norm"], cfg.ln_eps)
    else:  # falcon / opt
        x = layer_norm(x, params["final_norm"], params["final_norm_bias"], cfg.ln_eps)
    if params.get("lm_head") is not None:
        logits = apply_linear(x, params["lm_head"])
    else:
        logits = jnp.einsum(
            "bth,vh->btv", x, params["embed"].astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if fam == "cohere":
        logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.logit_softcap:
        c = cfg.logit_softcap
        logits = (jnp.tanh(logits.astype(jnp.float32) / c) * c).astype(x.dtype)
    return logits, new_cache
