"""Tensor-parallel decode over the mesh: Pallas kernels under shard_map.

The north-star deployment (BASELINE.json): a big AQLM model (e.g.
Llama-3-70B 2-bit) served across a v5e slice with codes/weights and KV
sharded. pjit's automatic partitioner cannot see inside opaque pallas_calls,
so the serving step runs under `shard_map`: every device executes the same
block code on its LOCAL shard of the stacked weights —

- qkv / gate+up (column-parallel): OUT sharded -> local heads / local
  intermediate, no communication;
- o_proj / down_proj (row-parallel): IN sharded -> partial sums, one
  `psum` over the model axis each (the two all-reduces per block of
  megatron TP);
- KV cache sharded over kv heads; attention is local to each shard;
- lm_head vocab-sharded; logits all-gathered (tiny at decode).

Layer weights stay in the scan-closure + layer-indexed kernels, exactly like
the single-chip path — each device streams only its shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqlm_tpu.models import llama
from aqlm_tpu.models.cohere import cohere_layer_norm, rope_interleaved
from aqlm_tpu.models.common import apply_linear, attention_headmajor, make_causal_mask, rms_norm, rope
from aqlm_tpu.models.stacked import KVCache, _dequantize_kv, _quantize_kv, model_family
from aqlm_tpu.ops.flash_decode import flash_decode_write_attention_indexed
from aqlm_tpu.ops.runtime import (
    FusedCodesLinear,
    IndexedFusedCodesLinear,
    IndexedQuantizedLinear,
    QuantizedLinear,
)

__all__ = [
    "tp_shard_serving_params",
    "make_tp_decode_step",
    "make_tp_prefill_step",
    "tp_kv_cache_spec",
]

# which stacked-layer weights shard which way (fused serving layout)
_COLUMN = ("qkv_proj", "q_proj", "k_proj", "v_proj", "gateup_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def _qlin_spec(name: str, q: QuantizedLinear, ma: str):
    """PartitionSpec tree for one stacked (leading L) quantized linear.

    int8 layout: w8 [L, OUT, INpad] — column-parallel shards OUT,
    row-parallel shards IN. codes layout (nbits<=8): codes_t [L, K, IG, OUT]
    — column shards OUT (last axis), row shards the in-group axis; codebooks
    are tiny and replicated (parallel/mesh.py specs for the canonical layout
    follow the same geometry). 16-bit codes layout: codes [L, OUT, IG]."""
    col = name in _COLUMN
    out1 = P(None, ma) if col else P(None)
    if q.mode == "int8":
        spec_w8 = P(None, ma, None) if col else P(None, None, ma)
        return QuantizedLinear(
            codes=None, codes_t=None, codebooks=None, packed_cb=None,
            w8=spec_w8, w8_scale=out1,
            scales=out1,
            bias=None if q.bias is None else (P(None, ma) if col else P(None)),
            scheme=q.scheme, mode=q.mode,
        )
    if q.mode == "int4":
        # w4 [L, OUT, INpad/2]: the block-local nibble packing keeps any
        # 256-aligned packed-column slice == the same original columns, so
        # row-parallel can shard the packed axis directly; gscale
        # [L, INpad/G, OUT] shards the opposite axis
        return QuantizedLinear(
            codes=None, codes_t=None, codebooks=None, packed_cb=None,
            w8=None, w8_scale=None,
            w4=P(None, ma, None) if col else P(None, None, ma),
            w4_gscale=P(None, None, ma) if col else P(None, ma, None),
            scales=out1,
            bias=None if q.bias is None else (P(None, ma) if col else P(None)),
            scheme=q.scheme, mode=q.mode,
        )
    assert q.mode == "codes", q.mode
    assert q.bias is None or col, (
        "row-parallel codes TP would add the bias once per shard before the "
        "psum; fold biases into the column-parallel projections instead"
    )
    if q.codes_tl is not None:  # nbits <= 8, tiled decode layout
        # [L, NT, K*IG, tn]: column-parallel shards the tile axis (OUT),
        # row-parallel shards the in-group row axis
        spec_tl = P(None, ma, None, None) if col else P(None, None, ma, None)
        return QuantizedLinear(
            codes=None, codes_t=None,
            codebooks=P(None, None, None, None), packed_cb=None,
            w8=None, w8_scale=None, scales=out1,
            bias=None if q.bias is None else P(None, ma),
            scheme=q.scheme, mode=q.mode, codes_tl=spec_tl,
        )
    if q.codes_t is not None:  # nbits <= 8, untiled (OUT < 128 test scale)
        spec_codes_t = P(None, None, None, ma) if col else P(None, None, ma, None)
        return QuantizedLinear(
            codes=None, codes_t=spec_codes_t,
            codebooks=P(None, None, None, None), packed_cb=None,
            w8=None, w8_scale=None, scales=out1,
            bias=None if q.bias is None else P(None, ma),
            scheme=q.scheme, mode=q.mode,
        )
    # 16-bit single-codebook layout: codes [L, OUT, IG] + packed_cb replicated
    spec_codes = P(None, ma, None) if col else P(None, None, ma)
    return QuantizedLinear(
        codes=spec_codes, codes_t=None, codebooks=None,
        packed_cb=P(None, None, None),
        w8=None, w8_scale=None, scales=out1,
        bias=None if q.bias is None else P(None, ma),
        scheme=q.scheme, mode=q.mode,
    )


def tp_serving_param_specs(stacked: dict, ma: str = "model") -> dict:
    """Specs for a fused, stacked serving params pytree."""
    from aqlm_tpu.models.common import DenseLinear
    from aqlm_tpu.models.mixtral import (
        StackedCodesExperts,
        StackedInt4Experts,
        StackedInt8Experts,
    )

    layer_specs = {}
    for name, v in stacked["layers"].items():
        if name.startswith("experts_"):
            # stacked experts [L, E, ...]: the E axis IS the model axis
            # (expert parallelism); everything else per-leaf replicated
            if isinstance(v, StackedInt8Experts):
                layer_specs[name] = StackedInt8Experts(
                    w8=P(None, ma, None, None), scale=P(None, ma, None)
                )
            elif isinstance(v, StackedInt4Experts):
                layer_specs[name] = StackedInt4Experts(
                    w4=P(None, ma, None, None), gscale=P(None, ma, None, None)
                )
            elif isinstance(v, StackedCodesExperts):
                layer_specs[name] = StackedCodesExperts(
                    codes_tl=P(*([None, ma] + [None] * (v.codes_tl.ndim - 2))),
                    codebooks=P(*([None, ma] + [None] * (v.codebooks.ndim - 2))),
                    scales=P(None, ma, None),
                    group=v.group, num_codebooks=v.num_codebooks,
                )
            else:  # dense experts [L, E, OUT, IN]
                layer_specs[name] = P(*([None, ma] + [None] * (v.ndim - 2)))
        elif isinstance(v, QuantizedLinear):
            layer_specs[name] = _qlin_spec(name, v, ma)
        elif isinstance(v, FusedCodesLinear):
            # qkv/gate+up fused codes (always column-parallel): the tile axis
            # is shard-INTERLEAVED at fusion time (fuse.py _concat_codes
            # tp>1), so sharding it hands each device its own (q, k, v)
            # block with per-shard-local out_sizes; codebooks [L, P, K, S, g]
            # are tiny and replicated
            assert name in _COLUMN, name
            layer_specs[name] = FusedCodesLinear(
                codes_tl=P(None, ma, None, None),
                codebooks=P(None, None, None, None, None),
                scales=P(None, ma),
                out_sizes=v.out_sizes, scheme=v.scheme,
            )
        elif isinstance(v, DenseLinear) and (name in _COLUMN or name in _ROW):
            col = name in _COLUMN
            assert col or v.bias is None, (
                "row-parallel dense bias would be added once per shard before "
                "the psum; fold it into a column-parallel projection instead"
            )
            layer_specs[name] = DenseLinear(
                weight=P(None, ma, None) if col else P(None, None, ma),
                bias=None if v.bias is None else P(None, ma),
            )
        elif name in ("q_norm", "k_norm"):  # cohere per-head qk-norm [L, H, D]:
            layer_specs[name] = P(None, ma, None)  # heads shard with the columns
        else:  # norms / routing gate: replicated (rank-matched spec)
            layer_specs[name] = jax.tree.map(lambda a: P(*([None] * jnp.ndim(a))), v)
    head = stacked.get("lm_head")
    if isinstance(head, QuantizedLinear):
        if head.mode == "int8":
            head_spec = QuantizedLinear(
                codes=None, codes_t=None, codebooks=None, packed_cb=None,
                w8=P(ma, None), w8_scale=P(ma), scales=P(ma),
                bias=None if head.bias is None else P(ma),
                scheme=head.scheme, mode=head.mode,
            )
        elif head.codes_tl is not None:  # codes mode, vocab-sharded (tiled)
            head_spec = QuantizedLinear(
                codes=None, codes_t=None,
                codebooks=P(None, None, None), packed_cb=None,
                w8=None, w8_scale=None, scales=P(ma),
                bias=None if head.bias is None else P(ma),
                scheme=head.scheme, mode=head.mode, codes_tl=P(ma, None, None),
            )
        else:  # 16-bit codes layout
            head_spec = QuantizedLinear(
                codes=P(ma, None), codes_t=None, codebooks=None,
                packed_cb=P(None, None),
                w8=None, w8_scale=None, scales=P(ma),
                bias=None if head.bias is None else P(ma),
                scheme=head.scheme, mode=head.mode,
            )
    elif head is not None:
        head_spec = jax.tree.map(lambda _: P(ma, None), head)
    else:
        head_spec = None
    return {
        "embed": P(None, None),  # replicated: the lookup is tiny
        "layers": layer_specs,
        "final_norm": P(None),
        "lm_head": head_spec,
    }


def tp_kv_cache_spec(ma: str = "model"):
    """[L, B, H, S, D] cache: kv heads sharded over the model axis."""
    return KVCache(
        k=P(None, None, ma, None, None), v=P(None, None, ma, None, None),
        k_scale=P(None, None, ma, None, None), v_scale=P(None, None, ma, None, None),
    )


def tp_shard_serving_params(stacked: dict, mesh: Mesh, ma: str = "model") -> dict:
    specs = tp_serving_param_specs(stacked, ma)
    place = lambda x, s: None if x is None else jax.device_put(x, NamedSharding(mesh, s))
    return jax.tree.map(place, stacked, specs, is_leaf=lambda x: x is None)


def _make_local_step(
    cfg: llama.ModelConfig, mesh: Mesh, ma: str = "model",
    use_flash_decode: bool | None = None,
):
    """Per-device block stack shared by the TP decode and TP prefill entries.

    Returns local_step(params, cache_kv, tokens [B,T], offsets [B],
    last_pos [B] | None) -> (logits, kv): with last_pos given, the lm_head
    runs on that single position per row (prefill — avoids materializing and
    all-gathering [B, T, V]); otherwise on every position (decode, T=1).
    """
    fam = model_family(cfg)
    assert fam in ("llama", "cohere"), f"TP serving supports llama/cohere layouts, not {fam}"
    tp = mesh.shape[ma]
    assert cfg.num_kv_heads % tp == 0 and cfg.num_heads % tp == 0, (cfg, tp)
    d = cfg.dim_per_head
    hq_l, hkv_l = cfg.num_heads // tp, cfg.num_kv_heads // tp

    def local_block(
        x, layer, kv, positions, offsets, mask, b, t, i=None, stacked_layers=None,
        kv_full=None,
    ):
        res = x
        if fam == "cohere":
            xn = cohere_layer_norm(x, layer["input_norm"], cfg.ln_eps)
        else:
            xn = rms_norm(x, layer["input_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
        if "qkv_proj" in layer:
            qkv = apply_linear(xn, layer["qkv_proj"])  # local heads
            nq, nkv = hq_l * d, hkv_l * d
            q = qkv[..., :nq].reshape(b, t, hq_l, d)
            k = qkv[..., nq : nq + nkv].reshape(b, t, hkv_l, d)
            v = qkv[..., nq + nkv :].reshape(b, t, hkv_l, d)
        else:
            q = apply_linear(xn, layer["q_proj"]).reshape(b, t, hq_l, d)
            k = apply_linear(xn, layer["k_proj"]).reshape(b, t, hkv_l, d)
            v = apply_linear(xn, layer["v_proj"]).reshape(b, t, hkv_l, d)
        if fam == "cohere":
            if cfg.use_qk_norm:  # per-head qk-norm, local heads only
                q = cohere_layer_norm(q, layer["q_norm"], cfg.ln_eps)
                k = cohere_layer_norm(k, layer["k_norm"], cfg.ln_eps)
            q, k = rope_interleaved(q, k, positions, cfg.rope_theta)
        else:
            q, k = rope(q, k, positions, cfg.rope_theta, scaling=cfg.rope_scaling)

        def write_rows(buf, new):
            new_hm = jnp.moveaxis(new, 1, 2)
            return jax.vmap(
                lambda c, xx, off: jax.lax.dynamic_update_slice_in_dim(c, xx, off, axis=1)
            )(buf, new_hm, offsets)

        if kv_full is not None:
            # flash decode over the LOCAL head shard: one fused launch writes
            # the new KV row in place and attends, exactly the single-chip
            # design (models/stacked.py flash branch)
            if len(kv_full) == 4:  # int8 cache
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
            return _attn_epilogue(
                x, res, xn, attn.reshape(b, t, -1), layer, kv_full, b, t,
                i=i, stacked_layers=stacked_layers,
            )

        if len(kv) == 4:  # int8 cache
            k_c, v_c, ks_c, vs_c = kv
            k8, ks = _quantize_kv(k)
            v8, vs = _quantize_kv(v)
            k_c = write_rows(k_c, k8)
            v_c = write_rows(v_c, v8)
            ks_c = write_rows(ks_c, ks[..., None])
            vs_c = write_rows(vs_c, vs[..., None])
            new_kv = (k_c, v_c, ks_c, vs_c)
            k_all = _dequantize_kv(k_c, ks_c, q.dtype)
            v_all = _dequantize_kv(v_c, vs_c, q.dtype)
        else:
            k_c, v_c = kv
            k_c = write_rows(k_c, k.astype(k_c.dtype))
            v_c = write_rows(v_c, v.astype(v_c.dtype))
            new_kv = (k_c, v_c)
            k_all, v_all = k_c.astype(q.dtype), v_c.astype(q.dtype)

        attn = attention_headmajor(q, k_all, v_all, mask).reshape(b, t, -1)
        return _attn_epilogue(
            x, res, xn, attn, layer, new_kv, b, t, i=i, stacked_layers=stacked_layers
        )

    def _attn_epilogue(x, res, xn, attn, layer, new_kv, b, t, i=None, stacked_layers=None):
        """o_proj through MLP, shared by the flash and XLA attention paths."""
        o_part = apply_linear(attn, layer["o_proj"])

        if fam == "cohere":
            # parallel block: MLP reads the SHARED xn; o_proj + down_proj
            # partial sums combine into ONE all-reduce per block
            if "gateup_proj" in layer:
                gu = apply_linear(xn, layer["gateup_proj"]).astype(jnp.float32)
                gate, up = jnp.split(gu, 2, axis=-1)
            else:
                gate = apply_linear(xn, layer["gate_proj"]).astype(jnp.float32)
                up = apply_linear(xn, layer["up_proj"]).astype(jnp.float32)
            hidden = (jax.nn.silu(gate) * up).astype(x.dtype)
            down_part = apply_linear(hidden, layer["down_proj"])
            x = res + jax.lax.psum(o_part + down_part, ma)
            return x, new_kv

        # row-parallel o_proj: partial sums -> all-reduce (megatron AR #1)
        x = res + jax.lax.psum(o_part, ma)

        res = x
        xn = rms_norm(x, layer["post_attn_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
        if "moe_gate" in layer:  # mixtral: EXPERT-parallel FFN over the same axis
            from aqlm_tpu.models import mixtral as _mixtral

            e_local = jax.tree.leaves(stacked_layers["experts_gate_proj"])[0].shape[1]
            off = jax.lax.axis_index(ma) * e_local
            out_local = _mixtral.moe_mlp_stacked_indexed(
                xn, layer, stacked_layers, i, cfg, expert_offset=off
            )
            # combine over the expert shards (megatron AR #2's seat)
            x = res + jax.lax.psum(out_local.astype(x.dtype), ma)
            return x, new_kv
        if "gateup_proj" in layer:
            gu = apply_linear(xn, layer["gateup_proj"])
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = apply_linear(xn, layer["gate_proj"])
            up = apply_linear(xn, layer["up_proj"])
        mlp = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        # row-parallel down_proj: all-reduce (megatron AR #2)
        x = res + jax.lax.psum(apply_linear(mlp, layer["down_proj"]), ma)
        return x, new_kv

    def local_step(params, cache_kv, tokens, offsets, last_pos=None):
        b, t = tokens.shape
        positions = offsets[:, None] + jnp.arange(t)[None, :]
        x = jnp.take(params["embed"], tokens, axis=0)
        if cfg.gemma_norm:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)

        max_len = cache_kv[0].shape[3]
        key_pos = jnp.broadcast_to(jnp.arange(max_len)[None, :], (b, max_len))
        mask = make_causal_mask(positions, key_pos, window=cfg.sliding_window)

        stacked_layers = params["layers"]
        qnames = [n for n, v in stacked_layers.items() if isinstance(v, QuantizedLinear)]
        fnames = [n for n, v in stacked_layers.items() if isinstance(v, FusedCodesLinear)]
        # stacked experts / fused codes index by scalar prefetch, not scan
        # slicing (a scan xs slice would copy the weights to HBM per step)
        rest = {
            n: v for n, v in stacked_layers.items()
            if n not in qnames and n not in fnames and not n.startswith("experts_")
        }
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

        # flash decode over the local head shard: same default routing as the
        # single-chip path (models/stacked.py) — codes-mode models always,
        # int8/dense from 1024 ctx; needs 128-aligned cache lengths
        flash = use_flash_decode
        if flash is None:
            has_codes = any(
                isinstance(v, FusedCodesLinear)
                or (isinstance(v, QuantizedLinear) and v.mode == "codes")
                for v in stacked_layers.values()
            )
            flash = max_len % 128 == 0 and (has_codes or max_len >= 1024)
        flash = flash and t == 1 and max_len % 128 == 0

        def make_layer(i, rest_i):
            layer = dict(rest_i)
            for n in qnames:
                layer[n] = IndexedQuantizedLinear(stacked=stacked_layers[n], idx=i)
            for n in fnames:
                layer[n] = IndexedFusedCodesLinear(stacked=stacked_layers[n], idx=i)
            return layer

        if flash:
            # the cache rides the scan CARRY (full stacked arrays); the flash
            # and KV-write kernels index layer i via scalar prefetch
            def block(carry, scan_in):
                x, kv_full = carry
                i, rest_i = scan_in
                x, kv_full = local_block(
                    x, make_layer(i, rest_i), None, positions, offsets, mask, b, t,
                    i=i, stacked_layers=stacked_layers, kv_full=kv_full,
                )
                return (x, kv_full), None

            (x, kv_out), _ = jax.lax.scan(block, (x, cache_kv), (layer_ids, rest))
        else:
            def block(carry, scan_in):
                x = carry
                i, rest_i, kv = scan_in
                x, new_kv = local_block(
                    x, make_layer(i, rest_i), kv, positions, offsets, mask, b, t,
                    i=i, stacked_layers=stacked_layers,
                )
                return x, new_kv

            x, kv_out = jax.lax.scan(block, x, (layer_ids, rest, cache_kv))

        if fam == "cohere":
            x = cohere_layer_norm(x, params["final_norm"], cfg.ln_eps)
        else:
            x = rms_norm(x, params["final_norm"], cfg.rms_eps, plus_one=cfg.gemma_norm)
        if last_pos is not None:  # prefill: head on ONE position per row
            x = jax.vmap(lambda row, p: jax.lax.dynamic_slice_in_dim(row, p, 1, axis=0))(
                x, last_pos
            )
        head = params.get("lm_head")
        assert head is not None, (
            "TP serving needs an explicit (vocab-sharded) lm_head; for tied "
            "embeddings (cohere) materialize DenseLinear(weight=params['embed'])"
        )
        logits_local = apply_linear(x, head)  # vocab-sharded
        logits = jax.lax.all_gather(logits_local, ma, axis=-1, tiled=True)
        if fam == "cohere":
            logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
        return logits, kv_out

    return local_step


def make_tp_decode_step(
    cfg: llama.ModelConfig, mesh: Mesh, ma: str = "model",
    use_flash_decode: bool | None = None,
):
    """Build the shard_map'd single-token decode step.

    step(params, cache, tokens [B,1], offsets [B]) -> (logits [B,1,V], cache)
    Requires num_kv_heads and num_heads divisible by the model-axis size.

    Families: llama layout and cohere (Command-R). Cohere's PARALLEL block is
    a TP bonus: o_proj and down_proj partial sums share one residual add, so
    the two megatron all-reduces per block FUSE into a single psum (falcon's
    1-KV-head MQA cannot shard kv heads; opt fits one chip — both stay on the
    single-chip engine).

    Attention runs the flash-decode kernel on each device's local head shard
    (single-chip default routing; use_flash_decode overrides).
    """
    local_step = _make_local_step(cfg, mesh, ma, use_flash_decode=use_flash_decode)

    def step(params, cache: KVCache, tokens, offsets):
        specs = tp_serving_param_specs(params, ma)
        cache_spec = tp_kv_cache_spec(ma)
        if cache.quantized:
            kv = (cache.k, cache.v, cache.k_scale, cache.v_scale)
            kv_specs = (cache_spec.k, cache_spec.v, cache_spec.k_scale, cache_spec.v_scale)
        else:
            kv = (cache.k, cache.v)
            kv_specs = (cache_spec.k, cache_spec.v)
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs, kv_specs, P(None, None), P(None)),
            out_specs=(P(None, None, None), kv_specs),
            check_vma=False,
        )
        logits, kv_out = fn(params, kv, tokens, offsets)
        if cache.quantized:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=kv_out[2], v_scale=kv_out[3])
        else:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=None, v_scale=None)
        return logits, new_cache

    return step


def make_tp_prefill_step(cfg: llama.ModelConfig, mesh: Mesh, ma: str = "model"):
    """Slot-sliced TP prefill: one padded chunk (batch 1) into `slot` at
    cache offset `start`; the lm_head runs on the chunk's final true position
    only, so nothing [T, V]-sized is ever materialized or all-gathered.

    prefill(params, cache, ids [bucket], slot, start, true_len)
      -> (last-position logits [V], cache)
    """
    local_step = _make_local_step(cfg, mesh, ma)

    def local_prefill(params, cache_kv, ids, slot, start, true_len):
        take = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
        kv1 = tuple(take(a) for a in cache_kv)
        logits, kv1 = local_step(
            params, kv1, ids[None, :], jnp.full((1,), start, jnp.int32),
            last_pos=(true_len - 1)[None],
        )
        put = lambda full, part: jax.lax.dynamic_update_slice_in_dim(full, part, slot, axis=1)
        cache_kv = tuple(put(f, p) for f, p in zip(cache_kv, kv1))
        return logits[0, 0], cache_kv

    def prefill(params, cache: KVCache, ids, slot, start, true_len):
        specs = tp_serving_param_specs(params, ma)
        cache_spec = tp_kv_cache_spec(ma)
        if cache.quantized:
            kv = (cache.k, cache.v, cache.k_scale, cache.v_scale)
            kv_specs = (cache_spec.k, cache_spec.v, cache_spec.k_scale, cache_spec.v_scale)
        else:
            kv = (cache.k, cache.v)
            kv_specs = (cache_spec.k, cache_spec.v)
        fn = shard_map(
            local_prefill,
            mesh=mesh,
            in_specs=(specs, kv_specs, P(None), P(), P(), P()),
            out_specs=(P(None), kv_specs),
            check_vma=False,
        )
        logits, kv_out = fn(
            params, kv, ids,
            jnp.asarray(slot, jnp.int32), jnp.asarray(start, jnp.int32),
            jnp.asarray(true_len, jnp.int32),
        )
        if cache.quantized:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=kv_out[2], v_scale=kv_out[3])
        else:
            new_cache = KVCache(k=kv_out[0], v=kv_out[1], k_scale=None, v_scale=None)
        return logits, new_cache

    return prefill
