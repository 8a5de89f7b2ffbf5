"""Load-time projection fusion for serving: QKV and gate+up as single matmuls.

The north-star's "fused gate/up and QKV variants" (BASELINE.json): q/k/v (and
gate/up) share the same input activation, so their int8 weights concatenate
along OUT into one kernel launch. Besides fewer launches, fusion fixes DMA
granularity: llama's 11008-wide gate/up tiles at tn=256 (11008 has no larger
128-multiple divisor) ~400 GB/s, while the fused 22016 = 43*512 tiles at
tn=512 ~600-750 GB/s.

Also here: `quantize_lm_head_int8` — the lm_head is the single largest
weight read per decode step (130-500 MB bf16) and tolerates int8 well.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aqlm_tpu.models.llama import ModelConfig
from aqlm_tpu.ops.int8_matmul import pad_in_features
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = ["fuse_projections", "quantize_lm_head_int8", "int8_linear_from_dense"]


def _concat_int8(lins: list[QuantizedLinear], tp: int = 1) -> QuantizedLinear:
    """Concatenate int8 linears along OUT.

    tp > 1 interleaves per-shard chunks ([q_s0, k_s0, v_s0, q_s1, ...]) so
    that column-sharding the fused OUT dim over `tp` devices hands every
    device its own (q, k, v) block — plain concatenation would give some
    devices only k or only v heads."""
    assert all(l.mode == "int8" for l in lins)

    def out_cat(parts_fn):
        parts = [parts_fn(l) for l in lins]
        if tp == 1:
            return jnp.concatenate(parts, axis=0)
        shards = []
        for s in range(tp):
            for p in parts:
                n = p.shape[0]
                assert n % tp == 0, (n, tp)
                shards.append(p[s * (n // tp) : (s + 1) * (n // tp)])
        return jnp.concatenate(shards, axis=0)

    w8 = out_cat(lambda l: l.w8)
    w8_scale = out_cat(lambda l: l.w8_scale)
    biases = [l.bias for l in lins]
    if any(b is not None for b in biases):
        bias = out_cat(
            lambda l: l.bias if l.bias is not None else jnp.zeros((l.w8.shape[0],), jnp.float32)
        )
    else:
        bias = None
    return QuantizedLinear(
        codes=None, codes_t=None, codebooks=None, packed_cb=None,
        w8=w8, w8_scale=w8_scale,
        scales=jnp.ones((w8.shape[0],), jnp.float32), bias=bias,
        scheme=lins[0].scheme, mode="int8",
    )


def _concat_int4(lins: list[QuantizedLinear], tp: int = 1) -> QuantizedLinear:
    """int4 analogue of _concat_int8: OUT rows of w4 concatenate (per-shard
    interleaved for tp > 1); the [G', OUT] group scales concatenate along
    their lane (OUT) axis in the same order."""
    assert all(l.mode == "int4" and l.bias is None for l in lins)
    assert len({l.w4.shape[1] for l in lins}) == 1  # same packed IN

    def out_cat(parts, axis):
        if tp == 1:
            return jnp.concatenate(parts, axis=axis)
        shards = []
        for s in range(tp):
            for p in parts:
                n = p.shape[axis]
                assert n % tp == 0, (n, tp)
                shards.append(
                    jax.lax.slice_in_dim(p, s * (n // tp), (s + 1) * (n // tp), axis=axis)
                )
        return jnp.concatenate(shards, axis=axis)

    w4 = out_cat([l.w4 for l in lins], axis=0)
    gscale = out_cat([l.w4_gscale for l in lins], axis=1)
    return QuantizedLinear(
        codes=None, codes_t=None, codebooks=None, packed_cb=None,
        w8=None, w8_scale=None, w4=w4, w4_gscale=gscale,
        scales=jnp.ones((w4.shape[0],), jnp.float32), bias=None,
        scheme=lins[0].scheme, mode="int4",
    )


def fuse_projections(params: dict, cfg: ModelConfig, donate: bool = False, tp: int = 1) -> dict:
    """Replace q/k/v -> qkv_proj and gate/up -> gateup_proj where all parts
    are int8- or int4-mode QuantizedLinear. Returns a new params dict (same
    leaves for everything untouched); forward_stacked understands the fused
    keys.

    donate=True drops the original projections from the INPUT layer dicts as
    each fused copy materializes (halves peak HBM during load).
    tp > 1 lays the fused OUT dim out in per-shard interleaved order for
    tensor-parallel serving (serve/tp.py)."""

    def fusible(lins, mode):
        return all(isinstance(l, QuantizedLinear) and l.mode == mode for l in lins)

    def concat(lins):
        if fusible(lins, "int8"):
            return _concat_int8(lins, tp=tp)
        if fusible(lins, "int4") and all(l.bias is None for l in lins):
            return _concat_int4(lins, tp=tp)
        return None

    new_layers = []
    for orig in params["layers"]:
        layer = dict(orig)
        qkv_fused = concat([layer.get(n) for n in ("q_proj", "k_proj", "v_proj")])
        if qkv_fused is not None:
            layer["qkv_proj"] = qkv_fused
            for n in ("q_proj", "k_proj", "v_proj"):
                del layer[n]
                if donate:
                    orig[n] = None
        gu_fused = concat([layer.get(n) for n in ("gate_proj", "up_proj")])
        if gu_fused is not None:
            layer["gateup_proj"] = gu_fused
            for n in ("gate_proj", "up_proj"):
                del layer[n]
                if donate:
                    orig[n] = None
        new_layers.append(layer)
    return {**params, "layers": new_layers}


def int8_linear_from_dense(weight, bias=None) -> QuantizedLinear:
    """Per-out-channel int8 quantization of a dense [OUT, IN] weight, in the
    same runtime container the AQLM int8 mode uses."""
    dense = weight.astype(jnp.float32)
    amax = jnp.max(jnp.abs(dense), axis=1, keepdims=True)
    w8_scale = (amax / 127.0).reshape(-1)
    w8 = jnp.round(dense / jnp.maximum(amax, 1e-12) * 127.0).astype(jnp.int8)
    in_pad = pad_in_features(w8.shape[1])
    if in_pad != w8.shape[1]:
        w8 = jnp.pad(w8, ((0, 0), (0, in_pad - w8.shape[1])))
    from aqlm_tpu.config import AqlmScheme

    return QuantizedLinear(
        codes=None, codes_t=None, codebooks=None, packed_cb=None,
        w8=w8, w8_scale=w8_scale.astype(jnp.float32),
        scales=jnp.ones((w8.shape[0],), jnp.float32),
        bias=None if bias is None else bias.astype(jnp.float32),
        scheme=AqlmScheme(), mode="int8",
    )


def int4_linear_from_dense(weight, bias=None) -> QuantizedLinear:
    """Per-group int4 quantization of a dense [OUT, IN] weight into the W4A16
    runtime container (ops/int4_matmul layout)."""
    from aqlm_tpu.config import AqlmScheme
    from aqlm_tpu.ops.int4_matmul import quantize_int4

    w4, gscale = quantize_int4(weight.astype(jnp.float32))
    return QuantizedLinear(
        codes=None, codes_t=None, codebooks=None, packed_cb=None,
        w8=None, w8_scale=None, w4=w4, w4_gscale=gscale,
        scales=jnp.ones((w4.shape[0],), jnp.float32),
        bias=None if bias is None else bias.astype(jnp.float32),
        scheme=AqlmScheme(), mode="int4",
    )


def quantize_lm_head_int8(params: dict) -> dict:
    """int8-quantize the lm_head (or materialize one from tied embeddings)."""
    out = dict(params)
    if params.get("lm_head") is not None:
        head = params["lm_head"]
        out["lm_head"] = int8_linear_from_dense(head.weight, head.bias)
    else:
        out["lm_head"] = int8_linear_from_dense(params["embed"])
    return out


# ---------------------------------------------------------------------------
# codes-mode fusion (decode: one LUT-GEMM launch for qkv / gate+up)
# ---------------------------------------------------------------------------
from aqlm_tpu.ops.runtime import FusedCodesLinear


def _concat_codes(lins: list[QuantizedLinear], tp: int = 1) -> FusedCodesLinear:
    """Concatenate tiled-codes linears along the tile axis (== along OUT).

    tp > 1 interleaves per-shard tile chunks ([q_s0, k_s0, v_s0, q_s1, ...])
    so column-sharding the fused tile axis over `tp` devices hands every
    device its own (q, k, v) tile block — the codes analogue of
    _concat_int8's layout. out_sizes are then recorded PER SHARD (local
    widths): the fused kernel's tile->projection map and the prefill split
    both run inside shard_map on the local shard."""
    assert all(
        l.mode == "codes" and l.codes_tl is not None and l.bias is None for l in lins
    )
    s0 = lins[0].scheme
    assert all(l.scheme == s0 for l in lins)
    if tp == 1:
        codes_tl = jnp.concatenate([l.codes_tl for l in lins], axis=0)
        scales = jnp.concatenate([l.scales for l in lins])
    else:
        tiles, scales_parts = [], []
        for s in range(tp):
            for l in lins:
                nt, n = l.codes_tl.shape[0], l.scales.shape[0]
                assert nt % tp == 0 and n % tp == 0, (nt, n, tp)
                tiles.append(l.codes_tl[s * (nt // tp) : (s + 1) * (nt // tp)])
                scales_parts.append(l.scales[s * (n // tp) : (s + 1) * (n // tp)])
        codes_tl = jnp.concatenate(tiles, axis=0)
        scales = jnp.concatenate(scales_parts)
    return FusedCodesLinear(
        codes_tl=codes_tl,
        codebooks=jnp.stack([l.codebooks for l in lins]),
        scales=scales,
        out_sizes=tuple(
            l.codes_tl.shape[0] * l.codes_tl.shape[2] // tp for l in lins
        ),
        scheme=s0,
    )


def _is_tiled_codes(l) -> bool:
    return (isinstance(l, QuantizedLinear) and l.mode == "codes"
            and l.codes_tl is not None and l.bias is None)


def _tp_compatible_tn(lins, tp: int):
    """Largest tile width every projection in the group can shard `tp` ways.

    lut_tile_n picks the tile width per projection at load time without tp
    knowledge; GQA makes k/v much narrower than q (70B: 1024 vs 8192), so a
    512-wide tile that shards fine for q leaves k/v with NT < tp."""
    for tn in (512, 128):
        if all(l.out_features % (tn * tp) == 0 for l in lins):
            return tn
    return None


def _retile_codes(l: QuantizedLinear, tn_new: int) -> QuantizedLinear:
    from aqlm_tpu.ops.lut_gemv import tile_codes, untile_codes

    if l.codes_tl.shape[2] == tn_new:
        return l
    ct = untile_codes(l.codes_tl, l.scheme.num_codebooks)
    return dataclasses.replace(l, codes_tl=tile_codes(ct, tn=tn_new))


def _codes_fusible(lins, tp: int = 1) -> bool:
    return (
        all(
            isinstance(l, QuantizedLinear) and l.mode == "codes"
            and l.codes_tl is not None and l.bias is None
            for l in lins
        )
        and len({l.scheme for l in lins}) == 1
        and len({l.codes_tl.shape[1:] for l in lins}) == 1  # same K*IG and tn
        # shard-interleaved layout needs a whole number of tiles per shard
        # (e.g. GQA kv_proj 1024-wide at tn=512 cannot split 4 ways: such a
        # projection serves unfused under that tp)
        and all(l.codes_tl.shape[0] % tp == 0 for l in lins)
    )


def fuse_projections_codes(
    params: dict, cfg: ModelConfig, donate: bool = False, tp: int = 1
) -> dict:
    """codes-mode analogue of fuse_projections: qkv / gate+up fused into one
    decode launch each (7 -> 4 launches per block). Prefill still runs the
    per-projection one-hot kernels (forward_stacked splits fused outputs).
    tp > 1 lays tiles out in per-shard interleaved order for tensor-parallel
    serving (serve/tp.py); non-tile-divisible projections stay unfused."""
    def _tp_retile_group(layer, names):
        """Re-tile a fusion group to a tile width every member can shard
        `tp` ways (GQA k/v at 70B widths: 1024 out -> 2 512-tiles, unshardable
        at tp=8; tn=128 gives 8). Applied whether or not the group then
        fuses: an UNFUSED column-parallel codes projection also shards its
        tile axis (serve/tp.py _qlin_spec)."""
        lins = [layer.get(n) for n in names]
        if tp == 1 or not all(_is_tiled_codes(l) for l in lins):
            return
        if all(l.codes_tl.shape[0] % tp == 0 for l in lins) and (
            len({l.codes_tl.shape[2] for l in lins}) == 1
        ):
            return
        tn = _tp_compatible_tn(lins, tp)
        if tn is None:  # per-projection fallback: shardable but unfusible
            for n, l in zip(names, lins):
                if l.codes_tl.shape[0] % tp and l.out_features % (128 * tp) == 0:
                    layer[n] = _retile_codes(l, 128)
            return
        for n, l in zip(names, lins):
            layer[n] = _retile_codes(l, tn)

    new_layers = []
    for orig in params["layers"]:
        layer = dict(orig)
        _tp_retile_group(layer, ("q_proj", "k_proj", "v_proj"))
        qkv = [layer.get(n) for n in ("q_proj", "k_proj", "v_proj")]
        if _codes_fusible(qkv, tp):
            layer["qkv_proj"] = _concat_codes(qkv, tp=tp)
            for n in ("q_proj", "k_proj", "v_proj"):
                del layer[n]
                if donate:
                    orig[n] = None
        _tp_retile_group(layer, ("gate_proj", "up_proj"))
        gu = [layer.get(n) for n in ("gate_proj", "up_proj")]
        if _codes_fusible(gu, tp):
            layer["gateup_proj"] = _concat_codes(gu, tp=tp)
            for n in ("gate_proj", "up_proj"):
                del layer[n]
                if donate:
                    orig[n] = None
        new_layers.append(layer)
    return {**params, "layers": new_layers}
