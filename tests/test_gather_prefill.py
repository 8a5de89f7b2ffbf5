"""Gather-dequant prefill kernels vs the one-hot oracle (ops/gather_prefill).

The oracle is the one-hot MXU path (ops/kernels.fused_onehot_matmul), itself
tested against the pure-jnp reference dequant — the reference's own
kernel-vs-fallback pattern (benchmark/matmul_benchmark.py:99-109)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.ops.gather_prefill import (
    gather_prefill_matmul,
    gather_prefill_matmul_grouped_indexed,
    gather_prefill_matmul_indexed,
)
from aqlm_tpu.ops.kernels import fused_onehot_matmul
from aqlm_tpu.ops.lut_gemv import tile_codes


def _mk(key, out_f, in_f, k, s, g, b):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codes_t = jax.random.randint(k1, (k, in_f // g, out_f), 0, s, jnp.int32).astype(jnp.uint8)
    cbs = jax.random.normal(k2, (k, s, g), jnp.float32) * 0.05
    scales = jax.random.uniform(k3, (out_f,), jnp.float32, 0.5, 1.5)
    x = jax.random.normal(k4, (b, in_f), jnp.bfloat16)
    return codes_t, cbs, scales, x


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)


@pytest.mark.parametrize("k,s", [(2, 256), (1, 256), (2, 128), (8, 256)])
def test_plain_matches_onehot(k, s):
    out_f, in_f, g, b = 512, 256, 8, 24
    codes_t, cbs, scales, x = _mk(jax.random.PRNGKey(0), out_f, in_f, k, s, g, b)
    y_ref = fused_onehot_matmul(x, codes_t, cbs, scales, group=g)
    y = gather_prefill_matmul(x, tile_codes(codes_t), cbs, scales, group=g)
    assert _rel(y, y_ref) < 2e-2


def test_plain_bias_and_lead_dims():
    out_f, in_f, g = 256, 128, 8
    codes_t, cbs, scales, x = _mk(jax.random.PRNGKey(1), out_f, in_f, 2, 256, g, 12)
    bias = jnp.arange(out_f, dtype=jnp.float32) * 0.01
    x3 = x.reshape(3, 4, in_f)
    y_ref = fused_onehot_matmul(x3, codes_t, cbs, scales, bias, group=g)
    y = gather_prefill_matmul(x3, tile_codes(codes_t), cbs, scales, bias, group=g)
    assert y.shape == (3, 4, out_f)
    assert _rel(y, y_ref) < 2e-2


def test_odd_batch_padding():
    out_f, in_f, g = 256, 128, 8
    codes_t, cbs, scales, x = _mk(jax.random.PRNGKey(2), out_f, in_f, 2, 256, g, 13)
    y_ref = fused_onehot_matmul(x, codes_t, cbs, scales, group=g)
    y = gather_prefill_matmul(x, tile_codes(codes_t), cbs, scales, group=g)
    assert y.shape == (13, out_f)
    assert _rel(y, y_ref) < 2e-2


def test_indexed_matches_per_layer():
    out_f, in_f, g, L, b = 256, 128, 8, 3, 16
    keys = jax.random.split(jax.random.PRNGKey(3), L)
    per = [_mk(keys[i], out_f, in_f, 2, 256, g, b) for i in range(L)]
    codes_tl_all = jnp.stack([tile_codes(p[0]) for p in per])
    cbs_all = jnp.stack([p[1] for p in per])
    scales_all = jnp.stack([p[2] for p in per])
    bias_all = jnp.stack([jnp.full((out_f,), 0.1 * i, jnp.float32) for i in range(L)])
    x = per[0][3]
    for i in range(L):
        y_ref = fused_onehot_matmul(x, per[i][0], per[i][1], per[i][2],
                                    bias_all[i], group=g)
        y = gather_prefill_matmul_indexed(
            x, codes_tl_all, cbs_all, scales_all, i, bias_all, group=g
        )
        assert _rel(y, y_ref) < 2e-2


def test_grouped_indexed_matches_split():
    """Fused qkv-style: per-projection codebooks, concatenated tiled codes."""
    in_f, g, L, b = 128, 8, 2, 16
    out_sizes = (256, 128, 128)
    tn = 128
    keys = jax.random.split(jax.random.PRNGKey(4), L * len(out_sizes)).reshape(
        L, len(out_sizes), 2
    )
    layers = []
    for i in range(L):
        parts = [
            _mk(jax.random.PRNGKey(10 + 7 * i + p), sz, in_f, 2, 256, g, b)
            for p, sz in enumerate(out_sizes)
        ]
        codes_tl = jnp.concatenate([tile_codes(p[0], tn) for p in parts], axis=0)
        cbs = jnp.stack([p[1] for p in parts])  # [P, K, S, g]
        scales = jnp.concatenate([p[2] for p in parts])
        layers.append((parts, codes_tl, cbs, scales))
    codes_tl_all = jnp.stack([l[1] for l in layers])
    cbs_all = jnp.stack([l[2] for l in layers])
    scales_all = jnp.stack([l[3] for l in layers])
    x = layers[0][0][0][3]
    for i in range(L):
        parts = layers[i][0]
        y_ref = jnp.concatenate(
            [fused_onehot_matmul(x, p[0], p[1], p[2], group=g) for p in parts],
            axis=-1,
        )
        y = gather_prefill_matmul_grouped_indexed(
            x, codes_tl_all, cbs_all, scales_all, out_sizes, i, group=g
        )
        assert _rel(y, y_ref) < 2e-2


def test_gather_dequant_wt_matches_reference():
    from aqlm_tpu.ops.gather_prefill import gather_dequant_wt
    from aqlm_tpu.ops.kernels import dequantize_onehot

    for k, s in [(2, 256), (2, 128), (1, 256)]:
        codes_t, cbs, scales, _ = _mk(jax.random.PRNGKey(5), 512, 256, k, s, 8, 1)
        wt_ref = dequantize_onehot(codes_t, cbs, scales, group=8)
        wt = gather_dequant_wt(tile_codes(codes_t), cbs, scales)
        assert wt.shape == wt_ref.shape
        assert _rel(wt, wt_ref) < 2e-2


def test_amortized_multi_batch_tile_matches_onehot():
    """b > 256 (multiple batch tiles) triggers the amortized-dequant grid:
    batch tile 0 persists the W^T column, later tiles reuse it."""
    out_f, in_f, g = 256, 128, 8
    codes_t, cbs, scales, x = _mk(jax.random.PRNGKey(7), out_f, in_f, 2, 256, g, 520)
    y_ref = fused_onehot_matmul(x, codes_t, cbs, scales, group=g)
    y = gather_prefill_matmul(x, tile_codes(codes_t), cbs, scales, group=g)
    assert _rel(y, y_ref) < 2e-2


def test_slab_split_matches_onehot(monkeypatch):
    """Force the IN-slab split (tiny scratch cap): partial sums over
    contraction slabs must equal the unsplit result."""
    from aqlm_tpu.ops import gather_prefill as gp

    monkeypatch.setattr(gp, "_WT_SCRATCH_CAP", 16 * 1024)
    out_f, in_f, g = 256, 512, 8
    codes_t, cbs, scales, x = _mk(jax.random.PRNGKey(8), out_f, in_f, 2, 256, g, 264)
    ct = tile_codes(codes_t)
    slabs, amortize = gp._slab_split(ct.shape[1], 2, g, ct.shape[2], 2)
    assert len(slabs) > 1 and amortize, (slabs, amortize)
    y_ref = fused_onehot_matmul(x, codes_t, cbs, scales, group=g)
    y = gp.gather_prefill_matmul(x, ct, cbs, scales, group=g)
    assert _rel(y, y_ref) < 2e-2


def test_amortized_indexed_and_grouped_match_plain():
    """Layer-indexed + grouped variants under multi-batch-tile amortization."""
    out_f, in_f, g, L = 256, 128, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(9), L)
    per = [_mk(k, out_f, in_f, 2, 256, g, 264) for k in keys]
    codes_all = jnp.stack([tile_codes(c) for c, _, _, _ in per])
    cbs_all = jnp.stack([cb for _, cb, _, _ in per])
    sc_all = jnp.stack([s for _, _, s, _ in per])
    x = per[0][3]
    for li in range(L):
        y_ref = gather_prefill_matmul(
            x, codes_all[li], cbs_all[li], sc_all[li], group=g
        )
        y = gather_prefill_matmul_indexed(
            x, codes_all, cbs_all, sc_all, li, group=g
        )
        assert _rel(y, y_ref) < 1e-2
    # grouped: two fused projections of out_f/2 each
    yg = gather_prefill_matmul_grouped_indexed(
        x, codes_all, cbs_all[:, None].repeat(2, 1)[:, :, :, :, :],
        sc_all, (out_f // 2, out_f // 2), 1, group=g,
    )
    y_ref = gather_prefill_matmul(x, codes_all[1], cbs_all[1], sc_all[1], group=g)
    assert _rel(yg, y_ref) < 1e-2
