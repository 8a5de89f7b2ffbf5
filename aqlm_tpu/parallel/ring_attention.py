"""Ring attention: causal attention with the sequence sharded over the mesh.

The reference has no long-context machinery at all (SURVEY.md §5.7 —
`--model_seqlen` is a fixed 4k/8k and attention is delegated to HF). On TPU
the idiomatic >8k design shards the TOKENS of q/k/v over a mesh axis and
rotates the K/V shards around the ring with `ppermute`, accumulating online
softmax per hop — compute overlaps the ICI transfer and no device ever
holds more than its sequence shard of K/V.

`ring_attention` is the shard_map-local function (q/k/v sharded on the
sequence axis, heads replicated); `sequence_parallel_attention` wraps it for
callers holding global arrays. GQA is handled the same way as
models/common.attention (kv heads broadcast over query groups).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "sequence_parallel_attention"]

_NEG = -1e30


def ring_attention(q, k, v, *, axis_name: str, scale: float | None = None):
    """Causal attention with q/k/v sharded along tokens on `axis_name`.

    q: [B, Tq_local, Hq, D]; k/v: [B, Tk_local, Hkv, D]; shard i holds global
    tokens [i*T_local, (i+1)*T_local). Returns [B, Tq_local, Hq, D].
    One ppermute per hop moves the (k, v) block to the next device while the
    current block's scores accumulate (online softmax, f32 state).
    """
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    rep = hq // hkv
    if scale is None:
        scale = d ** -0.5
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    qf = (q.astype(jnp.float32) * scale).reshape(b, tq, hkv, rep, d)
    q_pos = my * tq + jnp.arange(tq)

    acc = jnp.zeros((b, tq, hkv, rep, d), jnp.float32)
    m = jnp.full((b, tq, hkv, rep), _NEG, jnp.float32)
    l = jnp.zeros((b, tq, hkv, rep), jnp.float32)

    def hop(i, carry):
        acc, m, l, k_blk, v_blk, src = carry
        k_pos = src * k_blk.shape[1] + jnp.arange(k_blk.shape[1])
        logits = jnp.einsum(
            "bqhrd,bkhd->bqhrk", qf, k_blk.astype(jnp.float32)
        )
        causal = (k_pos[None, :] <= q_pos[:, None])[None, :, None, None, :]
        logits = jnp.where(causal, logits, _NEG)

        blk_max = jnp.max(logits, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        correction = jnp.exp(m - new_m)
        p = jnp.exp(logits - new_m[..., None])
        l = l * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[..., None] + jnp.einsum(
            "bqhrk,bkhd->bqhrd", p, v_blk.astype(jnp.float32)
        )
        m = new_m

        # rotate the block to the next device; its global offset travels too
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        src = jax.lax.ppermute(src, axis_name, perm)
        return acc, m, l, k_blk, v_blk, src

    acc, m, l, *_ = jax.lax.fori_loop(0, n, hop, (acc, m, l, k, v, my))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    # fully-masked rows (no keys yet) produce zeros
    out = jnp.where((l > 0)[..., None], out, 0.0)
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def sequence_parallel_attention(q, k, v, mesh: Mesh, *, axis: str = "model"):
    """Global-array wrapper: shards tokens over `axis`, runs ring_attention.

    q: [B, T, Hq, D], k/v: [B, T, Hkv, D] with T divisible by the axis size.
    """
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis, None, None),) * 3,
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    spec = NamedSharding(mesh, P(None, axis, None, None))
    return fn(
        jax.device_put(q, spec), jax.device_put(k, spec), jax.device_put(v, spec)
    )
