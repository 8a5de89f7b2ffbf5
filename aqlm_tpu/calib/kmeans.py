"""Batched k-means for codebook initialization, in pure JAX.

TPU-native redesign of the reference k-means suite
(/root/reference/src/kmeans.py): `fit_kmeans` (:24-117, the residual-kmeans
workhorse for codebook init), `find_nearest_cluster` (:163-186) and the
sort-based 1-D `fit_kmeans_1d` (:189-277, used for scale / codebook-value
quantization).

Design differences from the reference:
- the assignment step is chunked with `lax.map` (static chunk shapes) instead
  of Python block loops; each chunk's scores are one MXU matmul
  `data @ clusters.T` using the same  -0.5||x-c||^2 = x.c - 0.5||c||^2  trick
  (reference :67-73);
- cluster statistics use `segment_sum` instead of index_reduce;
- convergence is a `lax.while_loop` predicate, so the whole fit compiles to a
  single XLA program (the reference re-launches kernels per iteration);
- data parallelism comes from sharding the points axis on the mesh (psum of
  segment sums), not manual per-device shards (reference :82-99).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fit_kmeans", "find_nearest_cluster", "fit_kmeans_1d"]


def _take_rows_safe(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] without the broadcast-index XLA gather on real TPUs.

    XLA's take/take_along_axis at multi-million-index scale crashes the v5e
    worker (experiments/dequant_crash_probe; the r5 full-scale 1x16 kmeans
    died inside fit_kmeans with a worker crash). The row-packed wide gather
    (ops/gather16) is the measured-safe gather class — pack rows into
    128-lane lines, gather whole lines, extract with a fused one-hot.
    Falls back to the plain gather on CPU or unpackable widths."""
    k, d = table.shape
    if jax.default_backend() == "cpu" or d > 128 or 128 % d or (k * d) % 128:
        return table[idx]
    from aqlm_tpu.ops.gather16 import _dequant_rows, pack_codebook_rows

    packed = pack_codebook_rows(table.astype(jnp.float32), d, dtype=jnp.float32)
    return _dequant_rows(idx.astype(jnp.int32), packed, d)


def _pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, jnp.ones((n,), jnp.float32)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    mask = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    return jnp.pad(x, widths), mask


_ASSIGN_CLUSTER_BLOCK = 8192


def _assign_chunked(data: jax.Array, clusters: jax.Array, chunk: int) -> jax.Array:
    """argmin_c ||x - c||^2 per point, computed as argmax(x.c - 0.5||c||^2).

    The cluster axis is additionally blocked at _ASSIGN_CLUSTER_BLOCK with a
    running (best, argbest) carried across blocks: a single [chunk, 65536]
    scores+argmax program CRASHES the v5e worker after ~tens of executions
    (experiments/kmeans_crash_probe variant B — the op that killed the
    full-scale 1x16 calibration), while block-width ops are the same shapes
    the 2x8 path runs everywhere. Identical result (ties resolve to the
    lowest index in both forms: argmax picks the first maximum and the
    cross-block merge only replaces on a strictly greater score)."""
    n, d = data.shape
    k = clusters.shape[0]
    half_sq = 0.5 * jnp.sum(clusters * clusters, axis=1)  # [k]
    chunks = data.reshape(n // chunk, chunk, d)

    if k <= _ASSIGN_CLUSTER_BLOCK:
        def one(chunk_data):
            scores = (
                jax.lax.dot_general(
                    chunk_data,
                    clusters,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                - half_sq[None, :]
            )
            return jnp.argmax(scores, axis=1).astype(jnp.int32)

        return jax.lax.map(one, chunks).reshape(n)

    cb = _ASSIGN_CLUSTER_BLOCK
    kp = -(-k // cb) * cb
    cl = jnp.pad(clusters, ((0, kp - k), (0, 0)))
    # padded clusters can never win: +inf half-norm -> -inf score
    hs = jnp.pad(half_sq, (0, kp - k), constant_values=jnp.inf)
    cl_blocks = cl.reshape(kp // cb, cb, d)
    hs_blocks = hs.reshape(kp // cb, cb)
    bases = (jnp.arange(kp // cb, dtype=jnp.int32) * cb)

    def one(chunk_data):
        def blk(carry, xs):
            best_v, best_i = carry
            cl_b, hs_b, base = xs
            scores = (
                jax.lax.dot_general(
                    chunk_data, cl_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                - hs_b[None, :]
            )
            v = jnp.max(scores, axis=1)
            i = jnp.argmax(scores, axis=1).astype(jnp.int32) + base
            upd = v > best_v
            return (jnp.where(upd, v, best_v), jnp.where(upd, i, best_i)), None

        init = (
            jnp.full((chunk_data.shape[0],), -jnp.inf, jnp.float32),
            jnp.zeros((chunk_data.shape[0],), jnp.int32),
        )
        (_best_v, best_i), _ = jax.lax.scan(blk, init, (cl_blocks, hs_blocks, bases))
        return best_i

    return jax.lax.map(one, chunks).reshape(n)


@partial(jax.jit, static_argnames=("k", "max_iter", "check_every", "chunk", "greedy_init"))
def fit_kmeans(
    data: jax.Array,
    k: int,
    *,
    key: jax.Array | None = None,
    max_iter: int = 100,
    check_every: int = 10,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    chunk: int = 1024,
    greedy_init: bool = False,
):
    """K-means on [nsamples, dim] data; returns (clusters, indices, restored).

    Matches the contract of reference fit_kmeans (/root/reference/src/kmeans.py:24-46):
    clusters [k, dim] float32, indices [nsamples] int32, restored [nsamples, dim].
    Empty clusters keep their previous centroid (reference :96-97).
    """
    data = data.astype(jnp.float32)
    n, d = data.shape
    if key is None:
        key = jax.random.PRNGKey(0)

    if greedy_init:
        clusters0 = _greedy_init(data, k)
    else:
        perm = jax.random.choice(key, n, shape=(k,), replace=n < k)
        clusters0 = _take_rows_safe(data, perm)

    padded, mask = _pad_to_multiple(data, chunk)
    npad = padded.shape[0]

    def em_step(clusters):
        idx = _assign_chunked(padded, clusters, chunk)
        sums = jax.ops.segment_sum(padded * mask[:, None], idx, num_segments=k)
        counts = jax.ops.segment_sum(mask, idx, num_segments=k)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], clusters)
        return new

    def cond(state):
        clusters, prev, i, done = state
        return (~done) & (i < max_iter)

    def body(state):
        clusters, prev, i, done = state
        new = em_step(clusters)
        check = (i % check_every) == (check_every - 1)
        converged = check & jnp.all(jnp.abs(new - clusters) <= atol + rtol * jnp.abs(clusters))
        return new, clusters, i + 1, converged

    clusters, _, _, _ = jax.lax.while_loop(
        cond, body, (clusters0, clusters0, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    )

    idx = _assign_chunked(padded, clusters, chunk)[:n]
    return clusters, idx, _take_rows_safe(clusters, idx)


def _greedy_init(data: jax.Array, k: int) -> jax.Array:
    """Farthest-point init (reference _kmeans_greedy_init, kmeans.py:10-20)."""
    n, d = data.shape
    norms = jnp.sum(data * data, axis=1)

    def body(i, state):
        clusters, running_min = state
        pick = data[jnp.argmax(running_min)]
        dist = norms - 2.0 * (data @ pick) + jnp.sum(pick * pick)
        clusters = clusters.at[i].set(pick)
        return clusters, jnp.minimum(running_min, dist)

    clusters = jnp.zeros((k, d), jnp.float32)
    running_min = jnp.full((n,), jnp.inf, jnp.float32)
    clusters, _ = jax.lax.fori_loop(0, k, body, (clusters, running_min))
    return clusters


@partial(jax.jit, static_argnames=("chunk",))
def find_nearest_cluster(data: jax.Array, clusters: jax.Array, *, chunk: int = 1024):
    """(indices, restored) for fixed clusters (reference kmeans.py:163-186)."""
    data = data.astype(jnp.float32)
    n = data.shape[0]
    padded, _ = _pad_to_multiple(data, chunk)
    idx = _assign_chunked(padded, clusters.astype(jnp.float32), chunk)[:n]
    return idx, _take_rows_safe(clusters.astype(jnp.float32), idx)


# ---------------------------------------------------------------------------
# sort-based 1-D k-means (for scale and codebook-value quantization)
# ---------------------------------------------------------------------------


def _border_indices(clusters: jax.Array, sorted_data: jax.Array) -> jax.Array:
    """[G, k+1] first-index-of-cluster borders via midpoint searchsorted."""
    mids = 0.5 * (clusters[:, 1:] + clusters[:, :-1])
    g = clusters.shape[0]
    neg = jnp.full((g, 1), -jnp.inf, clusters.dtype)
    pos = jnp.full((g, 1), jnp.inf, clusters.dtype)
    borders = jnp.concatenate([neg, mids, pos], axis=1)
    return jax.vmap(lambda s, b: jnp.searchsorted(s, b, side="left"))(sorted_data, borders)


@partial(jax.jit, static_argnames=("k", "max_iter", "offset_rate"))
def fit_kmeans_1d(
    groupwise_data: jax.Array,
    k: int,
    *,
    max_iter: int = 100,
    offset_rate: float = 0.0,
    rtol: float = 1e-6,
    atol: float = 1e-8,
):
    """Exact-EM 1-D k-means per group via sort + prefix sums.

    Reference: fit_kmeans_1d (/root/reference/src/kmeans.py:189-277). Input
    [num_groups, group_size]; returns (clusters [G, k], indices [G, group_size],
    restored [G, group_size]).
    """
    assert groupwise_data.ndim == 2
    data = groupwise_data.astype(jnp.float32)
    g, n = data.shape

    order = jnp.argsort(data, axis=1)
    sorted_data = jnp.take_along_axis(data, order, axis=1)
    ranks_1based = jnp.argsort(order, axis=1) + 1  # rank of each original elem

    cumsum = jnp.concatenate(
        [jnp.zeros((g, 1), jnp.float32), jnp.cumsum(sorted_data, axis=1)], axis=1
    )

    offset = int((n - 1) * offset_rate)
    init_idx = jnp.linspace(offset, n - 1 - offset, k).round().astype(jnp.int32)
    clusters0 = sorted_data[:, init_idx]

    def em(clusters):
        borders = _border_indices(clusters, sorted_data)
        sums = jnp.diff(jnp.take_along_axis(cumsum, borders, axis=1), axis=1)
        counts = jnp.diff(borders, axis=1)
        fallback = jnp.take_along_axis(
            sorted_data, jnp.clip(borders[:, :-1], 0, n - 1), axis=1
        )
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), fallback)

    def cond(state):
        clusters, i, done = state
        return (~done) & (i < max_iter)

    def body(state):
        clusters, i, done = state
        new = em(clusters)
        converged = jnp.all(jnp.abs(new - clusters) <= atol + rtol * jnp.abs(clusters))
        return new, i + 1, converged

    clusters, _, _ = jax.lax.while_loop(
        cond, body, (clusters0, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    )

    borders = _border_indices(clusters, sorted_data)
    indices = jax.vmap(lambda b, r: jnp.searchsorted(b, r, side="left"))(
        borders[:, 1:], ranks_1based
    ).astype(jnp.int32)
    restored = jnp.take_along_axis(clusters, indices, axis=1)
    return clusters, indices, restored
