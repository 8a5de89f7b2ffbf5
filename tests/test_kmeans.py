"""K-means tests: recovery on separable data, assignment optimality, and the
sort-based 1-D variant vs a brute-force Lloyd reference."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.calib.kmeans import find_nearest_cluster, fit_kmeans, fit_kmeans_1d


def _make_blobs(key, k, n_per, d, spread=0.02):
    kc, kn = jax.random.split(key)
    centers = jax.random.normal(kc, (k, d)) * 3.0
    noise = jax.random.normal(kn, (k, n_per, d)) * spread
    return (centers[:, None, :] + noise).reshape(k * n_per, d), centers


def test_fit_kmeans_recovers_blobs(key):
    data, centers = _make_blobs(key, k=8, n_per=64, d=4)
    clusters, idx, restored = fit_kmeans(data, 8, key=jax.random.PRNGKey(1), max_iter=50)
    # every point lands within spread of its restored centroid
    err = np.max(np.linalg.norm(np.asarray(data - restored), axis=1))
    assert err < 0.15, err
    # each found cluster is close to a true center
    d2 = np.linalg.norm(np.asarray(clusters)[:, None, :] - np.asarray(centers)[None], axis=-1)
    assert d2.min(axis=1).max() < 0.1


def test_assignments_are_nearest(key):
    data = jax.random.normal(key, (300, 6))
    clusters, idx, _ = fit_kmeans(data, 10, key=jax.random.PRNGKey(2), max_iter=20)
    d2 = np.linalg.norm(np.asarray(data)[:, None, :] - np.asarray(clusters)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))


def test_find_nearest_cluster(key):
    data = jax.random.normal(key, (100, 3))
    clusters = jax.random.normal(jax.random.PRNGKey(5), (7, 3))
    idx, restored = find_nearest_cluster(data, clusters)
    d2 = np.linalg.norm(np.asarray(data)[:, None, :] - np.asarray(clusters)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))
    np.testing.assert_allclose(np.asarray(restored), np.asarray(clusters)[d2.argmin(1)])


def _lloyd_1d(data_row, k, max_iter=100):
    """Naive 1-D Lloyd with the same percentile init, for cross-checking."""
    srt = np.sort(data_row)
    clusters = srt[np.round(np.linspace(0, len(srt) - 1, k)).astype(int)].astype(np.float64)
    for _ in range(max_iter):
        d2 = np.abs(data_row[:, None] - clusters[None, :])
        idx = d2.argmin(1)
        new = clusters.copy()
        for c in range(k):
            if (idx == c).any():
                new[c] = data_row[idx == c].mean()
        if np.allclose(new, clusters, rtol=1e-6, atol=1e-8):
            break
        clusters = new
    return clusters, idx


def test_fit_kmeans_1d_matches_lloyd(key):
    g, n, k = 5, 256, 8
    data = np.asarray(jax.random.normal(key, (g, n)), np.float64)
    clusters, idx, restored = fit_kmeans_1d(jnp.asarray(data, jnp.float32), k)
    clusters, idx, restored = map(np.asarray, (clusters, idx, restored))
    for gi in range(g):
        ref_c, ref_idx = _lloyd_1d(data[gi], k)
        # same MSE (cluster label permutation allowed; 1-D kmeans is order-preserving)
        mse_ours = np.mean((restored[gi] - data[gi]) ** 2)
        mse_ref = np.mean((ref_c[ref_idx] - data[gi]) ** 2)
        assert mse_ours <= mse_ref * 1.05 + 1e-8
        # restored values are actual cluster centers, in sorted order semantics
        np.testing.assert_allclose(restored[gi], clusters[gi][idx[gi]], rtol=1e-6)


def test_fit_kmeans_1d_exact_k_equals_n(key):
    """With k == group_size each point becomes its own cluster -> zero error."""
    data = jax.random.normal(key, (3, 16))
    _, _, restored = fit_kmeans_1d(data, 16)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(data), atol=1e-6)


def test_take_rows_safe_packed_matches_gather():
    """The TPU-safe row-packed gather branch (the kmeans/beam crash
    mitigation) == the plain table[idx] gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aqlm_tpu.ops.gather16 import _dequant_rows, pack_codebook_rows

    rng = np.random.default_rng(0)
    for k, d in ((512, 8), (64, 16), (4096, 8)):
        table = jnp.asarray(rng.standard_normal((k, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, k, 3000), jnp.int32)
        packed = pack_codebook_rows(table, d, dtype=jnp.float32)
        got = _dequant_rows(idx, packed, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(table[idx]),
                                   rtol=1e-6, atol=1e-6)


def test_assign_cluster_blocked_matches_plain(monkeypatch):
    """Cluster-axis-blocked assignment (the 65536-cluster crash mitigation)
    == the single-program argmax, including tie resolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aqlm_tpu.calib import kmeans as km

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2048, 8)), jnp.float32)
    clusters = jnp.asarray(rng.standard_normal((600, 8)), jnp.float32)
    # duplicate rows to exercise tie handling across block boundaries
    clusters = clusters.at[300:].set(clusters[:300])
    plain = km._assign_chunked(data, clusters, 512)
    monkeypatch.setattr(km, "_ASSIGN_CLUSTER_BLOCK", 128)
    blocked = km._assign_chunked(data, clusters, 512)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(blocked))
