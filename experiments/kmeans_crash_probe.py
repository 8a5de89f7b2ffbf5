"""Isolate the op that crashes the v5e worker inside full-scale 1x16 kmeans.

r5 queue step 5 (calib_fullscale 1x16, 5.6M groups x 65536 clusters) died
with "TPU worker process crashed or restarted" somewhere inside
fit_kmeans after ~45 min of silence. Suspects, each run in its own process
(argv[1]) for n (argv[2], default past the ~33-64 crash threshold) chained
executions:

  C  segment_sum of [G, 8] into 65536 segments (the em_step stats scatter)
  D  row gather clusters[idx]: 5.6M axis-0 takes from a [65536, 8] table
  B  the chunked assign (scores matmul + argmax), one em iteration's worth
  A  full em_step (assign + 2 segment_sums + where)
  E  jax.random.choice(5.6M, (65536,), replace=False) (sort-based)
  F  fit_kmeans end-to-end with max_iter=8 (sanity once A-E pass)

Run: python experiments/kmeans_crash_probe.py {C|D|B|A|E|F} [n]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aqlm_tpu.calib.kmeans import _assign_chunked, _pad_to_multiple, fit_kmeans

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "C"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 96
G, D_, K = 5_636_096, 8, 65536
if os.environ.get("AQLM_PROBE_TINY"):
    G, K, N = 20_000, 512, 4

key = jax.random.PRNGKey(0)
data = jax.random.normal(key, (G, D_), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (G,), 0, K, jnp.int32)
clusters0 = jax.random.normal(jax.random.PRNGKey(2), (K, D_), jnp.float32)
print(f"backend: {jax.default_backend()}  variant={VARIANT} n={N} "
      f"G={G} K={K}", flush=True)


def chain(fn, carry, n):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c), c)

    t0 = time.time()
    out = jax.device_get(jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), run(carry)))
    print(f"{VARIANT}: {n} executions OK in {time.time()-t0:.1f}s "
          f"(checksum {out})", flush=True)


def dep_idx(i, c):
    s = jnp.sum(c.astype(jnp.float32))
    z = jnp.where(jnp.isfinite(s), 0, 1).astype(jnp.int32)
    return (idx0 + z) % K


if VARIANT == "C":
    def body(c):
        i = dep_idx(0, c)
        return jax.ops.segment_sum(data + c[0, 0] * 1e-30, i, num_segments=K)
    chain(body, jnp.zeros((K, D_), jnp.float32), N)
elif VARIANT == "D":
    def body(c):
        i = dep_idx(0, c)
        g = jnp.take(c, i, axis=0)  # [G, 8]: the suspect row gather
        return c + g[:K] * 1e-30
    chain(body, clusters0, N)
elif VARIANT == "B":
    padded, _m = _pad_to_multiple(data, 1024)

    def body(c):
        i = _assign_chunked(padded + c[0, 0] * 1e-30, c, 1024)
        return c + (i.sum().astype(jnp.float32) * 1e-30)
    chain(body, clusters0, N)
elif VARIANT == "A":
    padded, _m = _pad_to_multiple(data, 1024)
    Gp = padded.shape[0]

    def body(c):
        i = _assign_chunked(padded + c[0, 0] * 1e-30, c, 1024)
        sums = jax.ops.segment_sum(padded, i, num_segments=K)
        counts = jax.ops.segment_sum(jnp.ones((Gp,), jnp.float32), i, num_segments=K)
        return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], c)
    chain(body, clusters0, N)
elif VARIANT == "E":
    for rep in range(N):
        k2 = jax.random.PRNGKey(100 + rep)
        perm = jax.device_get(jax.random.choice(k2, G, shape=(K,), replace=False))
        print(f"E rep {rep} ok ({perm[:2]})", flush=True)
        if rep >= 3:
            break
    print(f"E: OK", flush=True)
elif VARIANT == "F":
    t0 = time.time()
    clusters, idx, restored = fit_kmeans(data, K, max_iter=8)
    jax.block_until_ready(restored)
    print(f"F: fit_kmeans(max_iter=8) OK in {time.time()-t0:.1f}s", flush=True)
print("DONE", flush=True)
