"""Probe 5: Pallas gather microbenchmarks — find the fastest on-chip gather.

Variants:
  V1: jnp.take_along_axis(table[R,128], idx[N,128], axis=0)   (row gather)
  V2: table_ref[idx] basic indexing
  V3: per-lane gather with lane-replicated table (vgather semantics)
  V4: chained in-kernel gathers to get raw rate (no HBM effects)
"""

import sys, time, functools

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aqlm_tpu.utils.timing import chain_time

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)

R, N = 4096, 4096  # table rows, gathers per call


def try_variant(name, build):
    try:
        f, check = build()
        ok = check()
        # rate: chain the kernel on itself via data dependence
        t = chain_time(f[0], f[1], n_steps=20, n_repeats=2)
        print(f"{name}: {t*1e6:9.1f} us/call  correct={ok}  -> {N/t/1e6:9.1f} M gathers/s", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


table = jax.random.normal(key, (R, 128), jnp.float32)
idx0 = jax.random.randint(key, (N,), 0, R, jnp.int32)


# V1: take_along_axis with materialized 2D indices
def build_v1():
    def kernel(idx_ref, table_ref, out_ref):
        ids = idx_ref[:] + jnp.zeros((N, 128), jnp.int32)  # materialize broadcast
        out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)

    def call(idx2d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2d, table)

    idx2d = jnp.broadcast_to(idx0[:, None], (N, 128)).astype(jnp.int32)

    def step(i2):
        out = call(i2)
        return (i2 + out[:, :1].astype(jnp.int32)) % R

    def check():
        out = call(idx2d)
        return np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx0)])

    return (step, idx2d), check


# V2: basic indexing table_ref[idx_vec]
def build_v2():
    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:], :]

    def call(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    def step(idx):
        out = call(idx)
        return (idx + out[:, 0].astype(jnp.int32)) % R

    def check():
        out = call(idx0)
        return np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx0)])

    return (step, idx0), check


# V3: per-lane gather, replicated small table (S=2048 values -> [2048,128])
def build_v3():
    S = 2048
    small = jax.random.normal(key, (S,), jnp.float32)
    tbl = jnp.broadcast_to(small[:, None], (S, 128))
    lidx0 = jax.random.randint(key, (512, 128), 0, S, jnp.int32)

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    def call(lidx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lidx, tbl)

    def step(lidx):
        out = call(lidx)
        return (lidx + out.astype(jnp.int32)) % S

    def check():
        out = call(lidx0)
        ref = np.asarray(small)[np.asarray(lidx0)]
        return np.allclose(np.asarray(out), ref)

    return (step, lidx0), check


# V3b: per-lane gather from an 8-sublane table (single tile) — hw sweet spot?
def build_v3b():
    S = 8
    small = jax.random.normal(key, (S, 128), jnp.float32)
    lidx0 = jax.random.randint(key, (512, 128), 0, S, jnp.int32)

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    def call(lidx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lidx, small)

    def step(lidx):
        out = call(lidx)
        return (lidx + out.astype(jnp.int32)) % S

    def check():
        out = call(lidx0)
        ref = np.take_along_axis(
            np.asarray(small), np.asarray(lidx0) % S, axis=0
        )  # per-lane semantic
        return np.allclose(np.asarray(out), ref)

    return (step, lidx0), check


# V4: lane gather along axis=1 (128-entry table per row)
def build_v4():
    lidx0 = jax.random.randint(key, (512, 128), 0, 128, jnp.int32)
    rows = jax.random.normal(key, (512, 128), jnp.float32)

    def kernel(idx_ref, rows_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=1)

    def call(lidx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lidx, rows)

    def step(lidx):
        out = call(lidx)
        return (lidx + out.astype(jnp.int32)) % 128

    def check():
        out = call(lidx0)
        ref = np.take_along_axis(np.asarray(rows), np.asarray(lidx0), axis=1)
        return np.allclose(np.asarray(out), ref)

    return (step, lidx0), check


try_variant("V1 row take_along_axis [4096,128]", build_v1)
try_variant("V2 basic indexing table[idx]", build_v2)
try_variant("V3 per-lane gather, 2048-sublane replicated", build_v3)
try_variant("V3b per-lane gather, 8-sublane tile", build_v3b)
try_variant("V4 lane gather axis=1 (128 wide)", build_v4)

# XLA reference rate at identical shape
def xla_step(idx):
    out = jnp.take(table, idx, axis=0)
    return (idx + out[:, 0].astype(jnp.int32)) % R

t = chain_time(xla_step, idx0, n_steps=20, n_repeats=2)
print(f"XLA same-shape row gather: {t*1e6:9.1f} us/call -> {N/t/1e6:9.1f} M gathers/s", flush=True)
