"""Round-2 probe: gather-op microarchitecture for the LUT-GEMV redesign.

Questions (all rates in G gathers/s on the real v5e chip):
  P1  take_along_axis [1024,128] idx, 128-wide table rows (no halving)
  P2  take_along_axis, 256-wide rows (two halves + select)   [r1 baseline 62G/s]
  P3  bf16-pair packed 128-wide rows (gather f32, unpack by bit7 of idx)
  P4  shared-index jnp.take(table[8,128], idx[128], axis=1)  (one idx vector,
      8 sublanes of payload) — the batched-B and payload-gather primitive
  P5  shared-index on [8,256]
  P6  shared-index on [8,4096] (scaling of wide tables; 1x16 feasibility)
  P7  P1 + running accumulate (cross-sublane reduce) — reduction overhead
  P8  b-in-sublane LUT loop: per row r: take(lut[r] [8,128], codes[r] [128])
      + accumulate — the B<=8 batched decode inner loop at full shape

Anti-hoisting: a carry-derived zero is added to ONE (small) kernel operand
outside the kernel each step, so the pallas call depends on the chain carry
and XLA cannot lift it out of the fori_loop (timing.py docstring). The cost
of that add is <=0.5 MB of VPU traffic per step, noted per-probe.
"""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.utils.timing import chain_time

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)

R = 1024          # rows per block
ITERS = 8         # in-kernel iterations (idx buffers must fit VMEM)


def run(name, kernel, consts, n_gathers, out_shape=(R, 128), bias_arg=0):
    """bias_arg: index of the operand to make carry-dependent (pick smallest)."""
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(f)

    def step(c, cs):
        zero = (c[0:1, 0:1] * 0).astype(cs[bias_arg].dtype)  # carry-derived 0
        args = list(cs)
        args[bias_arg] = args[bias_arg] + zero
        return jf(*args)

    t = chain_time(step, jnp.zeros(out_shape, jnp.float32), n_steps=20, consts=consts)
    rate = n_gathers / t / 1e9
    print(f"{name}: {t*1e6:8.1f} us/call  {rate:8.1f} G/s", flush=True)
    return rate


# ---------------- P1: per-position idx, 128-wide table ----------------
def k_p1(idx_ref, tab_ref, out_ref):
    acc = jnp.zeros((R, 128), jnp.float32)
    for i in range(ITERS):
        idx = idx_ref[:, i * 128 : (i + 1) * 128]
        acc += jnp.take_along_axis(tab_ref[:], idx, axis=1)
    out_ref[:] = acc


idx1 = jax.random.randint(key, (R, ITERS * 128), 0, 128, jnp.int32)
tab128 = jax.random.normal(key, (R, 128), jnp.float32)
run("P1 per-pos 128-table ", k_p1, [idx1, tab128], R * 128 * ITERS, bias_arg=1)


# ---------------- P2: per-position idx, 256-wide (halving) ----------------
def k_p2(idx_ref, lo_ref, hi_ref, out_ref):
    acc = jnp.zeros((R, 128), jnp.float32)
    for i in range(ITERS):
        idx = idx_ref[:, i * 128 : (i + 1) * 128]
        lane = idx % 128
        g_lo = jnp.take_along_axis(lo_ref[:], lane, axis=1)
        g_hi = jnp.take_along_axis(hi_ref[:], lane, axis=1)
        acc += jnp.where(idx < 128, g_lo, g_hi)
    out_ref[:] = acc


idx2 = jax.random.randint(key, (R, ITERS * 128), 0, 256, jnp.int32)
run("P2 per-pos 256-table ", k_p2, [idx2, tab128, tab128], R * 128 * ITERS, bias_arg=1)


# ---------------- P3: bf16-pair packed 128-wide ----------------
# table f32 lane s packs (bf16 lut[s], bf16 lut[s+128]) as (hi16, lo16).
def k_p3(idx_ref, tab_ref, out_ref):
    acc = jnp.zeros((R, 128), jnp.float32)
    for i in range(ITERS):
        idx = idx_ref[:, i * 128 : (i + 1) * 128]
        lane = idx % 128
        g = jnp.take_along_axis(tab_ref[:], lane, axis=1)
        bits = jax.lax.bitcast_convert_type(g, jnp.int32)
        hi_val = bits & jnp.int32(-65536)              # top bf16 as f32 bits
        lo_val = bits << 16                             # bottom bf16 as f32 bits
        sel = jnp.where(idx < 128, hi_val, lo_val)
        acc += jax.lax.bitcast_convert_type(sel, jnp.float32)
    out_ref[:] = acc


run("P3 bf16-pack 256->128", k_p3, [idx2, tab128], R * 128 * ITERS, bias_arg=1)


# ---------------- P4/P5/P6: shared-index take ----------------
def mk_shared(width):
    def k(idx_ref, tab_ref, out_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for i in range(ITERS * 8):
            idx = idx_ref[0, i * 128 : (i + 1) * 128]
            acc += jnp.take(tab_ref[:], idx, axis=1)
        out_ref[:] = acc

    return k


for width, name in [(128, "P4 shared-idx 128"), (256, "P5 shared-idx 256"), (4096, "P6 shared-idx 4096")]:
    idxs = jax.random.randint(key, (1, ITERS * 8 * 128), 0, width, jnp.int32)
    tab = jax.random.normal(key, (8, width), jnp.float32)
    # n_gathers counts idx lookups (each yields 8 payload values)
    run(f"{name:21s}", mk_shared(width), [idxs, tab], 8 * ITERS * 128 * 8,
        out_shape=(8, 128), bias_arg=1)


# ---------------- P7: P1 + cross-sublane reduce ----------------
def k_p7(idx_ref, tab_ref, out_ref):
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(ITERS):
        idx = idx_ref[:, i * 128 : (i + 1) * 128]
        g = jnp.take_along_axis(tab_ref[:], idx, axis=1)
        acc += jnp.sum(g.reshape(R // 8, 8, 128), axis=0)
    out_ref[:] = acc


run("P7 P1+reduce         ", k_p7, [idx1, tab128], R * 128 * ITERS,
    out_shape=(8, 128), bias_arg=1)


# ---------------- P8: b-in-sublane batched LUT loop ----------------
# lut [R rows, 8 b, 128 s]; codes [R, 128 outs]; per row: shared-idx take
# gathers [8 b, 128 outs], accumulate over rows.
def k_p8(codes_ref, lut_ref, out_ref):
    def body(r, acc):
        idx = codes_ref[r]
        return acc + jnp.take(lut_ref[r], idx, axis=1)

    out_ref[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))


codes8 = jax.random.randint(key, (R, 128), 0, 128, jnp.int32)
lut8 = jax.random.normal(key, (R, 8, 128), jnp.float32)
run("P8 b-sublane LUT loop", k_p8, [codes8, lut8], R * 128 * 8,
    out_shape=(8, 128), bias_arg=0)
