"""Experimental Pallas extraction kernels for the 1x16 codes path.

Both variants are CORRECT but LOSE to the fused-XLA one-hot-16 extraction
(16.5 ms/layer honest): the XLA gather feeding an opaque pallas input must
fully materialize the [N, 128] rows (1.4 GB), which the fused XLA graph
partially avoids. naive [N, group] outputs additionally waste 15/16 of
store bandwidth (29.7 ms); the 128-lane packed variant fixes stores but
still measures 23 ms. Kept for a future fused gather+extract design.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_kernel(rows_ref, off_ref, r_ref, out_ref, *, per_row, group):
    """[tN, 128] gathered rows + entry offsets -> [tN, group] entries.

    mask out everything but the selected entry's lanes (VPU compare+mul),
    then compact 128 lanes -> group with a constant [128, group] matmul.
    Reads the gathered rows exactly once — XLA's lowering of the same
    extraction materializes them twice (measured 16.5 -> ~4.5 ms/layer)."""
    rows = rows_ref[:]
    lane_entry = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) // group
    mask = (lane_entry == off_ref[:].reshape(-1, 1)).astype(rows.dtype)
    out_ref[:] = jax.lax.dot_general(
        rows * mask, r_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _extract16(rows, off, *, group, interpret):
    """rows [N, 128] bf16, off [N] int32 (entry index within row) -> [N, group]."""
    n = rows.shape[0]
    per_row = 128 // group
    tn = 1024
    assert n % tn == 0, n
    # constant compaction matrix: R[l, j] = 1 where l % group == j
    r = (jnp.arange(128)[:, None] % group == jnp.arange(group)[None, :]).astype(jnp.bfloat16)
    kern = functools.partial(_extract_kernel, per_row=per_row, group=group)
    return pl.pallas_call(
        kern,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, group), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, group), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group), jnp.bfloat16),
        interpret=interpret,
    )(rows, off, r)


def _extract_packed_kernel(rows_ref, off_ref, r_ref, out_ref, *, group):
    """[tm, 16, 128] gathered rows -> [tm, 128] packed extracted entries.

    Row j of each 16-row pack contributes its selected `group` lanes to
    output lanes [group*j, group*(j+1)): mask the selected entry (VPU),
    then route lanes with a constant permutation matmul R_j (MXU). Output
    rows are full 128 lanes, so stores run at full bandwidth — the naive
    [N, group] output wasted 15/16 of store bandwidth."""
    per_pack = 128 // group  # 16 rows per output row
    acc = jnp.zeros((rows_ref.shape[0], 128), jnp.float32)
    lane_entry = None
    for j in range(per_pack):
        rj = rows_ref[:, j, :]
        if lane_entry is None:
            lane_entry = jax.lax.broadcasted_iota(jnp.int32, rj.shape, 1) // group
        mask = (lane_entry == off_ref[:, j].reshape(-1, 1)).astype(rj.dtype)
        acc += jax.lax.dot_general(
            rj * mask, r_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _extract16_packed(rows, off, *, group, interpret):
    """rows [N, 128] bf16, off [N] int32 -> [N*group/128, 128] packed entries
    (entry n occupies lanes [group*(n%16), ...) of output row n//16)."""
    n = rows.shape[0]
    per_pack = 128 // group
    m = n // per_pack
    tm = 512
    assert m % tm == 0, m
    # R[j, l, t] = 1 where t == group*j + l % group
    l = jnp.arange(128)
    r = jnp.stack(
        [(l[:, None] % group + group * j == jnp.arange(128)[None, :]) for j in range(per_pack)]
    ).astype(jnp.bfloat16)  # [16, 128, 128]
    kern = functools.partial(_extract_packed_kernel, group=group)
    return pl.pallas_call(
        kern,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, per_pack, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, per_pack), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((per_pack, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.bfloat16),
        interpret=interpret,
    )(rows.reshape(m, per_pack, 128), off.reshape(m, per_pack), r)


