"""Pure codes-streaming rate vs block row length (DMA granularity probe).

A trivial kernel sums uint8 code blocks over the lut_gemv grid shapes:
  A: [L, NT, KIG, 512]  (current tiled layout: 512-byte rows)
  B: [L, NT4, KIG, 2048] (padded tn=2048: 2048-byte rows)
  C: [L, NT, KIG//4, 2048] (row-fused reshape of A's buffer: same bytes,
     rows 4x longer — valid when kr covers whole tiles)
Chained with layer idx cycling so every step streams cold codes.
"""

import sys, functools

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqlm_tpu.utils.timing import chain_time

print("backend:", jax.default_backend(), flush=True)
L, KIG, OUT = 8, 1024, 11264  # gate-ish, 11264 = 22*512 = 5.5*2048 -> use 12288 for B
key = jax.random.PRNGKey(0)


def stream_rate(name, arr, kr):
    Ld, nt, rows, tn = arr.shape

    def kern(idx_ref, c_ref, out_ref, acc_ref):
        r = pl.program_id(1)

        @pl.when((r == 0) & (pl.program_id(0) == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.sum(c_ref[0, 0].astype(jnp.int32), axis=0, keepdims=True)[:, :128].astype(jnp.float32)

        @pl.when((r == pl.num_programs(1) - 1) & (pl.program_id(0) == pl.num_programs(0) - 1))
        def _():
            out_ref[:] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, rows // kr),
        in_specs=[pl.BlockSpec((1, 1, kr, tn), lambda o, r, li: (li[0], o, r, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda o, r, li: (0, 0)),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
    )
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    jf = jax.jit(lambda li, a: f(li.reshape(1), a))

    def step(c, cs):
        li = c[0, 0].astype(jnp.int32) % jnp.int32(Ld)  # counter cycles layers
        return c + 1.0 + jf(li, cs[0]) * 1e-30

    t = chain_time(step, jnp.zeros((1, 128), jnp.float32), n_steps=256, consts=[arr])
    nbytes = nt * rows * tn
    print(f"{name}: {t*1e6:8.1f} us/layer-stream  {nbytes/t/1e9:7.1f} GB/s", flush=True)


a512 = jax.random.randint(key, (L, OUT // 512, KIG, 512), 0, 255, jnp.int32).astype(jnp.uint8)
stream_rate("A tn=512  kr=1024", a512, 1024)
b2048 = jax.random.randint(key, (L, 12288 // 2048, KIG, 2048), 0, 255, jnp.int32).astype(jnp.uint8)
stream_rate("B tn=2048 kr=1024", b2048, 1024)
c_fused = a512.reshape(L, OUT // 512, KIG // 4, 2048)
stream_rate("C rowfuse 512->2048", c_fused, 256)
