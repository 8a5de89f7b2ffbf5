"""On-chip check + timing for the W4A16 int4 kernel.

1) Mosaic compile + correctness vs the dequant oracle at Llama-2-7B
   gate_proj shape (bench.py's int4 section depends on this kernel).
2) Chained per-layer decode time: int4 vs int8 at the same shape — the
   expected win is the halved weight DMA (int8 measured 750-950 GB/s,
   DMA-bound; int4 moves half the bytes but spends ~5 VPU ops/byte
   unpacking, so the result arbitrates DMA-bound vs VPU-bound).

Run on the axon tunnel, ONE process at a time (NOTES.md).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.ops.int4_matmul import dequantize_int4, int4_matmul_indexed, quantize_int4
from aqlm_tpu.ops.int8_matmul import int8_matmul_indexed
from aqlm_tpu.utils.timing import chain_time

OUT = int(sys.argv[1]) if len(sys.argv) > 1 else 11008  # gate_proj default
IN = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
L = 4  # a few distinct layers to cycle

print(f"backend: {jax.default_backend()}")

key = jax.random.PRNGKey(0)
dense = jax.random.normal(key, (OUT, IN), jnp.float32) * 0.02
w4, gs = quantize_int4(dense)
x = jax.random.normal(jax.random.PRNGKey(1), (1, IN), jnp.float32).astype(jnp.bfloat16)

# -- correctness on chip ------------------------------------------------------
w4a = jnp.stack([w4] * L)
gsa = jnp.stack([gs] * L)
y = int4_matmul_indexed(x, w4a, gsa, 0)
deq = dequantize_int4(w4, gs)
ref = (x.astype(jnp.float32) @ deq[:, :IN].T)
rel = float(jnp.linalg.norm(y.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
assert rel < 2e-2, rel
print(f"INT4_OK on chip (rel err vs oracle {rel:.2e})")

# -- timing: int4 vs int8, layer-indexed, chained -----------------------------
amax = jnp.max(jnp.abs(dense), axis=1, keepdims=True)
w8 = jnp.round(dense / jnp.maximum(amax, 1e-12) * 127.0).astype(jnp.int8)
w8a = jnp.stack([w8] * L)
s8a = jnp.stack([(amax / 127.0).reshape(-1)] * L)

for name, fn, consts in (
    ("int4", lambda xx, i, cs: int4_matmul_indexed(xx, cs[0], cs[1], i % L), (w4a, gsa)),
    ("int8", lambda xx, i, cs: int8_matmul_indexed(xx, cs[0], cs[1], i % L), (w8a, s8a)),
):
    def step(carry, cs):
        xx, i = carry
        y = fn(xx, i, cs)
        # feed a normalized slice of the output back as the next input so the
        # chain is data-dependent (no hoisting)
        nxt = (y[:, :IN] * 1e-3).astype(xx.dtype)
        return (nxt, (i + 1) % L)

    # 64 steps of a ~50 us op is ~3 ms of signal against ~30 ms of tunnel
    # roundtrip noise (the r2 run read int8 as 0.0 us/call); 1024 steps puts
    # the chain at ~50 ms, an order of magnitude above the noise floor.
    t = chain_time(step, (x, jnp.asarray(0, jnp.int32)), n_steps=1024, n_repeats=5, consts=consts)
    gb = (OUT * IN * (0.5 if name == "int4" else 1.0)) / 1e9
    print(f"{name}: {t * 1e6:7.1f} us/call  ({gb / t:.0f} GB/s effective weight read)")
