"""On-chip probe: windowed tile skip in the flash decode kernel.

Mistral-7B-shaped stacked int8 KV cache (32 layers, 8 kv heads, d=128) at a
context longer than the 4096-key sliding window. Measures per-layer flash
attention time with window=None (full-cache read) vs window=4096 (grid visits
only ceil(window/ts)+1 tiles). The expected win is the skipped HBM traffic:
at S=8192 the windowed grid reads ~9/16 of the cache.

Run on the real chip (axon tunnel), ONE process at a time (NOTES.md).
Usage: python experiments/window_flash_probe.py [S] [WINDOW]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aqlm_tpu.ops.flash_decode import flash_decode_attention_indexed
from aqlm_tpu.utils.timing import chain_time

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
WINDOW = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
L, B, HQ, HKV, D = 32, 1, 32, 8, 128

print(f"backend: {jax.default_backend()}  S={S} window={WINDOW}")

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, 1, HQ, D), jnp.float32).astype(jnp.bfloat16)
k_all = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
v_all = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
ks = jnp.full((L, B, HKV, S, 1), 0.02, jnp.float32)
vs = jnp.full((L, B, HKV, S, 1), 0.02, jnp.float32)
lengths = jnp.full((B,), S, jnp.int32)  # window binds maximally

consts = (k_all, v_all, ks, vs)

for name, window in (("full", None), (f"window={WINDOW}", WINDOW)):
    def step(carry, cs):
        qq, li = carry
        out = flash_decode_attention_indexed(
            qq, cs[0], cs[1], cs[2], cs[3], li % L, lengths, window=window
        )
        # data-dependent carry: feed the output back into q so XLA cannot
        # hoist the attention out of the chained loop
        return (out.astype(qq.dtype), (li + 1) % L)

    t = chain_time(step, (q, jnp.asarray(0, jnp.int32)), n_steps=64, consts=consts)
    print(f"{name:>14}: {t * 1e6:8.1f} us/layer  ({t * L * 1e3:6.2f} ms per 32L token)")
