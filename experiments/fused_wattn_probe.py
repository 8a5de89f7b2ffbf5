"""On-chip check + timing for the fused write+attend flash kernel.

1) Correctness on the real chip (Mosaic, not interpret): fused kernel vs the
   two-launch kv_write4 + flash sequence, int8 cache, 7B-decode shapes.
2) Launch-overhead win: per-layer chained time of fused vs two-launch at a
   SHORT context (256) — the regime where the XLA path used to beat flash.

Run on the axon tunnel, ONE process at a time (NOTES.md).
Usage: python experiments/fused_wattn_probe.py [S]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.ops.flash_decode import (
    flash_decode_attention_indexed,
    flash_decode_write_attention_indexed,
    kv_write4_inplace,
)
from aqlm_tpu.utils.timing import chain_time

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
L, B, HQ, HKV, D = 32, 1, 32, 32, 128  # llama-2-7b decode shapes

print(f"backend: {jax.default_backend()}  S={S}")

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, 1, HQ, D), jnp.float32).astype(jnp.bfloat16)
k_all = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
v_all = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
ks = jax.random.uniform(key, (L, B, HKV, S, 1), jnp.float32, 0.01, 0.03)
vs = jax.random.uniform(key, (L, B, HKV, S, 1), jnp.float32, 0.01, 0.03)
nk = jax.random.randint(key, (B, 1, HKV, D), -127, 128, jnp.int32).astype(jnp.int8)
nv = jax.random.randint(key, (B, 1, HKV, D), -127, 128, jnp.int32).astype(jnp.int8)
nks = jax.random.uniform(key, (B, 1, HKV, 1), jnp.float32, 0.01, 0.03)
nvs = jax.random.uniform(key, (B, 1, HKV, 1), jnp.float32, 0.01, 0.03)
offsets = jnp.full((B,), S // 2 + 7, jnp.int32)
li = jnp.asarray(3, jnp.int32)

# -- correctness on chip ----------------------------------------------------
hm = lambda a: jnp.moveaxis(a, 1, 2)
k2, v2, ks2, vs2 = kv_write4_inplace(
    k_all.copy(), v_all.copy(), ks.copy(), vs.copy(),
    hm(nk), hm(nv), hm(nks), hm(nvs), li, offsets,
)
ref = flash_decode_attention_indexed(q, k2, v2, ks2, vs2, li, offsets + 1)
got, gk, gv, gks, gvs = flash_decode_write_attention_indexed(
    q, nk, nv, k_all.copy(), v_all.copy(), ks.copy(), vs.copy(), li, offsets,
    k_scale_new=nks, v_scale_new=nvs,
)
np.testing.assert_array_equal(np.asarray(gk), np.asarray(k2))
np.testing.assert_array_equal(np.asarray(gv), np.asarray(v2))
np.testing.assert_allclose(
    np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
)
print("FUSED_WATTN_OK (matches two-launch on chip)")

# -- timing: fused vs two-launch at short context ----------------------------
consts = (k_all, v_all, ks, vs, nk, nv, nks, nvs)


def fused_step(carry, cs):
    qq, i = carry
    attn, *_ = flash_decode_write_attention_indexed(
        qq, cs[4], cs[5], cs[0], cs[1], cs[2], cs[3], i % L, offsets,
        k_scale_new=cs[6], v_scale_new=cs[7],
    )
    return (attn.reshape(qq.shape).astype(qq.dtype), (i + 1) % L)


def two_launch_step(carry, cs):
    qq, i = carry
    k2, v2, ks2, vs2 = kv_write4_inplace(
        cs[0], cs[1], cs[2], cs[3], hm(cs[4]), hm(cs[5]), hm(cs[6]), hm(cs[7]),
        i % L, offsets,
    )
    attn = flash_decode_attention_indexed(qq, k2, v2, ks2, vs2, i % L, offsets + 1)
    return (attn.reshape(qq.shape).astype(qq.dtype), (i + 1) % L)


t_fused = chain_time(fused_step, (q, jnp.asarray(0, jnp.int32)), n_steps=64, consts=consts)
t_two = chain_time(two_launch_step, (q, jnp.asarray(0, jnp.int32)), n_steps=64, consts=consts)
print(f"fused:      {t_fused * 1e6:7.1f} us/layer")
print(f"two-launch: {t_two * 1e6:7.1f} us/layer")
print(f"saved: {(t_two - t_fused) * 1e6:.1f} us/layer -> {(t_two - t_fused) * L * 1e3:.2f} ms per 32L token")
