"""Codebook-grad A/B at 7B gate shape: segment_sum scatter vs the batched
one-hot-MXU kernel (ops/kernels.cb_grad_segment).

The r4e PV grad step ran 23-38 s against ~0.5 s of FLOPs; NOTES named the
7x32 per-layer segment_sum scatters as the suspected dominant cost. This
probe isolates one projection's codebook-grad computation (G=5.6M groups,
K=2 codebooks, S=256) and times both formulations, then a full manual-VJP
projection backward (dequant + gw einsum + cb/scale grads) with each.

Run: python experiments/cbgrad_probe.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aqlm_tpu.ops.kernels import cb_grad_segment
from aqlm_tpu.utils.timing import chain_time

OUT, IN, K, G_, S = 11008, 4096, 2, 8, 256
if os.environ.get("AQLM_PROBE_TINY"):
    OUT, IN = 512, 256
IG = IN // G_
G = OUT * IG

key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (G, K), 0, S, jnp.int32)
data = jax.random.normal(jax.random.PRNGKey(1), (G, G_), jnp.float32)
print(f"backend: {jax.default_backend()}  G={G} K={K} S={S}", flush=True)


def dep(x, y):
    return x + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)


def dep_int(c, x):
    s = jnp.sum(x.astype(jnp.float32))
    z = jnp.where(jnp.isfinite(s), 0, 1).astype(jnp.int32)
    return (c.astype(jnp.int32) + z).astype(c.dtype)


# correctness first (on-device)
got = cb_grad_segment(codes, data, S)
want = jnp.stack(
    [jax.ops.segment_sum(data, codes[:, k], num_segments=S) for k in range(K)]
)
rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
print(f"kernel vs segment_sum rel err: {rel:.2e}", flush=True)
assert rel < 1e-5, rel


# --- A. segment_sum scatter (the r4 path) ------------------------------------
def step_scatter(x, consts):
    c, = consts
    c = dep_int(c, x)
    outs = [
        jax.ops.segment_sum(x, c[:, k], num_segments=S) for k in range(K)
    ]
    return dep(x, jnp.stack(outs))


t = chain_time(step_scatter, data, n_steps=8, consts=(codes,))
print(f"A segment_sum x{K}: {t*1e3:.3f} ms/call", flush=True)


# --- B. batched one-hot-MXU kernel -------------------------------------------
def step_kernel(x, consts):
    c, = consts
    c = dep_int(c, x)
    return dep(x, cb_grad_segment(c, x, S))


t = chain_time(step_kernel, data, n_steps=16, consts=(codes,))
print(f"B cb_grad_segment kernel: {t*1e3:.3f} ms/call", flush=True)


# --- C. full manual projection grad (fwd+bwd), kernel path -------------------
from aqlm_tpu.config import SCHEME_2X8  # noqa: E402
from aqlm_tpu.ops.dequant import random_aqlm_weight  # noqa: E402
from aqlm_tpu.pv.straight_through import _make_manual_st_proj  # noqa: E402

w = random_aqlm_weight(jax.random.PRNGKey(2), SCHEME_2X8, OUT, IN)
xact = jax.random.normal(jax.random.PRNGKey(3), (512, IN), jnp.bfloat16)
st = jnp.zeros((1, OUT, IN), jnp.float32)
li = jnp.asarray(0, jnp.int32)
start = jnp.asarray(0, jnp.int32)
impl = "xla" if os.environ.get("AQLM_PROBE_CPU") else "kernel"
f = _make_manual_st_proj(SCHEME_2X8, jnp.bfloat16, True, 1, False,
                         dequant_impl=impl)


def step_projgrad(x, consts):
    c, cbs, sc, stb = consts

    def loss(cb_, sc_, st_):
        y = f(x, c, cb_, sc_, None, st_, li, start)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g1, g2, g3 = jax.grad(loss, argnums=(0, 1, 2))(cbs, sc, stb)
    out = dep(x, g1)
    out = dep(out, g2)
    return dep(out, g3)


t = chain_time(step_projgrad, xact, n_steps=8,
               consts=(w.codes, w.codebooks, w.scales, st))
print(f"C manual proj fwd+bwd (T=512, {impl} dequant + cb-grad kernel): "
      f"{t*1e3:.3f} ms/call", flush=True)
print("DONE", flush=True)
