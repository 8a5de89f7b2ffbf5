"""Decompose the 2x8 codes-resident decode step cost (v5e, 8-layer 7B slice).

r2 finding (lutgemv_ab.py): the LUT-GEMV gather runs at ~427 G gathers/s —
gate_proj GEMV is ~26 us, so the 0.64 ms/layer end-to-end step must be
dominated by serving glue. Suspects:
  1. _slice_layer's dynamic_index_in_dim copies each layer's codes out of
     the stacked array every scan step (~50 MB read+write per layer);
  2. attention + KV + norms;
  3. lut-build einsums / fusion boundaries.

Measures: (a) bench-style full decode step, (b) chained pure lut_gemv at all
7 projection shapes x 8 layers (pre-sliced weights), (c) same through
quantized_matmul_indexed (adds the slice copy).
"""

import dataclasses as dc
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.ops.runtime import IndexedQuantizedLinear, quantized_matmul, quantized_matmul_indexed
from aqlm_tpu.utils.timing import chain_time

cfg = dc.replace(llama.ModelConfig(), num_layers=8)  # 7B widths, 8 layers
print("backend:", jax.default_backend(), flush=True)

params = random_quantized_params(jax.random.PRNGKey(1), cfg, SCHEME_2X8, mode="codes")
stacked = stack_layer_params(params, donate=True)
del params
cache = init_kv_cache(cfg, 1, 256, quantized=True)
tok0 = jnp.zeros((1, 1), jnp.int32)
off0 = jnp.zeros((1,), jnp.int32)

# ---- (a) full decode step --------------------------------------------------
@partial(jax.jit, static_argnames=("n",))
def decode(params, c, tok, offsets, n):
    def body(i, carry):
        tok, c, off = carry
        logits, c = forward_stacked(params, cfg, tok, cache=c, cache_offset=off)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, c, off + 1
    tok, c, offsets = jax.lax.fori_loop(0, n, body, (tok, c, offsets))
    return tok


def run(n):
    return int(jax.device_get(decode(stacked, cache, tok0, off0, n))[0, 0])


run(16); run(0)
t0 = time.time(); run(16); t16 = time.time() - t0
t0 = time.time(); run(0); tb = time.time() - t0
ms = (t16 - tb) / 16 * 1e3
print(f"(a) full decode step, 8 layers: {ms:.2f} ms  ({ms/8*1e3:.0f} us/layer)", flush=True)

# ---- (b) pure kernel chain -------------------------------------------------
layers = stacked["layers"]
names = ["q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"]
sliced = {n: [] for n in names}
for n in names:
    q = layers[n]
    for li in range(cfg.num_layers):
        sliced[n].append(jax.tree.map(lambda a: a[li] if a is not None else None, q))

h = cfg.hidden_size


def step_kernels(x, consts):
    for li in range(cfg.num_layers):
        a = quantized_matmul(x, consts["q_proj"][li])          # [1, h]
        _ = quantized_matmul(x, consts["k_proj"][li])
        _ = quantized_matmul(x, consts["v_proj"][li])
        x2 = quantized_matmul(a[:, :h].astype(jnp.bfloat16), consts["o_proj"][li])
        g = quantized_matmul(x2[:, :h].astype(jnp.bfloat16), consts["gate_proj"][li])
        u = quantized_matmul(x2[:, :h].astype(jnp.bfloat16), consts["up_proj"][li])
        x = quantized_matmul(
            (g * u)[:, : cfg.intermediate_size].astype(jnp.bfloat16), consts["down_proj"][li]
        )
        x = jnp.tanh(x[:, :h]).astype(jnp.bfloat16)
    return x


x0 = jnp.ones((1, h), jnp.bfloat16)
t = chain_time(step_kernels, x0, n_steps=8, consts=sliced)
print(f"(b) pure kernels+lut, 8 layers: {t*1e3:.2f} ms  ({t/8*1e6:.0f} us/layer)", flush=True)

# ---- (c) via indexed path (adds the per-layer slice copy) ------------------
def step_indexed(x, consts):
    for li in range(cfg.num_layers):
        i = jnp.int32(li)
        mk = lambda n: IndexedQuantizedLinear(stacked=consts[n], idx=i)
        a = quantized_matmul_indexed(x, mk("q_proj"))
        _ = quantized_matmul_indexed(x, mk("k_proj"))
        _ = quantized_matmul_indexed(x, mk("v_proj"))
        x2 = quantized_matmul_indexed(a[:, :h].astype(jnp.bfloat16), mk("o_proj"))
        g = quantized_matmul_indexed(x2[:, :h].astype(jnp.bfloat16), mk("gate_proj"))
        u = quantized_matmul_indexed(x2[:, :h].astype(jnp.bfloat16), mk("up_proj"))
        x = quantized_matmul_indexed(
            (g * u)[:, : cfg.intermediate_size].astype(jnp.bfloat16), mk("down_proj")
        )
        x = jnp.tanh(x[:, :h]).astype(jnp.bfloat16)
    return x


t = chain_time(step_indexed, x0, n_steps=8, consts=layers)
print(f"(c) indexed (slice-copy) path, 8 layers: {t*1e3:.2f} ms  ({t/8*1e6:.0f} us/layer)", flush=True)
