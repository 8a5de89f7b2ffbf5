"""Why does a 7-projection layer cost 398us when gate_proj alone times 26us?
Distinguish per-call overhead / DMA residency / small-call costs."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.ops.runtime import quantized_matmul
from aqlm_tpu.utils.timing import chain_time
import dataclasses as dc

cfg = dc.replace(llama.ModelConfig(), num_layers=8)
params = random_quantized_params(jax.random.PRNGKey(1), cfg, SCHEME_2X8, mode="codes")
layers = params["layers"]
h = cfg.hidden_size
x0 = jnp.ones((1, h), jnp.bfloat16)
print("backend:", jax.default_backend(), flush=True)

def t_of(step, consts):
    return chain_time(step, x0, n_steps=8, consts=consts)

# (1) gate_proj x8, DIFFERENT layers
gates = [layers[i]["gate_proj"] for i in range(8)]
def step1(x, cs):
    for g in cs:
        y = quantized_matmul(x, g)
        x = jnp.tanh(y[:, :h]).astype(jnp.bfloat16)
    return x
t = t_of(step1, gates)
print(f"(1) gate x8 distinct: {t*1e3:.3f} ms -> {t/8*1e6:.0f} us/call", flush=True)

# (2) gate_proj x8, SAME layer (VMEM/cache-friendly)
def step2(x, cs):
    for _ in range(8):
        y = quantized_matmul(x, cs[0])
        x = jnp.tanh(y[:, :h]).astype(jnp.bfloat16)
    return x
t = t_of(step2, gates[:1])
print(f"(2) gate x8 same:     {t*1e3:.3f} ms -> {t/8*1e6:.0f} us/call", flush=True)

# (3) k_proj x8 distinct (small projection)
ks = [layers[i]["k_proj"] for i in range(8)]
def step3(x, cs):
    for g in cs:
        y = quantized_matmul(x, g)
        x = jnp.tanh(y[:, :h]).astype(jnp.bfloat16)
    return x
t = t_of(step3, ks)
print(f"(3) k    x8 distinct: {t*1e3:.3f} ms -> {t/8*1e6:.0f} us/call", flush=True)

# (4) down_proj x8 distinct (wide-in projection, IG=1376)
ds = [layers[i]["down_proj"] for i in range(8)]
xi = jnp.ones((1, cfg.intermediate_size), jnp.bfloat16)
def step4(x, cs):
    for g in cs:
        y = quantized_matmul(jnp.pad(x, ((0,0),(0, cfg.intermediate_size - h))), g)
        x = jnp.tanh(y[:, :h]).astype(jnp.bfloat16)
    return x
t = t_of(step4, ds)
print(f"(4) down x8 distinct: {t*1e3:.3f} ms -> {t/8*1e6:.0f} us/call", flush=True)
