"""On-chip validation of the ops layer: correctness + per-layer timing."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import aqlm_matmul_reference, random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul
from aqlm_tpu.utils.timing import chain_time

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
OUT, IN = 11008, 4096

results = {}
for scheme_name, modes in [
    ("2x8g8", ("codes", "int8")),
    ("1x8g8", ("codes",)),
    ("1x16g8", ("codes", "int8")),
]:
    w = random_aqlm_weight(key, AqlmScheme.parse(scheme_name), OUT, IN, dtype=jnp.bfloat16)
    x_small = jax.random.normal(key, (4, IN), jnp.bfloat16)
    ref = np.asarray(aqlm_matmul_reference(x_small, w), np.float32)
    for mode in modes:
        q = QuantizedLinear.from_aqlm(w, mode=mode)
        try:
            got = np.asarray(quantized_matmul(x_small, q), np.float32)
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            for B in (8,):
                x0 = jax.random.normal(key, (B, IN), jnp.bfloat16)

                def step(xx):
                    y = quantized_matmul(xx, q)
                    return xx + y[:, :IN] * 1e-3

                t = chain_time(step, x0, n_steps=10, n_repeats=2)
                print(f"{scheme_name:8s} {mode:6s} B={B}: rel_err={rel:.4f}  {t*1e6:9.1f} us/layer", flush=True)
        except Exception as e:
            print(f"{scheme_name:8s} {mode:6s} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)

# dense baseline
Wd = jax.random.normal(key, (OUT, IN), jnp.bfloat16)
x0 = jax.random.normal(key, (8, IN), jnp.bfloat16)
t = chain_time(lambda x: x + (x @ Wd.T)[:, :IN] * 1e-3, x0, n_steps=30)
print(f"dense bf16 B=8: {t*1e6:9.1f} us/layer", flush=True)
