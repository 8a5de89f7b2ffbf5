"""Driver benchmark: AQLM quantized matmul vs dense bf16 on real TPU.

Measures the Llama-2-7B MLP hot path (gate_proj 4096->11008 + down_proj
11008->4096, B=1 decode) through the int8 runtime mode (AQLM codes transcoded
at load; the serving speed mode) and compares against dense bf16 — the same
protocol as the reference's benchmark/matmul_benchmark.py:23-33,111-116.

Four distinct weight instances are cycled inside one jitted chain so XLA
cannot cache a single weight in VMEM (which would overstate bandwidth ~3x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = our speedup over dense divided by the reference's published
1x16-CUDA-vs-fp16 speedup (~1.3x, reference README.md:115).
"""

import json
import sys

import jax
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_1X16
from aqlm_tpu.ops.dequant import random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul
from aqlm_tpu.utils.timing import chain_time

H, I = 4096, 11008  # Llama-2-7B hidden / intermediate
B = 1  # decode
N_COPIES = 2  # 2 gate + 2 down = 4 distinct weights per chain step
REF_SPEEDUP = 1.3  # reference 1x16 CUDA kernel vs fp16 dense (README.md:115)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_weights(mode):
    """2 gate-shaped + 2 down-shaped quantized weights in the runtime mode."""
    gates, downs = [], []
    for i in range(N_COPIES):
        wg = random_aqlm_weight(jax.random.PRNGKey(2 * i), SCHEME_1X16, I, H)
        wd = random_aqlm_weight(jax.random.PRNGKey(2 * i + 1), SCHEME_1X16, H, I)
        gates.append(QuantizedLinear.from_aqlm(wg, mode=mode))
        downs.append(QuantizedLinear.from_aqlm(wd, mode=mode))
    return gates, downs


def bench_mode(mode):
    weights = build_weights(mode)

    def step(x, ws):
        gates, downs = ws
        for g, d in zip(gates, downs):
            x = quantized_matmul(quantized_matmul(x, g), d)
        return x

    x0 = jnp.ones((B, H), jnp.bfloat16)
    per_step = chain_time(step, x0, n_steps=30, consts=weights)
    return per_step / (2 * N_COPIES)  # per single matmul


def bench_dense():
    ws = []
    for i in range(N_COPIES):
        kg, kd = jax.random.split(jax.random.PRNGKey(100 + i))
        ws.append(
            (
                (jax.random.normal(kg, (H, I), jnp.bfloat16) * 0.02),
                (jax.random.normal(kd, (I, H), jnp.bfloat16) * 0.02),
            )
        )

    def step(x, ws):
        for wg, wd in ws:
            x = (x @ wg) @ wd
        return x

    x0 = jnp.ones((B, H), jnp.bfloat16)
    per_step = chain_time(step, x0, n_steps=30, consts=ws)
    return per_step / (2 * N_COPIES)


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    dense_us = bench_dense() * 1e6
    log(f"dense bf16 matmul ({H}x{I}, B={B}): {dense_us:.1f} us")

    int8_us = bench_mode("int8") * 1e6
    log(f"int8-mode quantized matmul: {int8_us:.1f} us (speedup {dense_us / int8_us:.2f}x)")

    try:
        codes_us = bench_mode("codes") * 1e6
        log(f"codes-mode (1x16 HBM-resident) matmul: {codes_us:.1f} us "
            f"({dense_us / codes_us:.2f}x vs dense)")
    except Exception as e:  # codes mode is informational; don't fail the bench
        log(f"codes-mode bench failed: {e!r}")

    speedup = dense_us / int8_us
    print(
        json.dumps(
            {
                "metric": "llama2_7b_mlp_decode_matmul_speedup_vs_dense_bf16",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / REF_SPEEDUP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
