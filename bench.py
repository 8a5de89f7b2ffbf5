"""Driver benchmark: end-to-end decode tokens/sec/chip, Llama-2-7B AQLM 1x16.

This is the BASELINE.json north-star metric ("Decode tokens/sec/chip
(Llama-2-7B 1x16 2-bit)"). A full 32-layer Llama-2-7B with every block
projection AQLM-1x16-quantized (int8 serving runtime, transcoded from codes
at load) runs under the continuous-batching engine on one TPU chip; we time
steady-state decode steps.

vs_baseline = measured tokens/s divided by the theoretical ceiling of a DENSE
bf16 Llama-2-7B on this chip (weights-bandwidth-bound: HBM_BW / model_bytes)
— i.e. how we compare against a perfect fp16 baseline, the same framing as
the reference's "speedup vs FP16" tables (README.md:113-117). >1.0 means we
beat dense-bf16 speed-of-light.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_1X16
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig

HBM_BW = 819e9  # v5e HBM bandwidth, bytes/s
DECODE_STEPS = 64
WARMUP_STEPS = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def dense_bf16_sol_tokens_per_sec(cfg: llama.ModelConfig) -> float:
    """Weights-bandwidth ceiling for a dense bf16 model at batch 1."""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    d = cfg.dim_per_head
    per_layer = (
        h * cfg.num_heads * d  # q
        + 2 * h * cfg.num_kv_heads * d  # k, v
        + cfg.num_heads * d * h  # o
        + 3 * h * i  # gate, up, down
    )
    params = cfg.num_layers * per_layer + v * h  # + lm_head (embed lookup is tiny)
    return HBM_BW / (2.0 * params)


def measure_codes_slice(cfg):
    """Codes-resident (2.3-bit-in-HBM) 2x8 decode on an 8-layer slice,
    measured FIRST (before the int8 7B occupies HBM) and extrapolated
    linearly over layers."""
    import dataclasses as _dc
    from functools import partial

    from aqlm_tpu.config import SCHEME_2X8
    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
    from aqlm_tpu.serve.fuse import fuse_projections_codes

    cfg8 = _dc.replace(cfg, num_layers=8)
    codes_params = random_quantized_params(
        jax.random.PRNGKey(1), cfg8, SCHEME_2X8, mode="codes"
    )
    codes_params = fuse_projections_codes(codes_params, cfg8, donate=True)
    codes_stacked = stack_layer_params(codes_params, donate=True)
    del codes_params
    cache2 = init_kv_cache(cfg8, 1, 256, quantized=True)
    tok0 = jnp.ones((1, 1), jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def decode8(params, c, tok, offsets, n):
        def body(i, carry):
            tok, c, off = carry
            logits, c = forward_stacked(params, cfg8, tok, cache=c, cache_offset=off)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return nxt, c, off + 1
        tok, c, offsets = jax.lax.fori_loop(0, n, body, (tok, c, offsets))
        return tok

    def run2(n):
        return int(jax.device_get(decode8(codes_stacked, cache2, tok0, off0, n))[0, 0])

    run2(16); run2(0)
    t0 = time.time(); run2(16); t16 = time.time() - t0
    t0 = time.time(); run2(0); tb = time.time() - t0
    ms8 = (t16 - tb) / 16 * 1e3
    codes_tps = 1000.0 / (ms8 * cfg.num_layers / cfg8.num_layers)
    log(
        f"codes-resident decode (2x8 LUT-GEMM, 2.3 bits in HBM, exact): "
        f"{ms8:.1f} ms/step on {cfg8.num_layers} layers "
        f"~= {codes_tps:.1f} tok/s/chip at {cfg.num_layers} layers"
    )
    log(
        f"1x16 checkpoints serve codes-resident at this same rate "
        f"({codes_tps:.1f} tok/s, 2.3 bits) via the 2x8 additive transcode "
        f"(cli/convert --to 2x8); exact-1x16 S=65536 tables are below the "
        f"v5e lane-gather roofline (NOTES.md)"
    )
    return codes_tps


def measure_int4_slice(cfg):
    """W4A16 (4.25-bit-in-HBM) decode on an 8-layer slice, extrapolated over
    layers — half the weight DMA of the int8 headline mode."""
    import dataclasses as _dc
    from functools import partial

    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
    from aqlm_tpu.serve.fuse import fuse_projections

    cfg8 = _dc.replace(cfg, num_layers=8)
    p4 = random_quantized_params(jax.random.PRNGKey(2), cfg8, SCHEME_1X16, mode="int4")
    p4 = fuse_projections(p4, cfg8, donate=True)
    s4 = stack_layer_params(p4, donate=True)
    del p4
    cache4 = init_kv_cache(cfg8, 1, 256, quantized=True)
    tok0 = jnp.ones((1, 1), jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def decode8(params, c, tok, offsets, n):
        def body(i, carry):
            tok, c, off = carry
            logits, c = forward_stacked(params, cfg8, tok, cache=c, cache_offset=off)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return nxt, c, off + 1
        tok, c, offsets = jax.lax.fori_loop(0, n, body, (tok, c, offsets))
        return tok

    def run4(n):
        return int(jax.device_get(decode8(s4, cache4, tok0, off0, n))[0, 0])

    run4(16); run4(0)
    t0 = time.time(); run4(16); t16 = time.time() - t0
    t0 = time.time(); run4(0); tb = time.time() - t0
    ms8 = (t16 - tb) / 16 * 1e3
    int4_tps = 1000.0 / (ms8 * cfg.num_layers / cfg8.num_layers)
    log(
        f"int4 (W4A16 group-scaled, ~4.25 bits in HBM) decode: "
        f"{ms8:.1f} ms/step on {cfg8.num_layers} layers "
        f"~= {int4_tps:.1f} tok/s/chip at {cfg.num_layers} layers"
    )
    return int4_tps


def main():
    from functools import partial

    from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    cfg = llama.ModelConfig.llama2_7b()
    try:
        measure_codes_slice(cfg)
    except Exception as e:
        log(f"codes-resident metric failed: {e!r}")
    try:
        measure_int4_slice(cfg)
    except Exception as e:
        log(f"int4 metric failed: {e!r}")
    t0 = time.time()
    params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_1X16, mode="int8")
    jax.block_until_ready(params["embed"])
    log(f"built quantized 7B params in {time.time() - t0:.0f}s")

    from aqlm_tpu.serve.fuse import fuse_projections, quantize_lm_head_int8

    params = quantize_lm_head_int8(fuse_projections(params, cfg, donate=True))
    stacked = stack_layer_params(params, donate=True)
    del params
    cache = init_kv_cache(cfg, 1, 256, quantized=True)

    # Device-side greedy decode loop: the dev-environment tunnel costs ~30 ms
    # per host roundtrip, so per-step host driving (Engine.step) measures the
    # tunnel, not the chip. n chained steps + one fetch measures the chip.
    @partial(jax.jit, static_argnames=("n",))
    def decode_n(params, cache, tok, offsets, n):
        def body(i, carry):
            tok, cache, offsets = carry
            logits, cache = forward_stacked(params, cfg, tok, cache=cache, cache_offset=offsets)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            return nxt, cache, offsets + 1
        tok, cache, offsets = jax.lax.fori_loop(0, n, body, (tok, cache, offsets))
        return tok, cache

    # prefill 16 tokens by decoding them in (content is irrelevant for timing)
    tok0 = jnp.ones((1, 1), jnp.int32)
    off0 = jnp.zeros((1,), jnp.int32)

    def run(n):
        t, c = decode_n(stacked, cache, tok0, off0, n)
        return int(jax.device_get(t)[0, 0])

    t0 = time.time()
    run(WARMUP_STEPS)
    run(0)
    log(f"compile + warmup: {time.time() - t0:.0f}s")

    def timed(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run(n)
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    dt = timed(DECODE_STEPS) - timed(0)
    toks_per_sec = DECODE_STEPS / dt

    # secondary: batched decode throughput (B=8) and prefill rate
    try:
        cache8 = init_kv_cache(cfg, 8, 256, quantized=True)
        tok8 = jnp.ones((8, 1), jnp.int32)
        off8 = jnp.zeros((8,), jnp.int32)

        def run8(n):
            t, _ = decode_n(stacked, cache8, tok8, off8, n)
            return int(jax.device_get(t)[0, 0])

        run8(32); run8(0)  # compile both variants before timing

        def timed8(n):
            ts = []
            for _ in range(3):
                t0 = time.time(); run8(n); ts.append(time.time() - t0)
            return sorted(ts)[1]

        thpt = 8 * 32 / (timed8(32) - timed8(0))
        log(f"batched decode (B=8): {thpt:.1f} tok/s aggregate")

        del cache8
        cachep = init_kv_cache(cfg, 1, 512, quantized=True)
        ids = jnp.ones((1, 256), jnp.int32)

        @jax.jit
        def prefill(p, c, ids):
            logits, c = forward_stacked(p, cfg, ids, cache=c, cache_offset=jnp.zeros((1,), jnp.int32))
            return jnp.sum(logits[:, -1])

        float(jax.device_get(prefill(stacked, cachep, ids)))
        t0 = time.time()
        for _ in range(4):
            float(jax.device_get(prefill(stacked, cachep, ids)))
        prefill_tps = 4 * 256 / (time.time() - t0)
        log(f"prefill: {prefill_tps:.0f} tok/s (256-token prompt)")
    except Exception as e:
        log(f"secondary metrics failed: {e!r}")

    sol = dense_bf16_sol_tokens_per_sec(cfg)
    log(
        f"decode: {toks_per_sec:.2f} tok/s/chip ({1e3 * dt / DECODE_STEPS:.1f} ms/tok); "
        f"dense-bf16 bandwidth ceiling: {sol:.2f} tok/s -> ratio {toks_per_sec / sol:.3f}"
    )

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_llama2_7b_aqlm1x16",
                "value": round(toks_per_sec, 2),
                "unit": "tok/s",
                "vs_baseline": round(toks_per_sec / sol, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
