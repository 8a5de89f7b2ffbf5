"""int8 decode A/B at short context: fused flash kernel vs XLA attention.

The fused write+attend kernel (ops/flash_decode.py) replaces the two-launch
kv_write4 + flash sequence that previously made int8 flash LOSE to the XLA
path below 1024 ctx (NOTES.md: 94.5 vs 98.3 tok/s at 32L/256ctx). This probe
re-arbitrates the models/stacked.py gate (`cache.max_len >= 1024`) with the
fused kernel: an 8-layer int8 fused 7B slice, 256-ctx quantized cache, timed
device-side (chained fori_loop, one fetch — the tunnel costs ~30 ms/roundtrip).

Usage: python experiments/int8_flash_ab.py [CTX]
"""
import dataclasses as dc
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_1X16
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve.fuse import fuse_projections

CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NL = 8
cfg = dc.replace(llama.ModelConfig.llama2_7b(), num_layers=NL)
print(f"backend: {jax.default_backend()}  ctx={CTX}  layers={NL}", flush=True)

params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_1X16, mode="int8")
stacked = stack_layer_params(fuse_projections(params, cfg, donate=True), donate=True)
del params
tok0 = jnp.ones((1, 1), jnp.int32)
off0 = jnp.zeros((1,), jnp.int32)


@partial(jax.jit, static_argnames=("n", "flash"))
def decode_n(p, cache, tok, off, n, flash):
    def body(i, carry):
        tok, cache, off = carry
        logits, cache = forward_stacked(
            p, cfg, tok, cache=cache, cache_offset=off, use_flash_decode=flash
        )
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, cache, off + 1
    tok, cache, off = jax.lax.fori_loop(0, n, body, (tok, cache, off))
    return tok, cache


def measure(flash):
    cache = init_kv_cache(cfg, 1, CTX, quantized=True)

    def run(n):
        t, _ = decode_n(stacked, cache, tok0, off0, n, flash)
        return int(jax.device_get(t)[0, 0])

    run(128); run(0)  # compile both step counts used by the timed loop
    ts = []
    for _ in range(5):
        t0 = time.time(); run(128); t1 = time.time(); run(0)
        ts.append((t1 - t0) - (time.time() - t1))
    dt = sorted(ts)[2] / 128
    return dt


t_flash = measure(True)
t_xla = measure(False)
scale = 32 / NL  # extrapolate the per-layer part to a 32L model (glue shared)
print(f"flash(fused): {t_flash*1e3:7.3f} ms/tok ({NL}L) -> ~{1/(t_flash*scale):.1f} tok/s at 32L", flush=True)
print(f"xla:          {t_xla*1e3:7.3f} ms/tok ({NL}L) -> ~{1/(t_xla*scale):.1f} tok/s at 32L", flush=True)
print(f"flash - xla: {(t_flash - t_xla)*1e6/NL:+.1f} us/layer/tok", flush=True)
