"""On-chip speculative-decoding economics probe (codes-resident serving).

Measures, on an 8-layer 7B-width slice (extrapolated to 32 layers):
  t_target : one 2x8 codes-resident decode step (the serving baseline)
  t_draft  : one 1x8 codes-resident decode step (the requant-draft step)
  t_verify : one k+1-token target forward (the spec verify step)
and prints the speculative tokens/s curve vs acceptance rate:
  tok/s(a) = (E[emitted] per round) / (k*t_draft + t_verify),
  E[emitted] = sum_{i<=k} min(1, ...) -- use the standard geometric form
  (1 - a^{k+1}) / (1 - a) for per-token acceptance probability a.

Run ONE process at a time on the tunnel (NOTES.md env gotchas).
"""

import sys

sys.path.insert(0, "/root/repo")
import dataclasses as dc
from functools import partial

import jax
import jax.numpy as jnp

from aqlm_tpu.config import SCHEME_1X8, SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.models.stacked import forward_stacked, init_kv_cache, stack_layer_params
from aqlm_tpu.serve.fuse import fuse_projections_codes

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
TINY = len(sys.argv) > 2 and sys.argv[2] == "tiny"  # CPU smoke of the script
LAYERS = 2 if TINY else 8
FULL_LAYERS = LAYERS if TINY else 32

print("backend:", jax.default_backend(), flush=True)
base = llama.ModelConfig.tiny() if TINY else llama.ModelConfig.llama2_7b()
cfg = dc.replace(base, num_layers=LAYERS)


def build(scheme):
    p = random_quantized_params(jax.random.PRNGKey(1), cfg, scheme, mode="codes")
    p = fuse_projections_codes(p, cfg, donate=True)
    return stack_layer_params(p, donate=True)


def decode_time(stacked, t):
    """us/layer for a t-token decode-shaped forward (B=1)."""
    cache = init_kv_cache(cfg, 1, 256, quantized=True)
    tok = jnp.ones((1, t), jnp.int32)
    off = jnp.zeros((1,), jnp.int32)

    @partial(jax.jit, static_argnames=("n",))
    def chain(params, c, tok, offsets, n):
        def body(i, carry):
            tok, c, off = carry
            logits, c = forward_stacked(params, cfg, tok, cache=c, cache_offset=off)
            nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            return jnp.broadcast_to(nxt, tok.shape), c, off + t

        tok, c, off = jax.lax.fori_loop(0, n, body, (tok, c, offsets))
        return tok

    import time

    def run(n):
        return int(jax.device_get(chain(stacked, cache, tok, off, n))[0, 0])

    run(8); run(0)
    t0 = time.time(); run(16); t16 = time.time() - t0
    t0 = time.time(); run(0); tb = time.time() - t0
    return (t16 - tb) / 16 / LAYERS * 1e6  # us/layer/step


t2x8 = build(SCHEME_2X8)
t_target = decode_time(t2x8, 1)
t_verify = decode_time(t2x8, K + 1)
del t2x8
t1x8 = build(SCHEME_1X8)
t_draft = decode_time(t1x8, 1)
del t1x8

ms = lambda us: us * FULL_LAYERS / 1e3
print(f"k={K}; per-step (32L extrapolation):")
print(f"  target 2x8 decode : {ms(t_target):.2f} ms -> {1000/ms(t_target):.1f} tok/s plain")
print(f"  draft  1x8 decode : {ms(t_draft):.2f} ms")
print(f"  verify {K+1}-token  : {ms(t_verify):.2f} ms")
round_ms = K * ms(t_draft) + ms(t_verify)
print(f"  spec round        : {round_ms:.2f} ms")
for a in (0.5, 0.6, 0.7, 0.8, 0.9, 1.0):
    emitted = (1 - a ** (K + 1)) / (1 - a) if a < 1 else K + 1
    print(f"  acceptance {a:.1f}: {emitted / round_ms * 1000:6.1f} tok/s "
          f"({emitted:.2f} tok/round)")
