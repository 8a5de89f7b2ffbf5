"""Probe: does a lax.scan student forward survive the 32L grad step?

Hypothesis for the pv_grad_bisect fault: the python-unrolled 32-block
backward gives XLA a giant flat graph in which per-block dequantized-weight
transients (404 MB bf16 per layer) can be scheduled concurrently; a scanned
forward bounds live transients to one block.

Builds stacked reference-mode params [L, ...], runs
loss = mean(chunked-head logits) with jax.checkpoint on the scan body, and
takes grads wrt codebooks/scales — the same differentiable-dequant backward
as make_pv_step, minus the ST machinery.

Usage: python experiments/pv_scan_probe.py <n_layers> [T]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses as dc
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.llama import QUANTIZABLE_PROJS
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight
from aqlm_tpu.ops.runtime import QuantizedLinear
from aqlm_tpu.models.common import DenseLinear

n_layers = int(sys.argv[1])
T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
cfg = dc.replace(llama.ModelConfig.llama2_7b(), num_layers=n_layers)
print(f"backend: {jax.default_backend()}  L={n_layers} T={T}", flush=True)

t0 = time.time()
params = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8,
                                 mode="reference", dtype=jnp.bfloat16)
jax.block_until_ready(params["embed"])
print(f"student built {time.time()-t0:.0f}s", flush=True)

# split each layer into (codes pytree frozen, trainable codebooks/scales, norms)
codes_stack = {}
train_stack = {}
norm_stack = {}
l0 = params["layers"][0]
for name in QUANTIZABLE_PROJS:
    codes_stack[name] = jnp.stack([l[name].codes for l in params["layers"]])
    train_stack[name + ".codebooks"] = jnp.stack([l[name].codebooks for l in params["layers"]])
    train_stack[name + ".scales"] = jnp.stack([l[name].scales for l in params["layers"]])
for name in ("input_norm", "post_attn_norm"):
    norm_stack[name] = jnp.stack([l[name] for l in params["layers"]])
scheme = l0["q_proj"].scheme


def block_with(x, codes_l, train_l, norms_l, positions):
    layer = {"input_norm": norms_l["input_norm"], "post_attn_norm": norms_l["post_attn_norm"]}
    for name in QUANTIZABLE_PROJS:
        w = AqlmWeight(codes=codes_l[name], codebooks=train_l[name + ".codebooks"],
                       scales=train_l[name + ".scales"], bias=None, scheme=scheme)
        layer[name] = DenseLinear(weight=dequantize_weight(w, dtype=jnp.bfloat16), bias=None)
    out, _ = llama._block(x, layer, cfg, positions, None, None, None)
    return out


def loss_fn(train_stack, ids):
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = jnp.take(params["embed"], ids, axis=0)

    body = jax.checkpoint(
        lambda x, sl: (block_with(x, sl[0], sl[1], sl[2], positions), None)
    )
    x, _ = jax.lax.scan(body, x, (codes_stack, train_stack, norm_stack))
    x = llama.rms_norm(x, params["final_norm"], cfg.rms_eps)
    # cheap head proxy: project onto embed rows in chunks
    head = params["embed"]
    logits = x.reshape(-1, x.shape[-1]) @ head.T.astype(x.dtype)
    return jnp.mean(logits.astype(jnp.float32) ** 2)


rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
t0 = time.time()
g = jax.jit(jax.grad(loss_fn))(train_stack, ids)
jax.block_until_ready(jax.tree.leaves(g)[0])
print(f"scan grad OK {time.time()-t0:.0f}s", flush=True)
