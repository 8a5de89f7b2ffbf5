"""Bisect the scan_blocks device fault (UNAVAILABLE on chip, any L).

Stages (argv[1]), each a separate run so a fault doesn't poison the next:
  fwd        scanned_student_hidden forward, NO st window
  fwd_st     forward WITH a 1-layer st window
  grad       grad of mean(hidden^2), NO st window
  grad_st    grad WITH st window (= what pv_grad_bisect exercises)
  body       ONE scan body iteration (no lax.scan), grad, with st
  nockpt     grad, st, scan WITHOUT jax.checkpoint (monkeypatched)

Usage: python experiments/pv_scan_bisect2.py <stage> [n_layers] [T] [remat] [seg]
  remat (default "dequant"): scan_remat mode for the fwd/grad stages —
  "manual" tests the custom_vjp path, "none" plain scan.
  seg (default 0 = UNSEGMENTED): scan_segment_layers — the bisect matrix
  reproduces the L>=16 fault, so segmentation stays off unless asked.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv import straight_through as stm

stage = sys.argv[1]
n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
remat = sys.argv[4] if len(sys.argv) > 4 else "dequant"
seg = int(sys.argv[5]) if len(sys.argv) > 5 else 0
cfg = dc.replace(llama.ModelConfig.llama2_7b(), num_layers=n_layers)
print(f"backend: {jax.default_backend()}  stage={stage} L={n_layers} T={T} "
      f"remat={remat} seg={seg}", flush=True)

student = random_quantized_params(
    jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference", dtype=jnp.bfloat16
)
jax.block_until_ready(student["embed"])
print("student built", flush=True)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)

if stage == "nockpt":
    _orig = jax.checkpoint
    jax.checkpoint = lambda f, **kw: f  # type: ignore
elif stage == "nocse":
    # checkpoint WITHOUT the prevent_cse optimization barriers (redundant
    # under lax.scan per JAX docs; the barriers are a fault suspect)
    _orig = jax.checkpoint
    jax.checkpoint = functools.partial(_orig, prevent_cse=False)  # type: ignore

win = {
    name: jnp.zeros(
        (1, student["layers"][0][name].out_features, student["layers"][0][name].in_features),
        jnp.float32,
    )
    for name in stm.QUANTIZABLE_PROJS
}
w0 = jnp.zeros((), jnp.int32)

use_st = stage in ("fwd_st", "grad_st", "body", "nockpt", "nocse")


def fwd(params, st):
    h = stm.scanned_student_hidden(
        params, st if use_st else {}, cfg, ids,
        window_start=w0 if use_st else None, remat=remat, segment_layers=seg,
    )
    return jnp.mean(jnp.square(h.astype(jnp.float32)))

t0 = time.time()
if stage in ("fwd", "fwd_st"):
    val = jax.jit(fwd)(student, win)
    print(f"{stage} OK {time.time()-t0:.0f}s val={float(val):.4f}", flush=True)
elif stage in ("grad", "grad_st", "nockpt", "nocse"):
    if use_st:
        val, g = jax.jit(jax.value_and_grad(fwd, argnums=1))(student, win)
    else:
        # Without an st window the loss ignores argument 1, so grad wrt it is
        # a constant zero and XLA dead-code-eliminates the backward pass; take
        # the grad wrt the FLOAT param leaves (codes are int32 — not
        # differentiable) so the scan backward actually runs on device. BOTH
        # leaf groups are jit ARGS: closure constants upload with the program
        # and the codes alone blow the remote-compile request limit (413).
        leaves, treedef = jax.tree_util.tree_flatten(student)
        is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]

        def fwd_floats(fl, others, st):
            it, jt = iter(fl), iter(others)
            params = jax.tree_util.tree_unflatten(
                treedef, [next(it) if f else next(jt) for f in is_f]
            )
            return fwd(params, st)

        floats = [l for l, f in zip(leaves, is_f) if f]
        others = [l for l, f in zip(leaves, is_f) if not f]
        val, g = jax.jit(jax.value_and_grad(fwd_floats, argnums=0))(floats, others, win)
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    print(f"{stage} OK {time.time()-t0:.0f}s val={float(val):.4f}", flush=True)
elif stage == "body":
    # one block, no scan: dequant all projections + _block + st correction.
    # layer params and embed are jit ARGS (closure constants upload with the
    # program; the embed alone exceeds the remote-compile request limit).
    def one(st, layer0, embed):
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (1, T))
        x = jnp.take(embed, ids, axis=0)
        layer = {
            "input_norm": layer0["input_norm"],
            "post_attn_norm": layer0["post_attn_norm"],
        }
        from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight
        for name in stm.QUANTIZABLE_PROJS:
            q = layer0[name]
            w = dequantize_weight(
                AqlmWeight(
                    codes=q.codes, codebooks=q.codebooks, scales=q.scales,
                    bias=None, scheme=q.scheme,
                ),
                dtype=jnp.bfloat16,
            )
            stw = st[name][0]
            w = (w.astype(jnp.float32) + (stw - jax.lax.stop_gradient(stw))).astype(
                jnp.bfloat16
            )
            layer[name] = stm.DenseLinear(weight=w, bias=None)
        out, _ = llama._block(x, layer, cfg, positions, None, None, None)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    val, g = jax.jit(jax.value_and_grad(one, argnums=0))(
        win, student["layers"][0], student["embed"])
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    print(f"body OK {time.time()-t0:.0f}s val={float(val):.4f}", flush=True)
else:
    raise SystemExit(f"unknown stage {stage}")
