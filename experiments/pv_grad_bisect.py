"""Fast bisect of the 7B PV grad-step device fault.

Builds only what the grad step needs (student + random teacher hidden) —
no HostSTManager / teacher streaming — so one probe is ~5 min instead of 25.

Usage: python experiments/pv_grad_bisect.py <n_layers> [T] [scan] [remat]
  remat: dequant (default) | none | block — PVConfig.scan_remat for the
  scan path (r4: scan+dequant passes L=8 but faults the device at L=16;
  `none` isolates whether jax.checkpoint is the trigger).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv.straight_through import PVConfig, init_pv_state, make_pv_step

n_layers = int(sys.argv[1])
T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
scan = len(sys.argv) > 3 and sys.argv[3] == "scan"
remat = sys.argv[4] if len(sys.argv) > 4 else "dequant"
cfg = dc.replace(llama.ModelConfig.llama2_7b(), num_layers=n_layers)
print(f"backend: {jax.default_backend()}  L={n_layers} T={T} scan={scan} "
      f"remat={remat}", flush=True)

t0 = time.time()
student = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8,
                                  mode="reference", dtype=jnp.bfloat16)
jax.block_until_ready(student["embed"])
print(f"student built {time.time()-t0:.0f}s", flush=True)

pv = PVConfig(chunk_tokens=128, scan_blocks=scan, scan_remat=remat)
fns = make_pv_step(cfg, cfg, pv, st_opt=optax.identity(), teacher_kind="hidden")
# "nost": no active ST window — isolates whether the straight-through
# buffer's participation in the checkpointed scan body drives the fault
active = () if "nost" in sys.argv else (0,)
state = init_pv_state(student, optax.adamw(1e-4), optax.identity(), active_layers=active)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
key = jax.random.PRNGKey(1)
tbatch = {
    "hidden": jax.random.normal(key, (1, T, cfg.hidden_size), jnp.bfloat16),
    "head": jax.random.normal(key, (cfg.vocab_size, cfg.hidden_size), jnp.bfloat16) * 0.02,
    "embed": None,
}

t0 = time.time()
grad_fn = jax.jit(fns.grad_fn)
loss, (g_tr, g_st) = grad_fn(state, tbatch, ids)
jax.block_until_ready(loss)
print(f"grad step OK {time.time()-t0:.0f}s; loss={float(loss):.4f}", flush=True)
