"""PV-tuning memory check: one full PV step on a 7B-shaped student, 1 chip.

The r1 verdict's failure mode: dense-f32 ST buffers for every projection
(~27 GB) + teacher + student cannot fit 16 GB HBM. The r2 design keeps
teacher weights and the full ST buffer set in HOST RAM:

  - student: codes-resident (reference mode), per-block remat;
  - teacher: HostTeacher layer-streamed hidden states;
  - ST: HostSTManager window=1 (one block's buffers on device per step);
  - loss: chunked lm_head+KL.

Measures peak HBM for grad_fn + host Adam + the V-phase beam search on the
active block. B=1, T=512 keeps the check fast; memory scales linearly in
B*T activations only.
"""

import sys, time

sys.path.insert(0, "/root/repo")
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv.host import HostSTManager
from aqlm_tpu.pv.straight_through import PVConfig, init_pv_state, make_pv_step
from aqlm_tpu.pv.teacher import HostTeacher

print("backend:", jax.default_backend(), flush=True)
cfg = llama.ModelConfig.llama2_7b() if hasattr(llama.ModelConfig, "llama2_7b") else llama.ModelConfig()
n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else cfg.num_layers
cfg = dc.replace(cfg, num_layers=n_layers)
T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 256

def mem_gb():
    st = jax.local_devices()[0].memory_stats() or {}
    return st.get("peak_bytes_in_use", 0) / 1e9, st.get("bytes_in_use", 0) / 1e9

t0 = time.time()
student = random_quantized_params(jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference", dtype=jnp.bfloat16)
print(f"student built {time.time()-t0:.0f}s; mem peak/now {mem_gb()}", flush=True)

# teacher params assembled host-side (never device-resident)
t0 = time.time()
rng = np.random.default_rng(0)
h, inter, d = cfg.hidden_size, cfg.intermediate_size, cfg.dim_per_head
_shape_cache = {}
def nplin(o, i):
    # one array per unique shape, shared by every layer: the memcheck cares
    # about transfer/HBM behaviour, not weight content, and 32 distinct f32
    # layers cost 26 GB of host RAM + ~18 min of RNG
    from aqlm_tpu.models.common import DenseLinear
    if (o, i) not in _shape_cache:
        _shape_cache[(o, i)] = rng.standard_normal((o, i), np.float32).astype(np.float32) * 0.02
    return DenseLinear(weight=_shape_cache[(o, i)], bias=None)
shared_layer = dict(
    input_norm=np.ones((h,), np.float32),
    post_attn_norm=np.ones((h,), np.float32),
    q_proj=nplin(cfg.num_heads * d, h), k_proj=nplin(cfg.num_kv_heads * d, h),
    v_proj=nplin(cfg.num_kv_heads * d, h), o_proj=nplin(h, cfg.num_heads * d),
    gate_proj=nplin(inter, h), up_proj=nplin(inter, h), down_proj=nplin(h, inter),
)
teacher = {
    "embed": rng.standard_normal((cfg.vocab_size, h), np.float32).astype(np.float32) * 0.02,
    "final_norm": np.ones((h,), np.float32),
    "lm_head": nplin(cfg.vocab_size, h),
    "layers": [dict(shared_layer) for _ in range(cfg.num_layers)],
}
ht = HostTeacher(teacher, cfg)  # casts to bf16 host-side (shared arrays stay shared)
print(f"host teacher built {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
mgr = HostSTManager(student, window=1, lr=1e-3, moment_dtype=np.float16)
print(f"host ST manager built {time.time()-t0:.0f}s; mem peak/now {mem_gb()}", flush=True)

SCAN = "noscan" not in sys.argv  # scan_blocks: the 32L-viable student forward
pv = PVConfig(chunk_tokens=CHUNK, scan_blocks=SCAN)
st_opt = optax.identity()
fns = make_pv_step(cfg, cfg, pv, st_opt=st_opt, teacher_kind="hidden")
active = mgr.active_window(0)
state = init_pv_state(student, optax.adamw(1e-4), st_opt, active_layers=active)

ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
t0 = time.time()
tbatch = ht.batch(ids)
jax.block_until_ready(tbatch["hidden"])
print(f"teacher hidden streamed {time.time()-t0:.0f}s; mem peak/now {mem_gb()}", flush=True)

t0 = time.time()
grad_fn = jax.jit(fns.grad_fn)
loss, (g_tr, g_st) = grad_fn(state, tbatch, ids)
jax.block_until_ready(loss)
print(f"grad step {time.time()-t0:.0f}s; loss={float(loss):.4f}; mem peak/now {mem_gb()}", flush=True)

mgr.adam_update(active, [{k: np.asarray(v) for k, v in e.items()} for e in g_st])
import dataclasses as _dc
state = _dc.replace(state, st_buffers=[
    {k: jnp.asarray(v) for k, v in e.items()} for e in mgr.fetch(active)
])
t0 = time.time()
state = fns.code_step(state, jax.random.PRNGKey(1), active=active)
jax.block_until_ready(jax.tree.leaves(state.frozen)[0])
print(f"V step (beam search, active block) {time.time()-t0:.0f}s; mem peak/now {mem_gb()}", flush=True)

peak, now = mem_gb()
if peak > 0:
    print(f"RESULT: peak HBM {peak:.2f} GB on {n_layers} layers, T={T}", flush=True)
    assert peak < 15.0, peak
else:
    # the axon tunnel exposes no memory_stats; completing grad+V steps on a
    # 16 GB chip without RESOURCE_EXHAUSTED is itself the memory bound
    print(f"RESULT: completed grad+V step on {n_layers} layers, T={T} "
          f"within 16 GB HBM (memory_stats unavailable through the tunnel)", flush=True)
