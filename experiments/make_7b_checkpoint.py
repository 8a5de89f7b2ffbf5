"""Build random 7B checkpoints for the cold-start probe (CPU only, no tunnel).

Writes /tmp/aqlm_ckpt_7b/{canon,int8,codes}: a canonical 2x8 Llama-2-7B
checkpoint plus the materialized int8 and codes serving layouts
(cli/convert --to int8|codes). Weights are random — the probe measures
load -> first-token wall-clock, not quality.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")  # NEVER touch the tunnel from here
import jax.numpy as jnp

from aqlm_tpu.cli import convert as cli_convert
from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.io import save_quantized_model
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aqlm_ckpt_7b"
cfg = llama.ModelConfig.llama2_7b()

canon = os.path.join(ROOT, "canon")
if not os.path.exists(os.path.join(canon, "config.json")):
    t0 = time.time()
    params = random_quantized_params(
        jax.random.PRNGKey(0), cfg, SCHEME_2X8, mode="reference",
        dtype=jnp.bfloat16,
    )
    save_quantized_model(canon, params, cfg)
    del params
    print(f"canonical checkpoint written in {time.time()-t0:.0f}s", flush=True)

for mode in ("codes", "int8"):
    out = os.path.join(ROOT, mode)
    if os.path.exists(os.path.join(out, "config.json")):
        continue
    t0 = time.time()
    cli_convert.main([canon, out, "--to", mode])
    print(f"materialized {mode} in {time.time()-t0:.0f}s", flush=True)
print("DONE", flush=True)
