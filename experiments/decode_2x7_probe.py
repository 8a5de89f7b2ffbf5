"""Full-32L codes-resident decode with 128-entry codebooks (2x7 scheme).

VERDICT r3 item 3: with S=128 the LUT-GEMV kernel takes the single-gather
path (_split_lut returns one table half; no hi-gather, no mask, no select
per 128-code chunk) — the dominant VPU chain of the 2x8 decode kernel
halves. This measures the full-model decode rate at that operating point,
reusing bench.py's whole-model harness (same shapes, same KV cache, same
stacked scan). The quality cost of 2x7 (128-entry additive re-fit of 1x16
books, cli/convert --to 2x7) is gated separately by the quality ladder.

Run: python experiments/decode_2x7_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

from aqlm_tpu.config import AqlmScheme
from bench import build_full, dense_bf16_sol_tokens_per_sec, measure_mode
from aqlm_tpu.models import llama

import jax

print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)
cfg = llama.ModelConfig.llama2_7b()
dense_sol = dense_bf16_sol_tokens_per_sec(cfg)

scheme = AqlmScheme(2, 7, 8)  # S=128: single-gather LUT-GEMV
stacked = build_full(cfg, "codes", scheme, seed=1)
measure_mode(cfg, stacked, "codes-resident 2x7 (~2.0 bits in HBM, single-gather)",
             dense_sol, decode_steps=32)
