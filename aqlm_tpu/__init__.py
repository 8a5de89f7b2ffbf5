"""aqlm_tpu: a TPU-native additive-quantization (AQLM) framework.

JAX/XLA/Pallas re-design of the capabilities of Vahe1994/AQLM: extreme LLM
weight compression (1x16, 2x8, 8x8, 1x8 codebook schemes) with fused
dequant-matmul TPU kernels, a quantization/calibration pipeline, PV-tuning,
and a sharded serving stack.
"""

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, aqlm_matmul_reference

__version__ = "0.1.0"
