"""Calibration pipeline: XTX capture, k-means init, beam search, per-layer engine."""

from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2, find_optimal_codebooks
from aqlm_tpu.calib.beam_search_xtx import beam_search_optimal_codes, channelwise_squared_error
from aqlm_tpu.calib.blockwise import BlockFinetuneConfig, finetune_block
from aqlm_tpu.calib.parallel import beam_search_optimal_codes_sharded, shard_calibration_batch
from aqlm_tpu.calib.pipeline import QuantizePipelineConfig, SEQUENTIAL_GROUPS, quantize_model
from aqlm_tpu.calib.engine import (
    CalibConfig,
    XTXAccumulator,
    compute_mse,
    init_quantized_weight,
    quantize_weight,
)
from aqlm_tpu.calib.kmeans import find_nearest_cluster, fit_kmeans, fit_kmeans_1d

__all__ = [
    "beam_search_optimal_codes_l2",
    "find_optimal_codebooks",
    "BlockFinetuneConfig",
    "finetune_block",
    "QuantizePipelineConfig",
    "SEQUENTIAL_GROUPS",
    "quantize_model",
    "beam_search_optimal_codes_sharded",
    "shard_calibration_batch",
    "beam_search_optimal_codes",
    "channelwise_squared_error",
    "CalibConfig",
    "XTXAccumulator",
    "compute_mse",
    "init_quantized_weight",
    "quantize_weight",
    "find_nearest_cluster",
    "fit_kmeans",
    "fit_kmeans_1d",
]
