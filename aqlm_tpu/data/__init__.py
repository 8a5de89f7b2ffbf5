"""Data layer: calibration loaders, preprocessing, perplexity evaluation."""

from aqlm_tpu.data.eval import evaluate_perplexity, evaluate_perplexity_sharded
from aqlm_tpu.data.loaders import get_loaders, group_texts, split_long_texts
from aqlm_tpu.data.scoring import make_lm_eval_adapter, score_batch, score_loglikelihood

__all__ = [
    "evaluate_perplexity",
    "evaluate_perplexity_sharded",
    "get_loaders",
    "group_texts",
    "split_long_texts",
    "make_lm_eval_adapter",
    "score_batch",
    "score_loglikelihood",
]
