"""Data layer: calibration loaders, preprocessing, perplexity evaluation."""

from aqlm_tpu.data.eval import evaluate_perplexity
from aqlm_tpu.data.loaders import get_loaders, group_texts, split_long_texts

__all__ = ["evaluate_perplexity", "get_loaders", "group_texts", "split_long_texts"]
