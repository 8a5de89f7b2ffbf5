"""Calibration / evaluation data loaders.

TPU-native analogue of /root/reference/src/datautils.py:177-286
(`get_loaders` for wikitext2 / ptb / c4 / pajama / custom files) plus the
finetune preprocessing helpers (`split_long_texts` :255, `group_texts` :269).

HF `datasets` downloads are attempted lazily; in air-gapped environments use
dataset="random" (matching the layout/dtype contract of the real loaders) or
point `custom_data_path` at a pre-tokenized .npy/.npz of token ids, which is
the reference's own escape hatch (datautils.py:181-199).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["get_loaders", "split_long_texts", "group_texts"]


def _random_tokens(nsamples: int, seqlen: int, vocab_size: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, vocab_size, size=(nsamples, seqlen), dtype=np.int32)


def _load_custom(path: str, nsamples: int, seqlen: int) -> np.ndarray:
    """Pre-tokenized ids from .npy/.npz (flat stream or [n, seqlen])."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            tokens = data[data.files[0]]
    else:
        tokens = np.load(path)
    tokens = np.asarray(tokens)
    if tokens.ndim == 1:
        n_avail = len(tokens) // seqlen
        tokens = tokens[: n_avail * seqlen].reshape(n_avail, seqlen)
    if nsamples > 0:
        tokens = tokens[:nsamples]
    return tokens.astype(np.int32)


def _load_hf_dataset(name: str, nsamples: int, seqlen: int, tokenizer, seed: int, eval_mode: bool):
    """wikitext2/ptb/c4/pajama via HF datasets (requires network or local cache).

    Follows the reference's sampling protocol (datautils.py:35-120): join the
    corpus, then for calibration draw nsamples random seqlen windows; for eval
    return the full tokenized test split (GPTQ protocol).
    """
    from datasets import load_dataset  # deferred: requires datasets pkg + cache

    specs = {
        "wikitext2": dict(path="wikitext", name="wikitext-2-raw-v1", split="test" if eval_mode else "train", field="text", join="\n\n"),
        "ptb": dict(path="ptb_text_only", name="penn_treebank", split="test" if eval_mode else "train", field="sentence", join=" "),
        "c4": dict(path="allenai/c4", name="en", split="validation" if eval_mode else "train", field="text", join=" "),
        "pajama": dict(path="togethercomputer/RedPajama-Data-1T-Sample", name=None, split="train", field="text", join=" "),
    }
    if name not in specs:
        raise ValueError(f"unknown dataset {name!r}; options: {sorted(specs)} | random | a .npy/.npz path")
    spec = specs[name]
    ds = load_dataset(spec["path"], spec["name"], split=spec["split"])
    text = spec["join"].join(ds[spec["field"]])
    ids = np.asarray(tokenizer(text, return_tensors="np").input_ids[0], np.int32)

    if eval_mode:
        n = len(ids) // seqlen
        return ids[: n * seqlen].reshape(n, seqlen)

    rng = np.random.RandomState(seed)
    samples = []
    for _ in range(nsamples):
        start = rng.randint(0, len(ids) - seqlen - 1)
        samples.append(ids[start : start + seqlen])
    return np.stack(samples)


def get_loaders(
    name: str,
    nsamples: int = 128,
    seqlen: int = 4096,
    *,
    tokenizer=None,
    vocab_size: int = 32000,
    seed: int = 0,
    eval_mode: bool = False,
) -> np.ndarray:
    """Returns token ids [nsamples, seqlen] int32 (or [all, seqlen] in eval mode).

    `name`: wikitext2 | ptb | c4 | pajama | random | path to .npy/.npz.
    Mirrors the get_loaders contract (/root/reference/src/datautils.py:177-230)
    with arrays instead of torch tensors.
    """
    if name == "random":
        return _random_tokens(nsamples, seqlen, vocab_size, seed)
    if os.path.exists(name) or name.endswith((".npy", ".npz")):
        return _load_custom(name, nsamples, seqlen)
    if tokenizer is None:
        raise ValueError(f"dataset {name!r} requires a tokenizer")
    return _load_hf_dataset(name, nsamples, seqlen, tokenizer, seed, eval_mode)


def split_long_texts(texts, max_chars: int):
    """Split overly long documents (reference datautils.py:255-266)."""
    out = []
    for t in texts:
        for start in range(0, len(t), max_chars):
            out.append(t[start : start + max_chars])
    return out


def group_texts(token_lists, seqlen: int, add_labels: bool = False):
    """Concatenate tokenized docs and regroup into seqlen chunks
    (reference datautils.py:269-286)."""
    flat = np.concatenate([np.asarray(t, np.int32).reshape(-1) for t in token_lists])
    n = len(flat) // seqlen
    ids = flat[: n * seqlen].reshape(n, seqlen)
    if add_labels:
        return {"input_ids": ids, "labels": ids.copy()}
    return ids
