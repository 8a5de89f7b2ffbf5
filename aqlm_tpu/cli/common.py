"""Shared CLI plumbing: model resolution, tokenizer loading, data."""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from aqlm_tpu.data import get_loaders
from aqlm_tpu.models import llama

__all__ = [
    "resolve_model", "load_tokenizer", "load_calibration_data",
    "dtype_from_str", "enable_compile_cache",
]


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache for the serving CLIs.

    A cold 7B engine compile measured up to 103 s (BENCH_r04); with the
    cache, a repeat process start replays executables from disk instead of
    recompiling. AQLM_COMPILE_CACHE overrides the location. NOTE: kept out
    of library import paths — 70B-real-width CPU executables abort the cache
    writer on serialize (NOTES.md r4d), so only the serving CLIs opt in."""
    import jax

    path = path or os.environ.get(
        "AQLM_COMPILE_CACHE", os.path.expanduser("~/.cache/aqlm_tpu_jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def dtype_from_str(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "auto": jnp.float32}[name]


def resolve_model(spec: str, *, dtype=jnp.float32, mode: str = "reference"):
    """Load a model from one of:
    - `random:<preset>[:layers]` — random weights (smoke tests; presets are
      ModelConfig classmethods, e.g. random:tiny, random:llama2_7b:2)
    - a directory with our canonical format (config.json has "model_config")
    - an HF checkpoint dir: quantized (has quantization_config) or dense.

    Returns (params, cfg, kind) with kind in {dense, quantized}.
    """
    if spec.startswith("random:"):
        parts = spec.split(":")
        preset = parts[1]
        cfg = getattr(llama.ModelConfig, preset)()
        if len(parts) > 2:
            cfg = dataclasses.replace(cfg, num_layers=int(parts[2]))
        import jax

        params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
        return params, cfg, "dense"

    config_path = os.path.join(spec, "config.json")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"no config.json under {spec}")
    with open(config_path) as f:
        config = json.load(f)

    if "model_config" in config:  # our canonical format
        from aqlm_tpu.io import load_quantized_model

        params, cfg = load_quantized_model(spec)
        stored = config.get("runtime_mode", "reference")
        if stored == mode or all(
            not hasattr(v, "mode") for l in params["layers"] for v in l.values()
        ):
            return params, cfg, "quantized"
        if stored != "reference":
            raise ValueError(
                f"{spec} is a materialized {stored!r} checkpoint; requested "
                f"mode {mode!r} needs the canonical checkpoint (or reconvert "
                f"with `convert --to {mode}`)"
            )
        if mode != "reference":
            # load-time transcode (slow for big models); `convert --to
            # <mode>` materializes the layout once so serving starts cold in
            # seconds instead
            from aqlm_tpu.models.quantize import convert_runtime_mode

            params = convert_runtime_mode(params, mode)
        return params, cfg, "quantized"
    if config.get("quantization_config"):
        from aqlm_tpu.io import load_hf_aqlm_checkpoint

        params, cfg, _ = load_hf_aqlm_checkpoint(spec, mode=mode, dtype=dtype)
        return params, cfg, "quantized"
    from aqlm_tpu.io import hf_import

    # family dispatch by HF model_type (the reference's get_model tables,
    # /root/reference/src/modelutils.py:48-114,140-176)
    loader = {
        "falcon": hf_import.load_hf_falcon_checkpoint,
        "opt": hf_import.load_hf_opt_checkpoint,
        "cohere": hf_import.load_hf_cohere_checkpoint,
        "mixtral": hf_import.load_hf_mixtral_checkpoint,
    }.get(config.get("model_type"), hf_import.load_hf_dense_checkpoint)
    params, cfg = loader(spec, dtype=dtype)
    return params, cfg, "dense"


def load_tokenizer(spec: str):
    """HF tokenizer if the path carries one; None otherwise (random data)."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(spec)
    except Exception:
        return None


def load_calibration_data(dataset: str, nsamples: int, seqlen: int, model_spec: str, cfg, seed: int = 0, eval_mode: bool = False):
    tokenizer = None
    if dataset not in ("random",) and not os.path.exists(dataset):
        tokenizer = load_tokenizer(model_spec)
    ids = get_loaders(
        dataset, nsamples=nsamples, seqlen=seqlen, tokenizer=tokenizer,
        vocab_size=cfg.vocab_size, seed=seed, eval_mode=eval_mode,
    )
    return jnp.asarray(np.asarray(ids))
