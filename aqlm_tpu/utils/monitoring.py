"""Profiling + metrics: phase timers, optional wandb, JSONL fallback.

Covers the reference's observability surface (SURVEY.md §5.1/§5.5):
`print_runtime_stats` (/root/reference/src/pv_utils.py:120-136, cuda-synced
phase timer -> here device-synced via a sentinel fetch), try-import wandb
logging (/root/reference/main.py:29-34,860-879), and peak-memory reporting
(torch.cuda.max_memory_allocated -> jax device memory stats). For deep traces
use `jax.profiler.trace` directly; `profile_trace` wraps it.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax

__all__ = ["print_runtime_stats", "MetricLogger", "device_memory_stats", "profile_trace"]


@contextlib.contextmanager
def print_runtime_stats(operation: str, enabled: bool = True):
    """Device-synchronized wall-clock print per phase."""
    if not enabled:
        yield
        return
    jax.effects_barrier()
    start = time.perf_counter()
    try:
        yield
    finally:
        jax.effects_barrier()
        print(f"{operation} took {time.perf_counter() - start:.3f} s", flush=True)


def device_memory_stats(device=None) -> dict:
    """Live/peak HBM bytes (the reference reports cuda.max_memory_allocated,
    /root/reference/main.py:364-368)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace for TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """wandb when available and requested, JSONL on disk otherwise."""

    def __init__(self, use_wandb: bool = False, jsonl_path: str | None = None, config: dict | None = None):
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(config=config or {})
            except Exception as e:  # wandb missing or offline
                print(f"wandb unavailable ({e}); falling back to JSONL")
        self._jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)

    def log(self, payload: dict, step: int | None = None):
        if self._wandb is not None:
            self._wandb.log(payload, step=step)
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps({"step": step, **payload}) + "\n")
        if self._wandb is None and not self._jsonl_path:
            print(json.dumps({"step": step, **payload}), flush=True)
