"""Device-time measurement that survives high dispatch latency.

The dev environment reaches the TPU through a tunnel with ~0.3-1 ms dispatch
overhead per call, which swamps microsecond kernels. We therefore time a
chain of ``n`` dependent applications inside ONE jitted computation
(``lax.fori_loop`` with data dependence so XLA cannot hoist or CSE the body),
and divide by ``n``. The same harness backs ``bench.py``.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["chain_time", "dispatch_time"]


def chain_time(step_fn, init, n_steps: int = 50, n_repeats: int = 3, warmup: int = 1):
    """Median per-step device time of ``step_fn`` chained ``n_steps`` times.

    ``step_fn(carry) -> carry`` must return the same pytree structure/shape
    as its input so iterations are data-dependent (prevents hoisting).
    """

    @partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), x)

    # compile BOTH variants before timing anything
    jax.block_until_ready(run(init, n_steps))
    jax.block_until_ready(run(init, 0))
    for _ in range(warmup):
        jax.block_until_ready(run(init, n_steps))

    def measure(n):
        ts = []
        for _ in range(n_repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run(init, n))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    med = measure(n_steps)
    base = measure(0)  # dispatch + loop setup overhead
    return max(med - base, 1e-9) / n_steps


def dispatch_time(fn, *args, iters: int = 30):
    """Wall-clock per call including dispatch — for end-to-end latency checks."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
