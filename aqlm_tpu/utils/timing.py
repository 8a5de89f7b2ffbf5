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


def chain_time(
    step_fn, init, n_steps: int = 50, n_repeats: int = 3, warmup: int = 1, consts=None
):
    """Median per-step device time of ``step_fn`` chained ``n_steps`` times.

    ``step_fn(carry[, consts]) -> carry`` must return the same pytree
    structure/shape as its input so iterations are data-dependent (prevents
    hoisting). Large weights MUST be passed via ``consts`` (a pytree handed
    to the jit as an argument) — if the step closes over them they are
    embedded as HLO constants and uploaded with the program, which both
    overstates VMEM residency and blows the remote-compile request limit.

    HOISTING TRAP: any sub-computation that depends ONLY on ``consts`` is
    loop-invariant and XLA lifts it out of the chained loop — e.g. a
    dequantize feeding a matmul gets measured once instead of n times. If
    the op under test transforms consts, inject a carry dependence into
    them first (e.g. ``c = cs + (carry.ravel()[:1] * 0).astype(cs.dtype)``).
    Opaque pallas_calls are not hoisted; pure-XLA subgraphs are.
    """

    @partial(jax.jit, static_argnames=("n",))
    def run(x, cs, n):
        if consts is None:
            body = lambda i, c: step_fn(c)
        else:
            body = lambda i, c: step_fn(c, cs)
        out = jax.lax.fori_loop(0, n, body, x)
        # Scalar checksum: jax.block_until_ready does NOT actually block
        # through the axon tunnel — only fetching a value does. Reducing to a
        # scalar keeps the transfer constant-size (subtracted via the n=0
        # baseline below).
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def fetch(n):
        return float(jax.device_get(run(init, consts, n)))

    # compile BOTH variants before timing anything
    fetch(n_steps)
    fetch(0)
    for _ in range(warmup):
        fetch(n_steps)

    def measure(n):
        ts = []
        for _ in range(n_repeats):
            t0 = time.perf_counter()
            fetch(n)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    med = measure(n_steps)
    base = measure(0)  # dispatch + loop setup overhead
    return max(med - base, 1e-9) / n_steps


def dispatch_time(fn, *args, iters: int = 30):
    """Wall-clock per call including dispatch — for end-to-end latency checks.

    The final output is fetched (not just block_until_ready'd, which is a
    no-op through the axon tunnel) so the measurement covers real completion
    of all queued calls.
    """
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters
