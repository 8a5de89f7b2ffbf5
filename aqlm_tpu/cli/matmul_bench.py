"""Kernel-level matmul benchmark: dense bf16 vs quantized runtime modes.

Mirror of the reference's benchmark/matmul_benchmark.py:23-33,99-116 — the
gate_proj shapes of Llama-2 7B/13B/70B, per-kernel latency, speedup vs dense
and relative error vs the dequantize+matmul oracle.

    python -m aqlm_tpu.cli.matmul_bench --batch 1 --modes int8 codes
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import aqlm_matmul_reference, random_aqlm_weight
from aqlm_tpu.ops.runtime import QuantizedLinear, quantized_matmul
from aqlm_tpu.utils.timing import chain_time

# gate_proj shapes of Llama-2 7B / 13B / 70B (reference matmul_benchmark.py:23-33)
SHAPES = [(4096, 11008), (5120, 13824), (8192, 28672)]


def _apply(x, w):
    """Uniform matmul over dense bf16 arrays [OUT, IN] or QuantizedLinear."""
    if isinstance(w, QuantizedLinear):
        return quantized_matmul(x, w)
    return (x @ w.T).astype(x.dtype)


def _bench_pairs(fwd_weights, bwd_weights, in_f, batch, n_steps=20):
    """Chain fwd/bwd-shaped matmuls; weights ride jit args (consts) so they
    are neither baked as HLO constants nor cached in VMEM across copies."""

    def stepw(x, cs):
        a, b = cs
        for wa, wb in zip(a, b):
            x = _apply(_apply(x, wa), wb)
        return x

    x0 = jnp.ones((batch, in_f), jnp.bfloat16)
    consts = (tuple(fwd_weights), tuple(bwd_weights))
    t = chain_time(stepw, x0, n_steps=n_steps, consts=consts) / (2 * len(fwd_weights))
    return t


def bench_shape(in_f, out_f, scheme: AqlmScheme, batch: int, modes, n_copies=2):
    results = {}

    def dense_w(j, o, i):
        return (jax.random.normal(jax.random.PRNGKey(j), (o, i), jnp.float32) * 0.02).astype(jnp.bfloat16)

    dense_t = _bench_pairs(
        [dense_w(j, out_f, in_f) for j in range(n_copies)],
        [dense_w(100 + j, in_f, out_f) for j in range(n_copies)],
        in_f, batch,
    )
    results["dense_bf16_us"] = dense_t * 1e6

    for mode in modes:
        def q_w(j, o, i):
            w = random_aqlm_weight(jax.random.PRNGKey(j), scheme, o, i)
            return QuantizedLinear.from_aqlm(w, mode=mode)

        try:
            t = _bench_pairs(
                [q_w(j, out_f, in_f) for j in range(n_copies)],
                [q_w(100 + j, in_f, out_f) for j in range(n_copies)],
                in_f, batch,
            )
            # relative error vs the reference oracle
            w = random_aqlm_weight(jax.random.PRNGKey(0), scheme, out_f, in_f)
            q = QuantizedLinear.from_aqlm(w, mode=mode)
            x = jax.random.normal(jax.random.PRNGKey(1), (batch, in_f), jnp.float32)
            ref = np.asarray(aqlm_matmul_reference(x, w), np.float32)
            got = np.asarray(quantized_matmul(x.astype(jnp.bfloat16), q), np.float32)
            rel = float(np.abs(got - ref).max() / np.abs(ref).max())
            results[f"{mode}_us"] = t * 1e6
            results[f"{mode}_speedup"] = dense_t / t
            results[f"{mode}_rel_err"] = rel
        except Exception as e:
            results[f"{mode}_error"] = repr(e)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scheme", default="1x16")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--modes", nargs="+", default=["int8", "codes"])
    p.add_argument("--shapes", nargs="*", type=int, default=None,
                   help="flat pairs: in1 out1 in2 out2 ...")
    args = p.parse_args(argv)
    scheme = AqlmScheme.parse(args.scheme)
    shapes = SHAPES
    if args.shapes:
        shapes = list(zip(args.shapes[::2], args.shapes[1::2]))
    out = {}
    for in_f, out_f in shapes:
        r = bench_shape(in_f, out_f, scheme, args.batch, args.modes)
        out[f"{in_f}x{out_f}"] = r
        msg = f"{in_f}x{out_f}: dense {r['dense_bf16_us']:.1f} us"
        for m in args.modes:
            if f"{m}_us" in r:
                msg += f" | {m} {r[f'{m}_us']:.1f} us ({r[f'{m}_speedup']:.2f}x, err {r[f'{m}_rel_err']:.4f})"
        print(msg)
    print(json.dumps(out, default=float))
    return out


if __name__ == "__main__":
    main()
