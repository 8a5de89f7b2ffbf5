"""Evaluation CLI: perplexity (GPTQ protocol) + optional lm-eval harness.

TPU-native analogue of perplexity_eval (/root/reference/main.py:372-424) and
the lmeval.py glue (/root/reference/lmeval.py:150-237): quantized checkpoints
are loaded natively (no from_pretrained monkeypatch needed) and, when the
`lm_eval` package is importable, zero-shot tasks run against our generate
loop.
"""

from __future__ import annotations

import argparse
import json

from aqlm_tpu.cli.common import dtype_from_str, load_calibration_data, resolve_model
from aqlm_tpu.data import evaluate_perplexity


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_path")
    p.add_argument("--datasets", nargs="+", default=["wikitext2"])
    p.add_argument("--model_seqlen", type=int, default=4096)
    p.add_argument("--nsamples", type=int, default=0, help="0 = full eval split")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"], default="auto")
    p.add_argument("--mode", choices=["reference", "codes", "int8", "int4"], default="reference")
    p.add_argument("--tasks", nargs="*", default=[], help="lm-eval harness tasks (requires lm_eval)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help=">1: shard PPL windows over a data-axis mesh (multi-chip eval)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    params, cfg, kind = resolve_model(args.model_path, dtype=dtype_from_str(args.dtype), mode=args.mode)
    results = {"model": args.model_path, "kind": kind}
    for ds in args.datasets:
        ids = load_calibration_data(
            ds, args.nsamples, args.model_seqlen, args.model_path, cfg, eval_mode=True
        )
        if args.nsamples:
            ids = ids[: args.nsamples]
        from aqlm_tpu.models.family import forward_fn

        if args.mesh_data > 1:
            from aqlm_tpu.data import evaluate_perplexity_sharded
            from aqlm_tpu.parallel import make_mesh

            ppl = evaluate_perplexity_sharded(
                params, cfg, ids, make_mesh(data=args.mesh_data, model=1),
                rows_per_device=max(1, args.batch_size // args.mesh_data),
                forward_fn=forward_fn(cfg),
            )
        else:
            ppl = evaluate_perplexity(
                params, cfg, ids, batch_size=args.batch_size, forward_fn=forward_fn(cfg)
            )
        results[f"ppl_{ds}"] = ppl
        print(f"{ds} perplexity: {ppl:.4f}")

    if args.tasks:
        try:
            import lm_eval
        except ImportError:
            print("lm_eval not installed; skipping harness tasks")
        else:
            from aqlm_tpu.cli.common import load_tokenizer
            from aqlm_tpu.data import make_lm_eval_adapter

            tokenizer = load_tokenizer(args.model_path)
            assert tokenizer is not None, "harness tasks need a tokenizer next to the model"
            from aqlm_tpu.models.family import forward_fn as _family_forward

            lm = make_lm_eval_adapter(params, cfg, tokenizer, forward_fn=_family_forward(cfg))
            harness = lm_eval.simple_evaluate(model=lm, tasks=args.tasks)
            results["lm_eval"] = harness["results"]
            print(json.dumps(harness["results"], default=str))

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
