"""Generation / serving CLI + tokens-per-second benchmark.

Covers the reference's benchmark/generate_benchmark.py:97-106 (prints
`<Tokens per second>`) and gives a minimal serve loop over the
continuous-batching engine.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from aqlm_tpu.cli.common import dtype_from_str, load_tokenizer, resolve_model
from aqlm_tpu.serve import Engine, SamplingParams, ServeConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_path")
    p.add_argument("--prompt", type=str, default=None, help="text (needs tokenizer) or comma-separated ids")
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--max_batch", type=int, default=1)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--kv_int8", action="store_true")
    p.add_argument("--mode", choices=["reference", "codes", "int8", "int4"], default="int8")
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"], default="bfloat16")
    p.add_argument("--benchmark", action="store_true", help="print tokens/s like the reference generate benchmark")
    p.add_argument("--draft_model", type=str, default=None,
                   help="draft model spec for greedy speculative decoding (same formats as model_path)")
    p.add_argument("--draft_mode", choices=["reference", "codes", "int8", "int4"], default=None,
                   help="runtime mode for the draft model (defaults to --mode)")
    p.add_argument("--spec_k", type=int, default=4, help="draft tokens proposed per verify step")
    p.add_argument("--no_compile_cache", action="store_true",
                   help="disable the persistent XLA compile cache")
    return p


def _generate_speculative(args, params, cfg, prompt_ids, tokenizer):
    from aqlm_tpu.serve.speculative import SpeculativeDecoder

    dparams, dcfg, _ = resolve_model(
        args.draft_model, dtype=dtype_from_str(args.dtype), mode=args.draft_mode or args.mode
    )
    kw = dict(
        k=args.spec_k, max_len=args.max_len, kv_quantized=args.kv_int8,
        temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
    )
    dec = SpeculativeDecoder(params, cfg, dparams, dcfg, **kw)
    # compile warmup round, then the timed run
    dec.generate(prompt_ids, min(args.spec_k + 2, args.max_new_tokens))
    dec2 = SpeculativeDecoder(params, cfg, dparams, dcfg, **kw)
    t0 = time.time()
    tokens, stats = dec2.generate(prompt_ids, args.max_new_tokens)
    dt = time.time() - t0
    tps = len(tokens) / max(dt, 1e-9)
    if args.benchmark:
        print(f"<{tps:.2f} tokens per second>")
    out = {"tokens_per_second": round(tps, 2), "new_tokens": len(tokens),
           "acceptance": round(stats["acceptance"], 4)}
    if tokenizer is not None and tokens:
        out["text"] = tokenizer.decode(tokens)
    print(json.dumps(out))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.no_compile_cache:
        from aqlm_tpu.cli.common import enable_compile_cache

        enable_compile_cache()
    params, cfg, kind = resolve_model(args.model_path, dtype=dtype_from_str(args.dtype), mode=args.mode)

    tokenizer = load_tokenizer(args.model_path)
    if args.prompt is None:
        prompt_ids = np.arange(16, dtype=np.int32) % cfg.vocab_size
    elif all(c.isdigit() or c == "," for c in args.prompt):
        prompt_ids = np.asarray([int(t) for t in args.prompt.split(",")], np.int32)
    else:
        assert tokenizer is not None, "text prompt requires a tokenizer next to the model"
        prompt_ids = np.asarray(tokenizer(args.prompt).input_ids, np.int32)

    if args.draft_model is not None:
        _generate_speculative(args, params, cfg, prompt_ids, tokenizer)
        return

    bucket = 1 << max(5, int(np.ceil(np.log2(len(prompt_ids) + 1))))
    engine = Engine(
        params, cfg,
        ServeConfig(
            max_batch=args.max_batch, max_len=args.max_len,
            prefill_buckets=(bucket, args.max_len), kv_quantized=args.kv_int8,
            top_k=args.top_k,
        ),
    )
    sampling = SamplingParams(
        temperature=args.temperature, top_p=args.top_p,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=getattr(tokenizer, "eos_token_id", None) if tokenizer else None,
    )

    rid = engine.submit(prompt_ids, sampling)
    # first step pays compile; time the rest
    engine.step()
    t0 = time.time()
    n = 1
    while engine._active or engine._pending:
        if engine.step():
            n += 1
    dt = time.time() - t0
    tokens = engine.get_request(rid).generated
    if args.benchmark:
        print(f"<{(n - 1) / dt:.2f} tokens per second>")
    out = {"tokens_per_second": round((n - 1) / max(dt, 1e-9), 2), "new_tokens": n}
    if tokenizer is not None and tokens:
        out["text"] = tokenizer.decode(tokens)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
