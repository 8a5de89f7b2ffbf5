"""Checkpoint conversion CLI: canonical <-> HF AQLM hub format, plus import
of the reference's legacy formats.

Replaces the reference's convert_to_hf.py and convert_legacy_model_format.py
surface with ONE canonical format. `--from_format legacy` / `legacy_fsdp`
ingest the reference's pickled calibration checkpoints (main.py:310-316) and
PV/FSDP per-tensor checkpoints (convert_legacy_model_format.py:71-101)
without needing the reference source tree (io/legacy_import.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="model dir (canonical or HF AQLM)")
    p.add_argument("output", help="destination dir")
    p.add_argument("--to", choices=["hf", "canonical", "2x8", "2x7", "requant",
                                    "int8", "int4", "codes"], required=True,
                   help="2x8: re-fit 1x16 codebooks as sums of two 256-entry "
                        "books (TPU codes-resident serving; reports rel-MSE); "
                        "2x7: same with 128-entry books (~2.0 bits) — decode "
                        "takes the single-gather LUT path, ~2x fewer VPU "
                        "gathers than 2x8, at a fit-error cost; "
                        "requant: fit a fresh --scheme to the dequantized "
                        "weights (weight-L2, no calibration data — e.g. a "
                        "1x8 draft model for speculative serving); "
                        "int8|int4|codes: MATERIALIZE the runtime serving "
                        "layout (w8/w4/tiled codes) into the checkpoint so "
                        "serving loads it directly — the load-time transcode "
                        "costs 94-310 s for a 7B model")
    p.add_argument("--transcode_iters", type=int, default=25)
    p.add_argument("--scheme", default="1x8",
                   help="destination scheme for --to requant (e.g. 1x8, 2x8, 8x8)")
    p.add_argument("--refine_iters", type=int, default=2,
                   help="requant: alternating L2-beam-search/codebook-lstsq rounds")
    p.add_argument("--beam_size", type=int, default=2)
    p.add_argument("--from_format", choices=["auto", "legacy", "legacy_fsdp"],
                   default="auto",
                   help="legacy: reference calibration dir ({i}.pth pickled "
                        "layers); legacy_fsdp: PV per-tensor dir "
                        "(model.layers.*.weight.pth). Both need --base_config")
    p.add_argument("--base_config", default=None,
                   help="model dims for legacy imports: a ModelConfig preset "
                        "name (e.g. llama2_7b, tiny) or a path to an HF "
                        "config.json (the reference's --base_model analogue)")
    return p


def _legacy_base_config(spec: str):
    from aqlm_tpu.models import llama

    if spec is None:
        raise SystemExit("--from_format legacy requires --base_config")
    if os.path.isfile(spec) or os.path.isdir(spec):
        from aqlm_tpu.io.hf_import import model_config_from_hf

        path = spec if os.path.isfile(spec) else os.path.join(spec, "config.json")
        with open(path) as f:
            return model_config_from_hf(json.load(f))
    return getattr(llama.ModelConfig, spec)()


def main(argv=None):
    args = build_parser().parse_args(argv)
    from aqlm_tpu.cli.common import resolve_model

    if args.from_format != "auto":
        from aqlm_tpu.io.legacy_import import (
            load_legacy_checkpoint,
            load_legacy_fsdp_checkpoint,
        )

        cfg = _legacy_base_config(args.base_config)
        loader = (load_legacy_checkpoint if args.from_format == "legacy"
                  else load_legacy_fsdp_checkpoint)
        params, _scheme, notes = loader(args.input, cfg, mode="reference")
        for n in notes:
            print(f"import note: {n}")
        kind = "quantized"
    else:
        params, cfg, kind = resolve_model(args.input, mode="reference")
    assert kind == "quantized", "conversion applies to quantized checkpoints"

    if args.to == "canonical":
        from aqlm_tpu.io import save_quantized_model

        save_quantized_model(args.output, params, cfg)
    elif args.to in ("int8", "int4", "codes"):
        from aqlm_tpu.io import save_quantized_model
        from aqlm_tpu.models.quantize import convert_runtime_mode

        params = convert_runtime_mode(params, args.to)
        save_quantized_model(args.output, params, cfg)
    elif args.to in ("2x8", "2x7"):
        from aqlm_tpu.io import save_quantized_model
        from aqlm_tpu.ops.dequant import AqlmWeight
        from aqlm_tpu.ops.runtime import QuantizedLinear
        from aqlm_tpu.ops.transcode import transcode_1x16_to_2xN

        nbits = int(args.to[-1])
        worst = 0.0
        for li, layer in enumerate(params["layers"]):
            for name, q in list(layer.items()):
                if isinstance(q, QuantizedLinear) and q.scheme.nbits_per_codebook == 16:
                    w = AqlmWeight(codes=q.codes, codebooks=q.codebooks,
                                   scales=q.scales, bias=q.bias, scheme=q.scheme)
                    w2, rel = transcode_1x16_to_2xN(
                        w, nbits=nbits, iters=args.transcode_iters)
                    layer[name] = QuantizedLinear.from_aqlm(w2, mode="reference")
                    worst = max(worst, rel)
                    print(f"layer {li} {name}: codebook rel-MSE {rel:.4f}")
        save_quantized_model(args.output, params, cfg,
                             extra_config={"transcoded_from": "1x16", "worst_rel_mse": worst})
        print(f"worst per-projection codebook rel-MSE: {worst:.4f}")
    elif args.to == "requant":
        from aqlm_tpu.calib.requantize import requantize_params
        from aqlm_tpu.config import AqlmScheme
        from aqlm_tpu.io import save_quantized_model

        scheme = AqlmScheme.parse(args.scheme)
        params, worst = requantize_params(
            params, scheme, refine_iters=args.refine_iters,
            beam_size=args.beam_size, verbose=True,
        )
        save_quantized_model(args.output, params, cfg,
                             extra_config={"requantized_to": args.scheme,
                                           "worst_rel_mse": worst})
        print(f"worst per-projection weight rel-MSE: {worst:.4f}")
    else:
        from aqlm_tpu.io import export_hf_aqlm_state_dict

        sd, qcfg = export_hf_aqlm_state_dict(params, cfg)
        os.makedirs(args.output, exist_ok=True)
        hf_config = {
            "model_type": "llama",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "rope_theta": cfg.rope_theta,
            "rms_norm_eps": cfg.rms_eps,
            "max_position_embeddings": cfg.max_position_embeddings,
            "tie_word_embeddings": cfg.tie_embeddings,
            "torch_dtype": "float16",
            "quantization_config": qcfg,
        }
        with open(os.path.join(args.output, "config.json"), "w") as f:
            json.dump(hf_config, f, indent=2)
        try:
            from safetensors.numpy import save_file

            save_file(sd, os.path.join(args.output, "model.safetensors"))
        except ImportError:
            import torch

            torch.save(
                {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
                os.path.join(args.output, "pytorch_model.bin"),
            )
    print(f"converted {args.input} ({kind}) -> {args.output} [{args.to}]")


if __name__ == "__main__":
    main()
