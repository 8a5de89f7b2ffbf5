"""Checkpoint conversion CLI: canonical <-> HF AQLM hub format.

Replaces the reference's convert_to_hf.py and convert_legacy_model_format.py
surface — but with ONE canonical format, the only conversions needed are to
and from the HF hub layout.
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
    p.add_argument("--to", choices=["hf", "canonical", "2x8"], required=True,
                   help="2x8: re-fit 1x16 codebooks as sums of two 256-entry "
                        "books (TPU codes-resident serving; reports rel-MSE)")
    p.add_argument("--transcode_iters", type=int, default=25)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from aqlm_tpu.cli.common import resolve_model

    params, cfg, kind = resolve_model(args.input, mode="reference")
    assert kind == "quantized", "conversion applies to quantized checkpoints"

    if args.to == "canonical":
        from aqlm_tpu.io import save_quantized_model

        save_quantized_model(args.output, params, cfg)
    elif args.to == "2x8":
        from aqlm_tpu.io import save_quantized_model
        from aqlm_tpu.ops.dequant import AqlmWeight
        from aqlm_tpu.ops.runtime import QuantizedLinear
        from aqlm_tpu.ops.transcode import transcode_1x16_to_2x8

        worst = 0.0
        for li, layer in enumerate(params["layers"]):
            for name, q in list(layer.items()):
                if isinstance(q, QuantizedLinear) and q.scheme.nbits_per_codebook == 16:
                    w = AqlmWeight(codes=q.codes, codebooks=q.codebooks,
                                   scales=q.scales, bias=q.bias, scheme=q.scheme)
                    w2, rel = transcode_1x16_to_2x8(w, iters=args.transcode_iters)
                    layer[name] = QuantizedLinear.from_aqlm(w2, mode="reference")
                    worst = max(worst, rel)
                    print(f"layer {li} {name}: codebook rel-MSE {rel:.4f}")
        save_quantized_model(args.output, params, cfg,
                             extra_config={"transcoded_from": "1x16", "worst_rel_mse": worst})
        print(f"worst per-projection codebook rel-MSE: {worst:.4f}")
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
