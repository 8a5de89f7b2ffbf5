"""Layer-streamed model quantization driver.

TPU-native rebuild of quantize_aq (/root/reference/main.py:165-370): stream
activations layer by layer through the transformer; per block, capture X^T X
for every projection (plus the block's pre-quantization outputs as finetune
targets, main.py:463-467), quantize each projection with the AQ engine, swap
in reference-mode QuantizedLinear, optionally finetune the block against its
FP outputs, then propagate activations through the quantized block
(update_outs, main.py:525-551) and move on.

Differences from the reference:
- activation capture uses `block_forward_with_taps` (functional taps instead
  of module wrappers, cf. main.py:454-483's note that hooks are buggy);
- no ping-pong buffers or device juggling — hidden states are one array that
  gets replaced per layer; shard its batch axis on the mesh for data-parallel
  calibration (the psum over XTX happens inside XTXAccumulator.add when the
  inputs are sharded);
- resume checkpoints are .npz per layer instead of pickled modules.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.calib.blockwise import BlockFinetuneConfig, finetune_block
from aqlm_tpu.calib.engine import CalibConfig, XTXAccumulator, quantize_weight
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.io.checkpoint import load_layer_checkpoint, save_layer_checkpoint
from aqlm_tpu.models import llama
from aqlm_tpu.models.common import DenseLinear
from aqlm_tpu.models.llama import ModelConfig
from aqlm_tpu.ops.dequant import AqlmWeight
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = ["QuantizePipelineConfig", "quantize_model", "SEQUENTIAL_GROUPS"]

# the reference's true-sequential group order (src/modelutils.py:159-176)
SEQUENTIAL_GROUPS = (
    ("q_proj", "k_proj", "v_proj"),
    ("o_proj",),
    ("up_proj", "gate_proj"),
    ("down_proj",),
)


@dataclasses.dataclass
class QuantizePipelineConfig:
    scheme: AqlmScheme = dataclasses.field(default_factory=lambda: AqlmScheme(1, 16, 8))
    calib: CalibConfig = dataclasses.field(default_factory=CalibConfig)
    finetune: BlockFinetuneConfig | None = dataclasses.field(default_factory=BlockFinetuneConfig)
    true_sequential: bool = False
    batch_size: int = 4  # samples per activation-capture forward
    skip_names: tuple = ()  # projections to keep dense (e.g. mixtral .gate handled upstream)
    # per-projection scheme overrides: ((name_substring, AqlmScheme), ...) —
    # first match wins. Powers the reference's mixtral --mix_compression
    # (attention at 2x the codebooks of the experts, main.py:258-264);
    # per-weight schemes round-trip through the layer checkpoints.
    scheme_overrides: tuple = ()
    save_dir: str | None = None
    resume: bool = False
    offload_activations: bool = False  # keep hidden states in host RAM
    on_save: str | None = None  # python snippet exec'd after each layer save
    verbose: bool = True
    # multi-chip calibration (SURVEY §2.3): shard activation batches over the
    # mesh's data axis (XTX psum is implicit in the sharded contraction) and
    # the beam search's out-groups over the model axis
    mesh: object | None = None  # jax.sharding.Mesh
    data_axis: str = "data"
    model_axis: str = "model"


def _concat(parts, offload: bool):
    if offload:
        return np.concatenate([np.asarray(p) for p in parts], axis=0)
    return jnp.concatenate(parts, axis=0)


def _capture_taps(layer, cfg, hidden, positions, names, batch_size, taps_fn,
                  offload=False, place=jnp.asarray):
    """One pass over all samples: accumulate XTX per tap + block outputs.

    With offload=True, `hidden` lives in host RAM (numpy) and only one batch
    is resident on device at a time — the reference's --offload_activations
    (/root/reference/main.py:105-113). `place` puts a batch on device
    (sharded over the data axis for mesh calibration)."""
    jit_fn = jax.jit(lambda x, lyr: taps_fn(x, lyr, cfg, positions))
    accs = {}
    outs = []
    for start in range(0, hidden.shape[0], batch_size):
        xb = place(hidden[start : start + batch_size])
        out, taps = jit_fn(xb, layer)
        outs.append(np.asarray(out) if offload else out)
        for name in names:
            if name not in accs:
                accs[name] = XTXAccumulator.zeros(taps[name].shape[-1])
            accs[name] = accs[name].add(taps[name])
    return accs, _concat(outs, offload)


def _propagate(layer, cfg, hidden, positions, batch_size, taps_fn,
               offload=False, place=jnp.asarray):
    fwd = jax.jit(lambda x, lyr: taps_fn(x, lyr, cfg, positions)[0])
    outs = []
    for s in range(0, hidden.shape[0], batch_size):
        out = fwd(place(hidden[s : s + batch_size]), layer)
        outs.append(np.asarray(out) if offload else out)
    return _concat(outs, offload)


def quantize_model(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [nsamples, seqlen] calibration sequences
    pipeline: QuantizePipelineConfig,
    *,
    val_input_ids: jax.Array | None = None,
    taps_fn=llama.block_forward_with_taps,
    embed_fn=None,
) -> tuple[dict, dict]:
    """Quantize every block projection of a model in place.

    Works for any architecture exposing a block-taps function with the
    `(x, layer, cfg, positions) -> (out, {name: input})` contract — llama
    family by default, aqlm_tpu.models.mixtral.block_forward_with_taps for
    MoE (its expert taps are routing-masked).

    Returns (params with QuantizedLinear projections in "reference" mode,
    stats: per-layer out_loss / avg bits).
    """
    scheme = pipeline.scheme
    seqlen = input_ids.shape[1]
    positions = jnp.arange(seqlen)[None, :]

    offload = pipeline.offload_activations

    if pipeline.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def _place(x):
            x = jnp.asarray(x)
            spec = PartitionSpec(pipeline.data_axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(pipeline.mesh, spec))
    else:
        _place = jnp.asarray

    # layer-0 inputs: embedding lookup (the reference's Catcher, main.py:64-161).
    # embed_fn(params, ids, positions) overrides for architectures whose
    # layer-0 input is more than a token lookup (OPT's learned positions —
    # reference handles this in get_inps' family branches, main.py:92-99)
    def embed(ids):
        if ids is None:
            return None
        parts = []
        for s in range(0, ids.shape[0], pipeline.batch_size):
            batch = _place(ids[s : s + pipeline.batch_size])
            if embed_fn is not None:
                x = embed_fn(params, batch, jnp.broadcast_to(positions, batch.shape))
            else:
                x = jnp.take(params["embed"], batch, axis=0)
                if cfg.gemma_norm:
                    x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
            parts.append(np.asarray(x) if offload else x)
        return _concat(parts, offload)

    hidden = embed(input_ids)
    val_hidden = embed(val_input_ids)

    stats = {"out_loss": [], "avg_bits": None}
    total_bits = 0.0
    total_params = 0

    for li, layer in enumerate(params["layers"]):
        if pipeline.resume and pipeline.save_dir:
            loaded = load_layer_checkpoint(pipeline.save_dir, li, scheme)
            if loaded is not None:
                params["layers"][li] = layer = loaded
                hidden = _propagate(layer, cfg, hidden, positions, pipeline.batch_size, taps_fn, offload, place=_place)
                if val_hidden is not None:
                    val_hidden = _propagate(layer, cfg, val_hidden, positions, pipeline.batch_size, taps_fn, offload, place=_place)
                if pipeline.verbose:
                    print(f"layer {li}: loaded from checkpoint")
                continue

        # which projections to quantize: every dense linear not excluded
        # (mixtral's `moe_gate` goes through skip_names, cf. main.py:232-238)
        quantizable = tuple(
            n
            for n, v in layer.items()
            if isinstance(v, DenseLinear) and n not in pipeline.skip_names and n != "moe_gate"
        )
        if pipeline.true_sequential:
            groups = [tuple(n for n in g if n in quantizable) for g in SEQUENTIAL_GROUPS]
            leftover = tuple(n for n in quantizable if not any(n in g for g in groups))
            if leftover:
                groups.append(leftover)
        else:
            groups = (quantizable,)

        val_targets = None
        targets = None
        if val_hidden is not None:
            val_targets = _propagate(layer, cfg, val_hidden, positions, pipeline.batch_size, taps_fn, offload, place=_place)

        for names in groups:
            if not names:
                continue
            accs, targets = _capture_taps(
                layer, cfg, hidden, positions, names, pipeline.batch_size, taps_fn,
                offload, place=_place,
            )
            for name in names:
                dense: DenseLinear = layer[name]
                sch = next(
                    (s for pat, s in pipeline.scheme_overrides if pat in name), scheme
                )
                ref_w = dense.weight.astype(jnp.float32)
                qw, wstats = quantize_weight(ref_w, accs[name].mean, sch, pipeline.calib,
                                             mesh=pipeline.mesh, model_axis=pipeline.model_axis)
                qw = AqlmWeight(
                    codes=qw.codes, codebooks=qw.codebooks, scales=qw.scales,
                    bias=dense.bias, scheme=sch,
                )
                layer[name] = QuantizedLinear.from_aqlm(qw, mode="reference")
                bits = sch.estimate_nbits_per_parameter(
                    *ref_w.shape,
                    scale_nbits=pipeline.calib.scale_nbits,
                    codebook_value_nbits=pipeline.calib.codebook_value_nbits,
                    codebook_value_num_groups=pipeline.calib.codebook_value_num_groups,
                )
                total_bits += bits * ref_w.size
                total_params += ref_w.size
                if pipeline.verbose:
                    print(
                        f"layer {li} {name}: mse={wstats['final_mse']:.3e} "
                        f"bits/param={bits:.3f}"
                    )

            if pipeline.finetune is not None and pipeline.finetune.max_epochs > 0:
                layer = finetune_block(
                    layer, cfg, hidden, targets, pipeline.finetune,
                    valid_inps=val_hidden, valid_outs=val_targets, taps_fn=taps_fn,
                )
                params["layers"][li] = layer

        new_hidden = _propagate(layer, cfg, hidden, positions, pipeline.batch_size, taps_fn, offload, place=_place)
        # relative out loss vs the (last group's) pre-quantization targets
        out_loss = float("nan")
        if targets is not None:
            nh = np.asarray(new_hidden, np.float32) if offload else new_hidden.astype(jnp.float32)
            tg = np.asarray(targets, np.float32) if offload else targets.astype(jnp.float32)
            xp = np if offload else jnp
            out_loss = float(xp.mean((nh - tg) ** 2) / max(float(xp.mean(nh ** 2)), 1e-6))
        stats["out_loss"].append(out_loss)
        hidden = new_hidden
        if val_hidden is not None:
            val_hidden = _propagate(layer, cfg, val_hidden, positions, pipeline.batch_size, taps_fn, offload, place=_place)

        if pipeline.save_dir:
            save_layer_checkpoint(pipeline.save_dir, li, layer)
            if pipeline.on_save:
                # arbitrary user callback after each layer save, for slurm /
                # preemptible workflows (reference main.py:315-316, 632-638)
                exec(pipeline.on_save, {"layer_index": li, "save_dir": pipeline.save_dir})
        if pipeline.verbose:
            print(f"layer {li}: out_loss={out_loss:.3e}")

    stats["avg_bits"] = total_bits / max(total_params, 1)
    return params, stats
