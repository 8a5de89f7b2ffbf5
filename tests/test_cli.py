"""CLI end-to-end tests: quantize -> evaluate -> finetune -> convert on a
random tiny model, exercising the argparse surfaces in-process."""

import json
import os

import numpy as np
import pytest

from aqlm_tpu.cli import convert as cli_convert
from aqlm_tpu.cli import evaluate as cli_evaluate
from aqlm_tpu.cli import finetune as cli_finetune
from aqlm_tpu.cli import quantize as cli_quantize


@pytest.fixture(scope="module")
def quantized_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "qmodel")
    stats = cli_quantize.main(
        [
            "random:tiny:1", "random",
            "--nsamples", "4", "--model_seqlen", "16",
            "--num_codebooks", "2", "--nbits_per_codebook", "6", "--in_group_size", "4",
            "--max_epochs", "1", "--steps_per_epoch", "3", "--beam_size", "1",
            "--init_max_iter", "4", "--finetune_max_epochs", "0",
            "--batch_size", "2", "--save", out,
            "--eval_datasets", "random", "--eval_nsamples", "2",
        ]
    )
    assert 2.0 < stats["avg_bits"] < 9.0
    assert np.isfinite(stats["ppl_random"])
    return out


def test_quantize_cli(quantized_dir):
    assert os.path.exists(os.path.join(quantized_dir, "config.json"))
    assert os.path.exists(os.path.join(quantized_dir, "layer_0.npz"))


def test_evaluate_cli(quantized_dir):
    results = cli_evaluate.main(
        [quantized_dir, "--datasets", "random", "--nsamples", "2", "--model_seqlen", "16"]
    )
    assert results["kind"] == "quantized"
    assert np.isfinite(results["ppl_random"])


@pytest.mark.slow
def test_finetune_cli(quantized_dir, tmp_path):
    out = str(tmp_path / "pv")
    result = cli_finetune.main(
        [
            "--base_model", "random:tiny:1",
            "--quantized_model", quantized_dir,
            "--dataset", "random", "--nsamples", "4", "--model_seqlen", "16",
            "--batch_size", "2", "--total_steps", "4", "--code_update_every", "2",
            "--max_code_change_per_step", "0.2", "--save", out,
        ]
    )
    assert np.isfinite(result["final_kl"])
    assert os.path.exists(os.path.join(out, "config.json"))


@pytest.mark.slow
def test_finetune_resume(quantized_dir, tmp_path):
    out = str(tmp_path / "pv_resume")
    common = [
        "--base_model", "random:tiny:1",
        "--quantized_model", quantized_dir,
        "--dataset", "random", "--nsamples", "4", "--model_seqlen", "16",
        "--batch_size", "2", "--code_update_every", "0",
        "--save", out, "--save_state_every", "2",
    ]
    # run 4 steps in one go
    full = cli_finetune.main(common + ["--total_steps", "4"])
    # run 2 steps, then resume for the remaining 2
    out2 = str(tmp_path / "pv_resume2")
    common2 = [a if a != out else out2 for a in common]
    cli_finetune.main(common2 + ["--total_steps", "2"])
    resumed = cli_finetune.main(common2 + ["--total_steps", "4", "--resume"])
    np.testing.assert_allclose(resumed["final_kl"], full["final_kl"], rtol=1e-4)


def test_convert_cli(quantized_dir, tmp_path):
    hf_dir = str(tmp_path / "hf")
    cli_convert.main([quantized_dir, hf_dir, "--to", "hf"])
    with open(os.path.join(hf_dir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["quantization_config"]["quant_method"] == "aqlm"

    back_dir = str(tmp_path / "canon")
    cli_convert.main([hf_dir, back_dir, "--to", "canonical"])
    results = cli_evaluate.main(
        [back_dir, "--datasets", "random", "--nsamples", "2", "--model_seqlen", "16"]
    )
    ref = cli_evaluate.main(
        [quantized_dir, "--datasets", "random", "--nsamples", "2", "--model_seqlen", "16"]
    )
    # fp16 hub serialization costs a little ppl drift, nothing more
    np.testing.assert_allclose(results["ppl_random"], ref["ppl_random"], rtol=0.05)


@pytest.mark.slow
def test_finetune_cli_memory_design(quantized_dir, tmp_path):
    """grad accumulation + host ST window + host-streamed teacher together."""
    out = str(tmp_path / "pv_mem")
    result = cli_finetune.main(
        [
            "--base_model", "random:tiny:1",
            "--quantized_model", quantized_dir,
            "--dataset", "random", "--nsamples", "4", "--model_seqlen", "16",
            "--batch_size", "4", "--microbatch_size", "2",
            "--total_steps", "3", "--code_update_every", "1",
            "--max_code_change_per_step", "0.2",
            "--st_window", "1", "--offload_teacher",
            "--val_size", "2", "--eval_every_steps", "2",
            "--save", out,
        ]
    )
    assert np.isfinite(result["final_kl"])
    assert os.path.exists(os.path.join(out, "config.json"))


@pytest.mark.slow
def test_convert_transcode_2x8(tmp_path):
    """1x16 checkpoint -> 2x8 additive transcode through the CLI."""
    src = str(tmp_path / "q16")
    cli_quantize.main(
        [
            "random:tiny:1", "random",
            "--nsamples", "2", "--model_seqlen", "16",
            "--num_codebooks", "1", "--nbits_per_codebook", "16", "--in_group_size", "8",
            "--max_epochs", "1", "--steps_per_epoch", "2", "--beam_size", "1",
            "--init_max_iter", "2", "--finetune_max_epochs", "0",
            "--init_max_points_per_centroid", "1",
            "--batch_size", "2", "--save", src,
        ]
    )
    out = str(tmp_path / "q28")
    cli_convert.main([src, out, "--to", "2x8", "--transcode_iters", "5"])
    import json as _json

    with open(os.path.join(out, "config.json")) as f:
        c = _json.load(f)
    assert c["quantization_config"]["num_codebooks"] == 2
    assert c["quantization_config"]["nbits_per_codebook"] == 8


@pytest.mark.slow
def test_finetune_cli_mesh(quantized_dir, tmp_path):
    """PV over a (data=2, model=4) mesh: losses must track the single-chip
    run (same batch stream; shardings change float-reduction grouping only)."""
    common = [
        "--base_model", "random:tiny:1",
        "--quantized_model", quantized_dir,
        "--dataset", "random", "--nsamples", "4", "--model_seqlen", "16",
        "--batch_size", "2", "--total_steps", "3", "--code_update_every", "2",
        "--max_code_change_per_step", "0.2",
    ]
    ref = cli_finetune.main(common)
    sharded = cli_finetune.main(common + ["--mesh_data", "2", "--mesh_model", "4"])
    assert np.isfinite(sharded["final_kl"])
    np.testing.assert_allclose(sharded["losses"], ref["losses"], rtol=0.05, atol=1e-4)


def test_convert_materialized_int8_roundtrip(quantized_dir, tmp_path):
    """convert --to int8 materializes the serving layout; resolve_model loads
    it directly (no load-time transcode) and outputs match the transcoded
    canonical load."""
    import jax.numpy as jnp

    from aqlm_tpu.cli.common import resolve_model
    from aqlm_tpu.models.family import forward_fn as family_forward
    from aqlm_tpu.ops.runtime import QuantizedLinear

    out = str(tmp_path / "int8model")
    cli_convert.main([quantized_dir, out, "--to", "int8"])
    cfgj = json.load(open(os.path.join(out, "config.json")))
    assert cfgj["runtime_mode"] == "int8"

    p_mat, cfg, kind = resolve_model(out, mode="int8")
    assert kind == "quantized"
    q = next(
        v for v in p_mat["layers"][0].values() if isinstance(v, QuantizedLinear)
    )
    assert q.mode == "int8" and q.w8 is not None

    p_ref, _, _ = resolve_model(quantized_dir, mode="int8")  # load-time path
    ids = np.arange(8, dtype=np.int32)[None, :] % cfg.vocab_size
    y_mat, _ = family_forward(cfg)(p_mat, cfg, jnp.asarray(ids))
    y_ref, _ = family_forward(cfg)(p_ref, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(y_mat, np.float32), np.asarray(y_ref, np.float32),
        rtol=1e-4, atol=1e-4,
    )

    # materialized checkpoints refuse a different serving mode
    with pytest.raises(ValueError):
        resolve_model(out, mode="codes")


@pytest.mark.slow
def test_finetune_windowed_scan_cli(quantized_dir, tmp_path):
    """scan_blocks + host ST window (the 7B single-compile rotation path):
    zeros-window grad, bf16 grad download, bf16 V-step upload."""
    out = str(tmp_path / "pv_scan")
    result = cli_finetune.main(
        [
            "--base_model", "random:tiny:1",
            "--quantized_model", quantized_dir,
            "--dataset", "random", "--nsamples", "4", "--model_seqlen", "16",
            "--batch_size", "2", "--total_steps", "3", "--code_update_every", "1",
            "--max_code_change_per_step", "0.2",
            "--st_window", "1", "--scan_blocks", "--offload_teacher",
            "--save", out,
        ]
    )
    assert np.isfinite(result["final_kl"])
