"""Mid-scale LOSSY-regime ladder fixture: train + calibrate + cache.

The tiny ladder (test_quality_ladder.py) calibrates a hidden-64 model where
1x16 is LOSSLESS (65536 codebook entries > total weight groups), so every
serving-substitute delta is measured where quantization doesn't hurt —
best-case bounds (VERDICT r4 missing #4). This harness scales the model
until 1x16 is LOSSY for every projection: hidden=768 / intermediate=3072
-> gate/up/down carry 768*3072/8 = 294912 groups and q/k/v/o 73728, all
oversubscribing the 65536-entry codebook. The published deltas are measured
exactly there — where quantization hurts (/root/reference/README.md:42-95).

Building the fixture costs ~minutes on a TPU chip and tens of minutes on
CPU (65536-cluster kmeans over 131k groups), so it is built ONCE into a
cache dir (AQLM_TEST_FIXTURE_CACHE, default <repo>/.fixtures) and reused by
every later suite run — run experiments/build_lossy_ladder.py to prebuild.
"""

from __future__ import annotations

import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_ROOT = os.environ.get(
    "AQLM_TEST_FIXTURE_CACHE", os.path.join(REPO, ".fixtures")
)
FIXTURE = os.path.join(CACHE_ROOT, "lossy_ladder_v1")

VOCAB = 256
SEQLEN = 256
NVAL = 8
NCALIB = 16

CALIB_HYPERS = dict(
    init_max_iter=8,
    max_epochs=2,
    steps_per_epoch=10,
    beam_size=1,
    relative_mse_tolerance=0.01,
    lr=1e-4,
)


def _train_mid_model(root: str) -> dict:
    """Train a hidden-512/intermediate-2048 Llama on the Markov corpus.

    Pure-JAX training loop (llama.forward + optax) so the fixture builds on
    whatever backend is live — on the TPU the 200 steps take seconds; the
    torch/HF path the tiny ladder uses would be ~an hour on this host's
    single CPU core. Saved in the canonical dense checkpoint format."""
    import sys

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_reference_parity import _markov_corpus

    from aqlm_tpu.io import save_quantized_model
    from aqlm_tpu.models import llama

    cfg = llama.ModelConfig(
        vocab_size=VOCAB,
        # hidden 768 / intermediate 3072: gate/up/down carry 294912 groups
        # and even q/k/v/o carry 73728 — EVERY projection oversubscribes the
        # 65536-entry 1x16 codebook (a 512/2048 first cut left exact-1x16
        # only +0.005 over fp — barely outside noise)
        hidden_size=768,
        intermediate_size=3072,
        num_layers=2,
        num_heads=12,
        num_kv_heads=12,
        max_position_embeddings=SEQLEN,
        rms_eps=1e-5,
        tie_embeddings=False,
    )
    params = llama.init_random_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    corpus = _markov_corpus(260_000, seed=3)
    ids = corpus[: (len(corpus) // SEQLEN) * SEQLEN].reshape(-1, SEQLEN)
    ids = np.asarray(ids, np.int32)

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p, batch):
        logits, _ = llama.forward(p, cfg, batch)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, batch[:, 1:, None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def train_step(p, o, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        upd, o = opt.update(g, o, p)
        return optax.apply_updates(p, upd), o, loss

    loss = None
    for step in range(200):
        lo = (step * 8) % (len(ids) - 8 - NCALIB - NVAL)
        batch = jnp.asarray(ids[lo : lo + 8])
        params, opt_state, loss = train_step(params, opt_state, batch)
    final_loss = float(jax.device_get(loss))

    model_dir = os.path.join(root, "model")
    save_quantized_model(model_dir, params, cfg)
    calib = ids[-(NCALIB + NVAL) : -NVAL]
    val = ids[-NVAL:]
    np.save(os.path.join(root, "calib.npy"), calib)
    np.save(os.path.join(root, "val.npy"), val)
    return dict(model_dir=model_dir, calib=calib, val=val,
                final_loss=final_loss)


def build_fixture(cache_dir: str = FIXTURE, verbose: bool = True) -> dict:
    """Train + calibrate 1x16 in the lossy regime; cache everything."""
    import time

    from aqlm_tpu.calib.engine import CalibConfig
    from aqlm_tpu.calib.pipeline import QuantizePipelineConfig, quantize_model
    from aqlm_tpu.config import SCHEME_1X16
    from aqlm_tpu.data.eval import evaluate_perplexity
    from aqlm_tpu.io import load_quantized_model, save_quantized_model

    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    setup = _train_mid_model(cache_dir)
    if verbose:
        print(f"[lossy-ladder] trained mid model in {time.time()-t0:.0f}s "
              f"(final loss {setup['final_loss']:.3f})", flush=True)

    params, cfg = load_quantized_model(setup["model_dir"])
    ppl_fp = float(evaluate_perplexity(params, cfg, setup["val"], batch_size=4))

    t0 = time.time()
    pipe = QuantizePipelineConfig(
        scheme=SCHEME_1X16,
        calib=CalibConfig(**CALIB_HYPERS),
        finetune=None,
        verbose=verbose,
    )
    qparams, _ = quantize_model(params, cfg, setup["calib"], pipe)
    if verbose:
        print(f"[lossy-ladder] calibrated 1x16 in {time.time()-t0:.0f}s", flush=True)
    ppl_exact = float(evaluate_perplexity(qparams, cfg, setup["val"], batch_size=4))

    save_quantized_model(os.path.join(cache_dir, "qmodel"), qparams, cfg)
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump({"ppl_fp": ppl_fp, "ppl_exact": ppl_exact,
                   "hypers": CALIB_HYPERS}, f)
    if verbose:
        print(f"[lossy-ladder] fp={ppl_fp:.4f} exact-1x16={ppl_exact:.4f} "
              f"(lossy delta {ppl_exact - ppl_fp:+.4f})", flush=True)
    return load_fixture(cache_dir)


def load_fixture(cache_dir: str = FIXTURE):
    """Load the cached fixture; None if not built."""
    meta_path = os.path.join(cache_dir, "meta.json")
    if not os.path.exists(meta_path):
        return None
    from aqlm_tpu.io import load_quantized_model

    with open(meta_path) as f:
        meta = json.load(f)
    qparams, cfg = load_quantized_model(os.path.join(cache_dir, "qmodel"))
    val = np.load(os.path.join(cache_dir, "val.npy"))
    return dict(cfg=cfg, qparams=qparams, val=val, model_dir=os.path.join(cache_dir, "model"),
                ppl_fp=meta["ppl_fp"], ppl_exact=meta["ppl_exact"])


def get_fixture(cache_dir: str = FIXTURE):
    fx = load_fixture(cache_dir)
    return fx if fx is not None else build_fixture(cache_dir)
