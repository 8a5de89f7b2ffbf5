"""Perplexity evaluation (GPTQ protocol).

TPU-native analogue of the reference's two PPL paths:
- perplexity_eval (/root/reference/main.py:372-424): layer-streamed PPL over
  seqlen windows of the test set;
- evaluate_perplexity (/root/reference/src/datautils.py:288-325): the
  distributed variant with rank-strided sequences + all_reduce.

Here a single jitted step computes the per-window NLL; data parallelism comes
from sharding the window batch over the ("data",) mesh axis — the psum the
reference does by hand (datautils.py:323) falls out of jnp.sum on a sharded
array.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.models import llama

__all__ = ["evaluate_perplexity", "evaluate_perplexity_sharded"]


def evaluate_perplexity(
    params: dict,
    cfg: llama.ModelConfig,
    input_ids,  # [nseq, seqlen] int
    *,
    batch_size: int = 1,
    forward_fn=llama.forward,
) -> float:
    """exp(total_nll / total_tokens) over next-token predictions."""
    input_ids = jnp.asarray(input_ids, jnp.int32)
    nseq, seqlen = input_ids.shape

    @jax.jit
    def window_nll(params, ids):
        """Per-row NLL sums [B] — rows are independent, so batch padding is
        handled by simply ignoring the padded rows' sums."""
        logits, _ = forward_fn(params, cfg, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        return jnp.sum(nll, axis=-1)

    total_nll, total_tokens = 0.0, 0
    for start in range(0, nseq, batch_size):
        batch = input_ids[start : start + batch_size]
        valid = batch.shape[0]
        if valid != batch_size:  # keep shapes static for the jit
            batch = jnp.pad(batch, ((0, batch_size - valid), (0, 0)))
        row_sums = window_nll(params, batch)
        total_nll += float(jnp.sum(row_sums[:valid]))
        total_tokens += valid * (seqlen - 1)
    return math.exp(total_nll / max(total_tokens, 1))


def evaluate_perplexity_sharded(
    params: dict,
    cfg: llama.ModelConfig,
    input_ids,
    mesh,
    *,
    rows_per_device: int = 1,
    forward_fn=llama.forward,
    data_axis: str = "data",
) -> float:
    """Data-parallel PPL: window rows sharded over the mesh's data axis.

    The actually-distributed counterpart of the reference's rank-strided
    evaluate_perplexity (/root/reference/src/datautils.py:288-325): each
    device scores its row shard; the NLL/token reduction over the sharded
    rows is XLA's psum (explicit all_reduce in the reference, :323).
    Pads the row count to a full shard multiple; padded rows are masked out
    of the totals (mirroring the reference's strided remainder handling).
    Multi-host safe: under jax.distributed each process feeds the same
    global array and XLA partitions it.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    input_ids = jnp.asarray(input_ids, jnp.int32)
    nseq, seqlen = input_ids.shape
    n_data = mesh.shape[data_axis]
    batch = n_data * rows_per_device
    sharding = NamedSharding(mesh, P(data_axis, None))

    @jax.jit
    def batch_nll(params, ids, valid):
        logits, _ = forward_fn(params, cfg, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        row_sums = jnp.sum(nll, axis=-1) * valid  # padded rows contribute 0
        return jnp.sum(row_sums), jnp.sum(valid) * (seqlen - 1)

    total_nll, total_tokens = 0.0, 0.0
    for start in range(0, nseq, batch):
        rows = input_ids[start : start + batch]
        valid = np.ones((rows.shape[0],), np.float32)
        if rows.shape[0] < batch:
            pad = batch - rows.shape[0]
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
            valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
        rows = jax.device_put(rows, sharding)
        valid = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(data_axis)))
        s, t = batch_nll(params, rows, valid)
        total_nll += float(s)
        total_tokens += float(t)
    return math.exp(total_nll / max(total_tokens, 1.0))
