"""Sharded calibration: data-parallel XTX capture and out-group-parallel
beam search over the mesh.

TPU-native replacements for the reference's two calibration parallelisms
(SURVEY.md §2.3):
- replicate/parallel_apply data parallelism with hand-averaged XTX
  (/root/reference/main.py:487-522) -> shard the sample batch; the XTX
  contraction over the sharded axis makes XLA insert the psum;
- output-channel-sharded beam search with code gathers
  (/root/reference/aq_engine.py:139-208) -> out groups are independent, so
  the search runs under shard_map with rows split over the model axis and
  the codes concatenate back by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqlm_tpu.calib.beam_search_xtx import beam_search_optimal_codes

__all__ = ["shard_calibration_batch", "beam_search_optimal_codes_sharded"]


def shard_calibration_batch(input_ids, mesh: Mesh, data_axis: str = "data"):
    """Place calibration sequences with the sample axis over the data axis.

    Everything downstream (embedding, block taps, XTXAccumulator.add) then
    runs data-parallel under jit; the XTX all-reduce is implicit in the
    sharded contraction."""
    return jax.device_put(input_ids, NamedSharding(mesh, P(data_axis, None)))


def beam_search_optimal_codes_sharded(
    XTX,
    reference_weight,
    codebooks,
    prev_codes,
    scales,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    beam_size: int = 8,
    steps_order=None,
    out_chunk: int = 2048,
):
    """Out-group-sharded beam search: identical results to the unsharded
    call, with rows of the search split over the mesh's model axis.

    reference_weight rows and prev_codes out-groups shard together; XTX,
    codebooks and the visit order are replicated. Requires OG (and rows)
    divisible by the axis size.
    """
    tp = mesh.shape[model_axis]
    OG = prev_codes.shape[0]
    assert OG % tp == 0, (OG, tp)

    if scales is None:
        scales = jnp.ones((OG,), jnp.float32)
    sc_spec = P(model_axis) if scales.ndim == 1 else P(model_axis, None)

    def local(xtx, w, cbs, codes, sc, order):
        return beam_search_optimal_codes(
            xtx, w, cbs, codes, sc,
            beam_size=beam_size, steps_order=order,
            out_chunk=min(out_chunk, codes.shape[0]),
        )

    if steps_order is None:
        K = codebooks.shape[0]
        IG = prev_codes.shape[1]
        ig_seq = jnp.repeat(jnp.arange(IG, dtype=jnp.int32), K)
        k_seq = jnp.tile(jnp.arange(K, dtype=jnp.int32), IG)
        steps_order = jnp.stack([ig_seq, k_seq], axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(model_axis, None), P(), P(model_axis, None, None), sc_spec, P()),
        out_specs=(P(model_axis, None, None), P(model_axis)),
        check_vma=False,
    )
    return fn(XTX, reference_weight, codebooks, prev_codes, scales, steps_order)
