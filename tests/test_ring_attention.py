"""Ring attention == full causal attention, tokens sharded over 8 devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqlm_tpu.models.common import attention, make_causal_mask
from aqlm_tpu.parallel import make_mesh
from aqlm_tpu.parallel.ring_attention import sequence_parallel_attention


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_ring_matches_full_attention(key, hq, hkv):
    b, t, d = 2, 64, 16
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(k2, (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(k3, (b, t, hkv, d), jnp.float32)

    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    ref = attention(q, k, v, make_causal_mask(pos, pos))

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got = sequence_parallel_attention(q, k, v, mesh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-5, rtol=1e-4
    )
