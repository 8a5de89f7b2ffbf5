"""Prebuild the lossy-regime ladder fixture (tests/lossy_ladder_harness.py).

Run on the TPU for a minutes-scale build (65536-cluster kmeans + 1x16 beam
search ride the MXU), or on CPU (tens of minutes):

    python experiments/build_lossy_ladder.py            # TPU if available
    AQLM_PROBE_CPU=1 python experiments/build_lossy_ladder.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax

if os.environ.get("AQLM_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from lossy_ladder_harness import FIXTURE, build_fixture, load_fixture

if load_fixture() is not None and "--force" not in sys.argv:
    print(f"fixture already built at {FIXTURE}; --force to rebuild")
else:
    print(f"backend: {jax.default_backend()}; building into {FIXTURE}", flush=True)
    fx = build_fixture()
    print(f"DONE fp={fx['ppl_fp']:.4f} exact={fx['ppl_exact']:.4f}", flush=True)
