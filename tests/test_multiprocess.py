"""Multi-process (2-host-shaped) execution tests.

Spawns real OS processes with jax.distributed over a local Gloo
coordinator — each process owns half the virtual CPU devices and feeds
only its own data shard, so cross-process collectives (the DCN boundary on
real pods) are actually exercised (SURVEY §2 P2/P6; BASELINE 2-host
target).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_two_process_solve_and_ba():
    from lfr_tpu.parallel.multiprocess import launch

    report = launch(2, 2, global_batch=32, iterations=8, timeout=480)
    assert report["num_processes"] == 2
    assert report["global_devices"] == 4
    assert report["solve_ms"] > 0
    assert np.isfinite(report["ba_rms_px"])
    # The distributed BA must actually converge on the synthetic scene.
    assert report["ba_rms_px"] < 0.5


def test_single_process_launch_matches_api():
    """The same worker code path runs single-process (degenerate case)."""
    from lfr_tpu.parallel.multiprocess import launch

    report = launch(1, 2, global_batch=16, iterations=5, timeout=480)
    assert report["num_processes"] == 1
    assert report["global_devices"] == 2
