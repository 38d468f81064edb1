"""Centralized configuration for the TPU-native local-feature-refinement framework.

The reference scatters its hyper-parameters across three duplicated config
dicts (reference: eth/benchmark.py:18-39, local-feature-evaluation/
benchmark.py:18-39, custom_demo.py:14-35) and hard-coded constants in many
files.  Here everything lives in one place.

All "reference:" citations point into /root/reference.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

# ---------------------------------------------------------------------------
# Geometry / unit conventions (shared by the CNN driver and the solver).
# ---------------------------------------------------------------------------

#: Side length of the square patches fed to the flow CNN
#: (reference: two-view-refinement/refinement.py:23).
PATCH_SIZE: int = 33

#: One displacement unit predicted by the CNN corresponds to this many pixels
#: (reference: two-view-refinement/refinement.py:147,
#:  reconstruction-scripts/colmap_utils.py:136).
DISPLACEMENT_UNIT_PX: float = 16.0

#: The fine refinement samples the flow on a 3x3 grid of +-GRID_OFFSET_PX
#: pixel offsets around each keypoint
#: (reference: two-view-refinement/refinement.py:83-87).
GRID_OFFSET_PX: float = 8.0

#: Flow-grid side length (3x3 samples per match direction)
#: (reference: multi-view-refinement/solve.cc:45 `kNumSamples`).
GRID_SIZE: int = 3

#: Default CNN minibatch (reference: two-view-refinement/compute_match_graph.py:63).
DEFAULT_BATCH_SIZE: int = 1024

#: Matches are flushed to a ``.part.N`` file every this many pairs
#: (reference: two-view-refinement/compute_match_graph.py:78).
DUMP_INTERVAL: int = 5000

# ---------------------------------------------------------------------------
# Multi-view solver constants (reference: multi-view-refinement/solve.cc).
# ---------------------------------------------------------------------------

#: Box bound on refined positions, in displacement units (= +-16 px)
#: (reference: solve.cc:89).
SOLVE_BOUND: float = 1.0

#: Cauchy robust-loss scale for intra-track edges (reference: solve.cc:111).
CAUCHY_SCALE: float = 0.25

#: Tukey robust-loss scale for inter-track edges (reference: solve.cc:120).
TUKEY_SCALE: float = 0.0625

#: Integer scale applied to similarity weights before the normalized min-cut
#: (reference: solve.cc:329).
CUT_WEIGHT_SCALE: float = 100.0

#: Levenberg-Marquardt stopping rules mirroring the Ceres options
#: (reference: solve.cc:147-153).
LM_MAX_ITERATIONS: int = 100
LM_FUNCTION_TOLERANCE: float = 1e-4
LM_GRADIENT_TOLERANCE: float = 1e-8
LM_PARAMETER_TOLERANCE: float = 1e-4

# ---------------------------------------------------------------------------
# Per-method extraction / matching configuration.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MethodConfig:
    """Extraction resolution caps and matcher settings for one feature type.

    Mirrors the (max_edge, max_sum_edges) and (matcher, threshold) tuples of
    the reference config dicts (reference: eth/benchmark.py:18-39).
    """

    name: str
    #: Maximum image edge at feature-extraction octave 0.
    max_edge: int
    #: Maximum sum of image edges at feature-extraction octave 0.
    max_sum_edges: int
    #: Either "similarity" or "ratio".
    matcher: str
    #: Similarity threshold or Lowe's ratio threshold.
    threshold: float


METHODS: Dict[str, MethodConfig] = {
    m.name: m
    for m in [
        MethodConfig("sift", 1600, 3200, "ratio", 0.8),
        MethodConfig("surf", 1600, 3200, "ratio", 0.8),
        # In-framework Gaussian det-of-Hessian detector (not reference-SURF;
        # an honest extra method slot).
        MethodConfig("doh", 1600, 3200, "ratio", 0.8),
        MethodConfig("d2-net", 1600, 2800, "similarity", 0.8),
        MethodConfig("keynet", 1600, 3200, "ratio", 0.9),
        MethodConfig("r2d2", 1600, 3200, "similarity", 0.9),
        MethodConfig("superpoint", 1600, 2800, "similarity", 0.755),
    ]
}


def get_method(name: str) -> MethodConfig:
    try:
        return METHODS[name]
    except KeyError:
        raise ValueError(
            f"Method {name!r} is unknown; known methods: {sorted(METHODS)}. "
            "Register a MethodConfig in lfr_tpu.config.METHODS."
        ) from None


def downscale_factor(height: int, width: int, max_edge: int, max_sum_edges: int) -> float:
    """Image downscale factor used before matching / refinement.

    fact = max(1, max_edge_ratio, sum_edges_ratio)
    (reference: two-view-refinement/compute_match_graph.py:104,111).
    """
    return max(1.0, max(height, width) / max_edge, (height + width) / max_sum_edges)


# ---------------------------------------------------------------------------
# ETH3D evaluation tolerances (reference: eth/benchmark.py:141).
# ---------------------------------------------------------------------------

ETH3D_TOLERANCES: Tuple[float, ...] = (0.01, 0.02, 0.05, 0.1, 0.2, 0.5)
