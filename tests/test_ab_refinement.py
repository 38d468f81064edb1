"""Refined-vs-raw A/B on a planar scene with a perfect patch aligner.

The framework's reason to exist: refinement must IMPROVE reconstructions.
This test runs the complete benchmark pipeline (match -> two-view refine ->
multi-view solve -> import -> triangulate -> evaluate) twice, with the
brute-force oracle aligner standing in for the CNN, and asserts the refined
reconstruction beats the raw one — deterministic, no training required.
"""

import numpy as np
import pytest

from lfr_tpu.pipelines import benchmark, refinement
from lfr_tpu.utils import synthetic
from test_refinement import _NCCOracleCNN


@pytest.mark.slow
def test_refined_beats_raw_with_oracle_aligner(tmp_path):
    root = str(tmp_path / "planar")
    rng = np.random.default_rng(0)
    scene, images = synthetic.planar_scene(
        rng, num_points=50, num_cameras=3, width=400, height=300
    )
    noise = 2.0
    synthetic.make_eth3d_dataset(
        root, scene, rng, keypoint_noise_px=noise, rendered_images=images
    )

    refiner = refinement.TwoViewRefiner(batch_size=64, rng_seed=0)
    refiner._patch_cnn = _NCCOracleCNN(max_shift=5)

    results = benchmark.run_eth(
        root, "sift", output_path=str(tmp_path / "out"), refiner=refiner, verbose=False
    )

    raw_tri = results["raw"]["triangulation"]
    ref_tri = results["ref"]["triangulation"]
    raw_ev = results["raw"]["evaluation"]
    ref_ev = results["ref"]["evaluation"]

    # Refinement must reduce reprojection error and improve accuracy@1cm.
    assert ref_tri["mean_reproj_error"] < raw_tri["mean_reproj_error"] * 0.8, (
        ref_tri,
        raw_tri,
    )
    assert ref_ev["accuracies"][0] >= raw_ev["accuracies"][0]
    assert ref_ev["accuracies"][1] >= raw_ev["accuracies"][1]
    # And it should keep (or grow) coverage.
    assert ref_tri["num_sparse_points"] >= 0.9 * raw_tri["num_sparse_points"]
