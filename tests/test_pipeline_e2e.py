"""End-to-end pipeline test on a synthetic ETH3D-layout dataset.

Exercises the full chain the reference drives with six subprocesses
(reference: eth/benchmark.py:94-149): match graph (SKIP_REFINEMENT path) ->
multi-view solve -> feature import + RANSAC verification -> fixed-pose
triangulation -> PLY -> accuracy/completeness evaluation.
"""

import json
import os

import numpy as np
import pytest

from lfr_tpu.pipelines import benchmark
from lfr_tpu.utils import synthetic


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("eth_scene"))
    rng = np.random.default_rng(0)
    scene = synthetic.random_scene(rng, num_points=120, num_cameras=4)
    synthetic.make_eth3d_dataset(root, scene, rng)
    return root, scene


def test_eth_benchmark_skip_refinement(dataset, tmp_path):
    root, scene = dataset
    out = str(tmp_path / "output")
    results = benchmark.run_eth(
        root, "sift", output_path=out, skip_refinement=True, verbose=False
    )
    stats = results["raw"]
    assert stats["matching"]["num_inlier_pairs"] >= 5
    tri = stats["triangulation"]
    assert tri["num_reg_images"] == scene.num_cameras
    assert tri["num_sparse_points"] > 80
    assert tri["mean_reproj_error"] < 0.5

    ev = stats["evaluation"]
    # Noiseless keypoints: nearly every point within 1 cm of the "scan".
    assert ev["accuracies"][0] > 0.95
    assert ev["completenesses"][0] > 0.6

    # Artifacts on disk: matches, db, model, ply, eval txt, stats json.
    assert os.path.exists(os.path.join(out, "sift-%s-matches.pb" % os.path.basename(root)))
    assert os.path.exists(os.path.join(root, "sift-raw.db"))
    assert os.path.exists(os.path.join(root, "sparse-sift-raw.ply"))
    name = os.path.basename(root)
    assert os.path.exists(os.path.join(out, f"sift-{name}-raw.txt"))
    with open(os.path.join(out, f"sift-{name}-stats.json")) as fh:
        assert "raw" in json.load(fh)


def test_sfm_benchmark_skip_refinement(tmp_path):
    # Fresh dataset: the module fixture's root already holds the eth run's
    # databases, which the pipeline rightly refuses to overwrite.
    root = str(tmp_path / "sfm_scene")
    rng = np.random.default_rng(7)
    scene = synthetic.random_scene(rng, num_points=120, num_cameras=4, noise_px=0.2)
    synthetic.make_eth3d_dataset(root, scene, rng, keypoint_noise_px=0.2)
    out = str(tmp_path / "out_sfm")
    results = benchmark.run_sfm(
        root, "sift", output_path=out, skip_refinement=True, verbose=False
    )
    rec = results["raw"]["reconstruction"]
    assert rec["num_reg_images"] == scene.num_cameras
    assert rec["num_sparse_points"] > 80
    assert rec["mean_reproj_error"] < 0.5
    # JSON stats in the reference's two-line format.
    name = os.path.basename(root)
    with open(os.path.join(out, f"sift-{name}-raw.json")) as fh:
        lines = fh.read().strip().split("\n")
    assert len(lines) == 2
    assert "num_inlier_pairs" in lines[0] and "num_reg_images" in lines[1]
    assert os.path.exists(os.path.join(root, "sparse-sift-raw", "points3D.txt"))


def test_database_overwrite_refused(dataset, tmp_path):
    root, _ = dataset
    from lfr_tpu.pipelines.triangulation import triangulation_pipeline

    # The previous test created sift-raw.db; the pipeline must refuse reuse
    # (reference: triangulation_pipeline.py:71-74).
    with pytest.raises(FileExistsError):
        triangulation_pipeline(
            root,
            "sift",
            os.path.join(str(tmp_path), "missing.pb"),
        )
