"""Real-dataset-layout tests over checked-in miniature fixtures.

The download scripts' layouts (reference: eth/download.sh:7-20,
local-feature-evaluation/download.sh:7-43) have never been reachable here
(no network egress), so these fixtures replicate them exactly — nested
``images/dslr_images_undistorted/*.JPG`` names, a multi-mesh
``scan_alignment.mlp`` with non-identity alignment matrices, a flat LFE
``images/`` dir — and the tests drive the SAME tool chain the scripts
prescribe: create-db(-eth) -> match-list -> feature extraction ->
benchmark.  Regenerate with ``python scripts/make_mini_fixtures.py``.
"""

import os
import shutil

import numpy as np
import pytest

from lfr_tpu.pipelines import benchmark, dataset_tools, extract_features

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _stage(tmp_path, rel):
    src = os.path.join(FIXTURES, rel)
    dst = str(tmp_path / os.path.basename(rel))
    shutil.copytree(src, dst)
    return dst


def test_eth3d_layout_end_to_end(tmp_path):
    root = _stage(tmp_path, os.path.join("eth3d_mini", "relief_mini"))

    # The download script's bootstrap chain, via the real CLIs.
    dataset_tools.main(["create-db-eth", "--dataset_path", root])
    dataset_tools.main(["match-list", "--dataset_path", root])
    assert os.path.exists(os.path.join(root, "database.db"))
    with open(os.path.join(root, "match-list.txt")) as fh:
        pairs = [l.split() for l in fh.read().splitlines() if l]
    assert len(pairs) == 3  # exhaustive over 3 images
    assert all("dslr_images_undistorted/" in n for p in pairs for n in p)

    # Feature extraction must walk into the nested image directory and
    # drop npz files next to each image.
    n = extract_features.extract_directory(
        os.path.join(root, "images"), "sift", max_features=1500, verbose=False
    )
    assert n == 3
    assert os.path.exists(
        os.path.join(root, "images", "dslr_images_undistorted", "DSC_0001.JPG.sift")
    )

    results = benchmark.run_eth(
        root,
        "sift",
        output_path=str(tmp_path / "out"),
        skip_refinement=True,
        verbose=False,
    )
    stats = results["raw"]
    assert stats["matching"]["num_inlier_pairs"] == 3
    tri = stats["triangulation"]
    assert tri["num_reg_images"] == 3
    assert tri["num_sparse_points"] > 50
    # Scan evaluation parsed the multi-mesh .mlp and applied both
    # alignment matrices: real SIFT points on the true surface must land
    # within the coarse tolerances (an unapplied/misapplied transform
    # displaces the scan by ~1 unit and zeroes these).
    ev = stats["evaluation"]
    assert ev["evaluation_mode"].startswith("surface")
    assert ev["accuracies"][3] > 0.5  # @0.1 units
    assert ev["completenesses"][4] > 0.05  # @0.2 units (sparse mini scene)


def test_lfe_layout_end_to_end(tmp_path):
    root = _stage(tmp_path, os.path.join("lfe_mini", "Fountain_mini"))

    dataset_tools.main(["create-db", "--dataset_path", root])
    dataset_tools.main(["match-list", "--dataset_path", root])

    n = extract_features.extract_directory(
        os.path.join(root, "images"), "sift", max_features=1500, verbose=False
    )
    assert n == 4

    results = benchmark.run_sfm(
        root,
        "sift",
        output_path=str(tmp_path / "out"),
        skip_refinement=True,
        verbose=False,
    )
    rec = results["raw"]["reconstruction"]
    assert rec["num_reg_images"] >= 3
    assert rec["num_sparse_points"] > 40
    assert rec["mean_reproj_error"] < 2.0
