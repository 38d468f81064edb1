"""Unified CLI dispatcher (`python -m lfr_tpu`).

The reference spreads its drivers over per-directory scripts
(reference: eth/benchmark.py, utils/*.py, reconstruction-scripts/*.py);
here one dispatcher fronts every stage.
"""

import os

import numpy as np
import pytest

from lfr_tpu import __main__ as cli


def test_usage_and_unknown(capsys):
    assert cli.main([]) == 0
    out = capsys.readouterr().out
    for cmd in cli.COMMANDS:
        assert cmd in out
    assert cli.main(["no-such-command"]) == 2
    assert "unknown command" in capsys.readouterr().err


def test_dispatch_dataset_tools(tmp_path):
    import cv2

    from lfr_tpu.pipelines import dataset_tools
    from lfr_tpu.utils import synthetic

    rng = np.random.default_rng(5)
    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    for i in range(2):
        img = synthetic.textured_image(rng, 60, 80)
        cv2.imwrite(str(root / "images" / f"{i:03d}.png"), img[:, :, ::-1])
    dataset_tools.create_starting_database(str(root))

    assert cli.main(["dataset", "match-list", "--dataset_path", str(root)]) == 0
    with open(root / "match-list.txt") as fh:
        assert len(fh.readlines()) == 1


def test_dispatch_compare(tmp_path, capsys):
    from lfr_tpu.io import colmap_model as cm

    def tiny_model(path):
        m = cm.Model()
        m.cameras[1] = cm.Camera(1, "PINHOLE", 10, 10, np.array([5.0, 5.0, 5.0, 5.0]))
        m.images[1] = cm.Image(
            1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "a.png",
            xys=np.zeros((2, 2)), point3D_ids=np.array([1, -1]),
        )
        m.images[2] = cm.Image(
            2, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "b.png",
            xys=np.zeros((2, 2)), point3D_ids=np.array([1, -1]),
        )
        m.points3D[1] = cm.Point3D(
            1, np.zeros(3), np.zeros(3, np.uint8), 0.1,
            np.array([1, 2]), np.array([0, 0]),
        )
        os.makedirs(path, exist_ok=True)
        cm.write_model(path, m)
        return m

    raw_dir, ref_dir = str(tmp_path / "raw"), str(tmp_path / "ref")
    tiny_model(raw_dir)
    tiny_model(ref_dir)
    assert cli.main(["compare", "--raw_model", raw_dir, "--ref_model", ref_dir]) == 0
    out = capsys.readouterr().out
    assert "common registered images: 2" in out
    assert "raw:" in out and "ref:" in out
