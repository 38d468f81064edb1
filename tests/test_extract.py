"""Extraction CLI + DoH detector + dataset tools tests."""

import os

import numpy as np
import pytest

from lfr_tpu.utils import synthetic


def test_doh_detector_and_repeatability():
    from lfr_tpu.ops.doh import extract_doh
    from lfr_tpu.ops.matchers import mnn_ratio_matcher

    rng = np.random.default_rng(0)
    img1, img2 = synthetic.shifted_pair(rng, 200, 260, (4, -6))
    kp1, s1, d1 = extract_doh(img1, max_features=300)
    kp2, s2, d2 = extract_doh(img2, max_features=300)
    assert kp1.shape[0] > 30
    np.testing.assert_allclose(np.linalg.norm(d1, axis=1), 1.0, atol=1e-4)

    m, _ = mnn_ratio_matcher(d1, d2, ratio=0.8)
    assert m.shape[0] > 15
    delta = kp2[m[:, 1], :2] - kp1[m[:, 0], :2]
    med = np.median(delta, axis=0)
    np.testing.assert_allclose(med, [6.0, -4.0], atol=1.0)


def test_extract_directory_cli(tmp_path):
    import cv2

    from lfr_tpu.io import features as features_io
    from lfr_tpu.pipelines.extract_features import extract_directory

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(2):
        img = synthetic.textured_image(rng, 120, 160)
        cv2.imwrite(str(img_dir / f"im{i}.png"), img[:, :, ::-1])

    n = extract_directory(str(img_dir), "sift", max_edge=200, verbose=False)
    assert n == 2
    feats = features_io.load_features(str(img_dir / "im0.png"), "sift")
    assert feats.num_features > 10
    assert feats.descriptors.shape[1] == 128
    assert feats.keypoints.shape[1] == 4


def test_dataset_tools(tmp_path):
    import cv2

    from lfr_tpu.pipelines import dataset_tools

    rng = np.random.default_rng(2)
    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    for i in range(3):
        img = synthetic.textured_image(rng, 60, 80)
        cv2.imwrite(str(root / "images" / f"{i:03d}-shot.png"), img[:, :, ::-1])

    db_path = dataset_tools.create_starting_database(str(root))
    assert os.path.exists(db_path)
    names = dataset_tools.images_in_database(str(root))
    assert len(names) == 3

    dataset_tools.main(["match-list", "--dataset_path", str(root)])
    with open(root / "match-list.txt") as fh:
        assert len(fh.readlines()) == 3  # 3 choose 2

    dataset_tools.main(
        ["match-list", "--dataset_path", str(root), "--mode", "sequential", "--num_frames", "1"]
    )
    with open(root / "match-list.txt") as fh:
        assert len(fh.readlines()) == 2  # only adjacent frames

    dataset_tools.main(["image-list", "--dataset_path", str(root)])
    with open(root / "image-list.txt") as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 3 and all(os.path.isabs(p) for p in lines)


def test_compare_restriction():
    from lfr_tpu.eval.compare import compare_reconstructions, restrict_to_images
    from lfr_tpu.io import colmap_model as cm

    def tiny_model(names_with_points):
        m = cm.Model()
        m.cameras[1] = cm.Camera(1, "PINHOLE", 10, 10, np.array([5.0, 5.0, 5.0, 5.0]))
        pid = 1
        for k, (name, has_pts) in enumerate(names_with_points, start=1):
            pids = np.array([pid, pid + 1]) if has_pts else np.array([-1, -1])
            m.images[k] = cm.Image(
                k, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, name,
                xys=np.zeros((2, 2)), point3D_ids=pids.copy(),
            )
            if has_pts:
                for j, p in enumerate(pids):
                    m.points3D[int(p)] = cm.Point3D(
                        int(p), np.zeros(3), np.zeros(3, np.uint8), 0.1,
                        np.array([k, (k % len(names_with_points)) + 1]),
                        np.array([j, j]),
                    )
                pid += 2
        return m

    raw = tiny_model([("a", True), ("b", True), ("c", True)])
    ref = tiny_model([("a", True), ("b", True), ("d", True)])
    raw_stats, ref_stats = compare_reconstructions(raw, ref)
    assert raw_stats["num_reg_images"] <= 2
    assert ref_stats["num_reg_images"] <= 2


def test_create_db_eth(tmp_path):
    from lfr_tpu.io import colmap_db
    from lfr_tpu.pipelines import dataset_tools

    rng = np.random.default_rng(5)
    scene = synthetic.random_scene(rng, num_points=30, num_cameras=3)
    root = str(tmp_path / "eth")
    synthetic.make_eth3d_dataset(root, scene, rng)
    os.remove(os.path.join(root, "database.db"))

    path = dataset_tools.create_starting_database_eth(root)
    with colmap_db.ColmapDatabase(path) as db:
        images = db.image_ids()
        assert len(images) == 3
        cams = db.cameras()
        assert len(cams) == 1
        cam = next(iter(cams.values()))
        assert colmap_db.CAMERA_MODEL_NAMES[cam["model"]] == "PINHOLE"
        assert cam["prior_focal_length"]
