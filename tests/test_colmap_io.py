import numpy as np
import pytest

from lfr_tpu.io import colmap_db, colmap_model


def test_pair_id_roundtrip():
    assert colmap_db.pair_id_from_image_ids(3, 7) == colmap_db.pair_id_from_image_ids(7, 3)
    pid = colmap_db.pair_id_from_image_ids(12, 5)
    assert colmap_db.image_ids_from_pair_id(pid) == (5, 12)


def test_database_roundtrip(tmp_path):
    path = str(tmp_path / "db.db")
    rng = np.random.default_rng(0)
    with colmap_db.ColmapDatabase.create(path) as db:
        cam = db.add_camera(1, 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))
        i1 = db.add_image("a.jpg", cam)
        i2 = db.add_image("b.jpg", cam)
        kp = rng.random((10, 4)).astype(np.float32)
        db.set_keypoints(i1, kp)
        db.set_descriptors(i1, rng.integers(0, 255, (10, 128)).astype(np.uint8))
        m = np.array([[0, 3], [2, 5]], dtype=np.uint32)
        db.set_matches(i2, i1, m)  # id2 > id1: columns must swap on disk
        db.set_two_view_geometry(i1, i2, m[:, ::-1])

    with colmap_db.ColmapDatabase(path) as db:
        assert db.image_ids() == {"a.jpg": i1, "b.jpg": i2}
        np.testing.assert_allclose(db.keypoints(i1), kp)
        np.testing.assert_array_equal(db.matches(i2, i1), m)
        np.testing.assert_array_equal(db.matches(i1, i2), m[:, ::-1])
        stats = db.matching_stats()
        assert stats["num_images"] == 2
        assert stats["num_inlier_pairs"] == 1
        assert stats["num_inlier_matches"] == 2
        db.clear_features_and_matches()
        assert db.keypoints(i1).shape[0] == 0


def test_model_roundtrip(tmp_path):
    model = colmap_model.Model()
    model.cameras[1] = colmap_model.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 501.0, 320.0, 240.0]))
    q = np.array([0.9, 0.1, 0.2, np.sqrt(1 - 0.81 - 0.01 - 0.04)])
    q /= np.linalg.norm(q)
    model.images[1] = colmap_model.Image(
        1, q, np.array([0.5, -0.25, 2.0]), 1, "a.jpg",
        xys=np.array([[1.0, 2.0], [3.0, 4.0]]),
        point3D_ids=np.array([7, -1]),
    )
    model.points3D[7] = colmap_model.Point3D(
        7, np.array([0.1, 0.2, 0.3]), np.array([10, 20, 30], dtype=np.uint8), 0.5,
        np.array([1]), np.array([0]),
    )
    path = str(tmp_path / "model")
    colmap_model.write_model(path, model)
    loaded = colmap_model.read_model(path)
    np.testing.assert_allclose(loaded.images[1].qvec, q)
    np.testing.assert_allclose(loaded.images[1].xys, model.images[1].xys)
    np.testing.assert_array_equal(loaded.images[1].point3D_ids, [7, -1])
    np.testing.assert_allclose(loaded.points3D[7].xyz, [0.1, 0.2, 0.3])
    assert loaded.cameras[1].model == "PINHOLE"


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap_model.qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(colmap_model.rotmat_to_qvec(R), q, atol=1e-12)


def test_ply_roundtrip(tmp_path):
    pts = {
        1: colmap_model.Point3D(1, np.array([1.0, 2.0, 3.0]), np.array([255, 0, 0], dtype=np.uint8), 0.1, np.array([1]), np.array([0])),
        2: colmap_model.Point3D(2, np.array([-1.0, 0.5, 0.0]), np.array([0, 255, 0], dtype=np.uint8), 0.2, np.array([1]), np.array([1])),
    }
    path = str(tmp_path / "model.ply")
    colmap_model.write_ply(path, pts)
    xyz = colmap_model.read_ply_xyz(path)
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0.5, 0]], atol=1e-6)


def test_empty_model_generation(tmp_path):
    ref = tmp_path / "ref"
    ref.mkdir()
    model = colmap_model.Model()
    model.cameras[1] = colmap_model.Camera(1, "PINHOLE", 64, 48, np.array([50.0, 50.0, 32.0, 24.0]))
    model.images[2] = colmap_model.Image(
        2, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "x.jpg",
        xys=np.array([[1.0, 1.0]]), point3D_ids=np.array([5]),
    )
    model.points3D[5] = colmap_model.Point3D(
        5, np.zeros(3), np.zeros(3, dtype=np.uint8), 0.0, np.array([2]), np.array([0])
    )
    colmap_model.write_model(str(ref), model)
    name_to_id = colmap_model.generate_empty_model(str(ref), str(tmp_path / "empty"))
    assert name_to_id == {"x.jpg": 2}
    empty = colmap_model.read_model(str(tmp_path / "empty"))
    assert empty.points3D == {}
    assert empty.images[2].xys.shape[0] == 0
