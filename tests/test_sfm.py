"""SfM layer tests: geometry primitives, RANSAC verification, triangulation."""

import numpy as np
import jax.numpy as jnp
import pytest

from lfr_tpu.io import colmap_db, colmap_model
from lfr_tpu.sfm import cameras as cam_mod
from lfr_tpu.sfm import geometry, triangulate, verify
from lfr_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene():
    return synthetic.random_scene(np.random.default_rng(0), num_points=150, num_cameras=4)


def test_project_triangulate_roundtrip(scene):
    # Two cameras, batched DLT on all points visible in both.
    vis = scene.visible[0] & scene.visible[1]
    pts = scene.points[vis]
    P = np.stack(
        [
            np.asarray(geometry.projection_matrix(
                jnp.asarray(scene.rotations[c]), jnp.asarray(scene.translations[c]), jnp.asarray(scene.K)
            ))
            for c in (0, 1)
        ]
    )
    uv = np.stack([scene.observations[0][vis], scene.observations[1][vis]], axis=1)
    T = uv.shape[0]
    Pb = np.tile(P[None], (T, 1, 1, 1))
    mask = np.ones((T, 2), bool)
    X = np.asarray(
        geometry.triangulate_dlt_batch(jnp.asarray(Pb), jnp.asarray(uv), jnp.asarray(mask))
    )
    np.testing.assert_allclose(X, pts, atol=1e-3)  # float32 SVD precision


def test_fundamental_from_correspondences(scene):
    vis = scene.visible[0] & scene.visible[1]
    x1 = scene.observations[0][vis].astype(np.float32)
    x2 = scene.observations[1][vis].astype(np.float32)
    F = geometry.fundamental_8point(jnp.asarray(x1), jnp.asarray(x2))
    err = np.asarray(geometry.sampson_error(F, jnp.asarray(x1), jnp.asarray(x2)))
    assert np.sqrt(err).max() < 0.1  # noiseless -> tiny epipolar error


def test_essential_decomposition_recovers_pose(scene):
    vis = scene.visible[0] & scene.visible[1]
    x1 = scene.observations[0][vis].astype(np.float64)
    x2 = scene.observations[1][vis].astype(np.float64)
    F = geometry.fundamental_8point(jnp.asarray(x1), jnp.asarray(x2))
    K = jnp.asarray(scene.K)
    E = geometry.essential_from_fundamental(F, K, K)
    # Relative pose ground truth: cam2 from cam1.
    R_rel = scene.rotations[1] @ scene.rotations[0].T
    t_rel = scene.translations[1] - R_rel @ scene.translations[0]
    t_rel /= np.linalg.norm(t_rel)
    best = min(
        min(
            np.abs(np.asarray(R) - R_rel).max(),
            np.abs(np.asarray(R) - R_rel.T).max(),
        )
        + min(np.abs(np.asarray(t) - t_rel).max(), np.abs(np.asarray(t) + t_rel).max())
        for R, t in geometry.decompose_essential(E)
    )
    assert best < 1e-3


def test_ransac_verification_rejects_outliers(scene):
    rng = np.random.default_rng(1)
    vis = scene.visible[0] & scene.visible[1]
    idx = np.nonzero(vis)[0]
    kps1 = scene.observations[0]
    kps2 = scene.observations[1].copy()
    matches = np.stack([idx, idx], axis=1)
    # Corrupt 30% of matches with random targets.
    n_bad = len(idx) // 3
    bad = rng.choice(len(idx), n_bad, replace=False)
    kps2_corrupt = kps2.copy()
    corrupt_rows = idx[bad]
    kps2_corrupt[corrupt_rows] = rng.uniform(0, 600, (n_bad, 2))

    result = verify.verify_pair(kps1, kps2_corrupt, matches, seed=0)
    assert result.config != verify.CONFIG_DEGENERATE
    good_set = set(idx[k] for k in range(len(idx)) if k not in set(bad))
    bad_set = set(corrupt_rows.tolist())
    inl = set(result.inlier_matches[:, 0].tolist())
    # High recall on uncorrupted matches; corrupted survivors limited to the
    # few whose random target happens to land near the epipolar line
    # (Sampson distance cannot reject along-epipolar outliers).
    assert len(inl & good_set) > 0.9 * len(good_set)
    assert len(inl & bad_set) <= 0.2 * len(bad_set)


def test_ransac_degenerate_too_few():
    r = verify.verify_pair(np.zeros((5, 2)), np.zeros((5, 2)), np.zeros((5, 2), int))
    assert r.config == verify.CONFIG_DEGENERATE
    assert r.inlier_matches.shape[0] == 0


def test_camera_distortion_roundtrip():
    cam = colmap_model.Camera(1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320.0, 240.0, -0.05]))
    rng = np.random.default_rng(2)
    xy = rng.uniform(-0.4, 0.4, (50, 2))
    dist = cam_mod.distort_normalized(cam, xy)
    undist = cam_mod.undistort_normalized(cam, dist)
    np.testing.assert_allclose(undist, xy, atol=1e-8)


def _scene_to_db_and_model(
    scene, tmp_path, noise=0.0, outlier_frac=0.0, seed=0, second_scene=None
):
    """Materialize a synthetic scene as a COLMAP DB + GT model.

    ``second_scene``: optional independent scene added to the SAME
    database with NO cross-scene matches (names prefixed ``a_``/``b_``) —
    a disconnected match graph for multi-model mapper tests."""
    rng = np.random.default_rng(seed)
    db = colmap_db.ColmapDatabase.create(str(tmp_path / "db.db"))
    model = colmap_model.Model()

    def add_scene(sc, prefix):
        cam_id = db.add_camera(
            1, sc.width, sc.height,
            np.array([sc.K[0, 0], sc.K[1, 1], sc.K[0, 2], sc.K[1, 2]]),
        )
        model.cameras[cam_id] = colmap_model.Camera(
            cam_id, "PINHOLE", sc.width, sc.height,
            np.array([sc.K[0, 0], sc.K[1, 1], sc.K[0, 2], sc.K[1, 2]]),
        )
        image_ids = []
        for c in range(sc.num_cameras):
            name = f"{prefix}im{c}.jpg"
            iid = db.add_image(name, cam_id)
            image_ids.append(iid)
            obs = sc.observations[c] + (
                rng.normal(0, noise, sc.observations[c].shape) if noise else 0
            )
            kp = np.hstack([obs, np.ones((obs.shape[0], 1)), np.zeros((obs.shape[0], 1))])
            db.set_keypoints(iid, kp.astype(np.float32))
            q = colmap_model.rotmat_to_qvec(sc.rotations[c])
            model.images[iid] = colmap_model.Image(
                iid, q, sc.translations[c], cam_id, name
            )
        # Pairwise "verified matches" = shared visible points (+ junk).
        for a in range(sc.num_cameras):
            for b in range(a + 1, sc.num_cameras):
                vis = sc.visible[a] & sc.visible[b]
                idx = np.nonzero(vis)[0]
                m = np.stack([idx, idx], axis=1)
                others = np.nonzero(~vis)[0]
                if outlier_frac and len(idx) and len(others):
                    n_bad = min(int(len(idx) * outlier_frac), len(others))
                    junk = np.stack(
                        [rng.choice(idx, n_bad), rng.choice(others, n_bad, replace=False)],
                        axis=1,
                    )
                    m = np.concatenate([m, junk])
                db.set_two_view_geometry(image_ids[a], image_ids[b], m)

    add_scene(scene, "a_" if second_scene is not None else "")
    if second_scene is not None:
        add_scene(second_scene, "b_")
    db.commit()
    return db, model


def test_triangulation_recovers_scene(scene, tmp_path):
    db, empty = _scene_to_db_and_model(scene, tmp_path)
    result = triangulate.triangulate_model(db, empty)
    stats = result.stats
    assert stats["num_reg_images"] == scene.num_cameras
    assert stats["num_sparse_points"] > 100
    assert stats["mean_reproj_error"] < 0.5
    assert stats["mean_track_length"] > 2.5

    # Points must coincide with ground truth (matched by track feature idx).
    errs = []
    for p in result.model.points3D.values():
        gt = scene.points[p.point2D_idxs[0]]  # feature idx == point idx here
        errs.append(np.linalg.norm(p.xyz - gt))
    assert np.median(errs) < 1e-3


def test_triangulation_with_noise_and_outliers(scene, tmp_path):
    db, empty = _scene_to_db_and_model(scene, tmp_path, noise=0.5, outlier_frac=0.1, seed=3)
    result = triangulate.triangulate_model(db, empty)
    stats = result.stats
    assert stats["num_sparse_points"] > 80
    assert stats["mean_reproj_error"] < 1.5
    errs = [
        np.linalg.norm(p.xyz - scene.points[p.point2D_idxs[0]])
        for p in result.model.points3D.values()
    ]
    assert np.median(errs) < 0.05  # ~0.03 expected at 0.5px noise, f=500, depth ~6


def test_all_camera_models_round_trip():
    """distort -> undistort is identity for every supported model."""
    from lfr_tpu.io.colmap_model import Camera
    from lfr_tpu.sfm import cameras as cam_mod

    rng = np.random.default_rng(3)
    xy = rng.uniform(-0.4, 0.4, (200, 2))
    cases = [
        ("SIMPLE_RADIAL", [500, 320, 240, 0.05]),
        ("RADIAL", [500, 320, 240, 0.05, -0.02]),
        ("OPENCV", [500, 510, 320, 240, 0.05, -0.02, 0.001, -0.0015]),
        ("FULL_OPENCV", [500, 510, 320, 240, 0.05, -0.02, 0.001, -0.0015,
                         0.003, 0.01, -0.005, 0.002]),
        ("OPENCV_FISHEYE", [500, 510, 320, 240, 0.03, -0.01, 0.004, -0.002]),
        ("FOV", [500, 510, 320, 240, 0.9]),
        ("SIMPLE_RADIAL_FISHEYE", [500, 320, 240, 0.04]),
        ("RADIAL_FISHEYE", [500, 320, 240, 0.04, -0.01]),
        ("THIN_PRISM_FISHEYE", [500, 510, 320, 240, 0.03, -0.01, 0.001,
                                -0.001, 0.002, -0.001, 0.0005, -0.0005]),
    ]
    for model, params in cases:
        cam = Camera(1, model, 640, 480, np.asarray(params, float))
        dist = cam_mod.distort_normalized(cam, xy)
        undist = cam_mod.undistort_normalized(cam, dist)
        np.testing.assert_allclose(undist, xy, atol=1e-6, err_msg=model)
        # pixel round-trip through the full chain
        K = cam_mod.calibration_matrix(cam)
        uv = dist * np.array([K[0, 0], K[1, 1]]) + K[:2, 2]
        norm = cam_mod.pixel_to_normalized(cam, uv)
        np.testing.assert_allclose(norm, xy, atol=1e-6, err_msg=model)


def test_fisheye_matches_equidistant_model():
    """OPENCV_FISHEYE with zero ks is the pure equidistant projection."""
    from lfr_tpu.io.colmap_model import Camera
    from lfr_tpu.sfm import cameras as cam_mod

    cam = Camera(1, "OPENCV_FISHEYE", 640, 480,
                 np.array([400.0, 400, 320, 240, 0, 0, 0, 0]))
    xy = np.array([[0.3, 0.0], [0.0, -0.5], [0.2, 0.2]])
    d = cam_mod.distort_normalized(cam, xy)
    r = np.linalg.norm(xy, axis=1)
    expect = xy * (np.arctan(r) / r)[:, None]
    np.testing.assert_allclose(d, expect, atol=1e-9)


def test_minimal_solvers_exact_on_minimal_sets():
    """The 8-point F and 4-point H minimal solvers must fit their own
    minimal sets exactly: the null vector of a WIDE design matrix is not
    in the thin SVD's row-space basis (svd of (8, 9) returns 8 right
    vectors), so without zero-row padding the hypothesis stage of every
    RANSAC returned garbage models (regression)."""
    import jax.numpy as jnp

    from lfr_tpu.sfm import geometry

    rng = np.random.default_rng(1)
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = np.array([1.0, 0.2, 0.1])
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    X = rng.uniform(-1, 1, (8, 3))
    X[:, 2] += 5
    x1 = X @ K.T
    x1 = x1[:, :2] / x1[:, 2:]
    x2 = (X @ R.T + t) @ K.T
    x2 = x2[:, :2] / x2[:, 2:]
    F = geometry.fundamental_8point(jnp.asarray(x1), jnp.asarray(x2))
    err = np.asarray(geometry.sampson_error(F, jnp.asarray(x1), jnp.asarray(x2)))
    assert err.max() < 1e-4, f"8-point minimal fit residual {err.max()}"

    H_true = np.array([[1.02, 0.03, 5.0], [-0.02, 0.98, -3.0], [1e-4, -2e-4, 1.0]])
    y1 = rng.uniform(0, 600, (4, 2))
    y1h = np.concatenate([y1, np.ones((4, 1))], axis=1)
    y2h = y1h @ H_true.T
    y2 = y2h[:, :2] / y2h[:, 2:]
    H = geometry.homography_dlt(jnp.asarray(y1), jnp.asarray(y2))
    herr = np.asarray(geometry.homography_error(H, jnp.asarray(y1), jnp.asarray(y2)))
    assert herr.max() < 1e-4, f"4-point minimal fit residual {herr.max()}"
