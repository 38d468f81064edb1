"""Incremental SfM tests: PnP and the full mapper on synthetic scenes."""

import numpy as np
import pytest

from lfr_tpu.sfm import pnp
from lfr_tpu.utils import synthetic


def test_pnp_recovers_pose():
    rng = np.random.default_rng(0)
    scene = synthetic.random_scene(rng, num_points=100, num_cameras=2)
    c = 1
    vis = np.nonzero(scene.visible[c])[0]
    f = scene.K[0, 0]
    uv_n = (scene.observations[c][vis] - scene.K[:2, 2]) / f
    result = pnp.estimate_pose(scene.points[vis], uv_n, f, seed=0)
    assert result is not None
    R, t, inliers = result
    np.testing.assert_allclose(R, scene.rotations[c], atol=1e-4)
    np.testing.assert_allclose(t, scene.translations[c], atol=1e-4)
    assert inliers.mean() > 0.99


def test_pnp_with_outliers():
    rng = np.random.default_rng(1)
    scene = synthetic.random_scene(rng, num_points=120, num_cameras=2)
    c = 1
    vis = np.nonzero(scene.visible[c])[0]
    f = scene.K[0, 0]
    uv_n = (scene.observations[c][vis] - scene.K[:2, 2]) / f
    X = scene.points[vis].copy()
    n_bad = len(vis) // 4
    bad = rng.choice(len(vis), n_bad, replace=False)
    X[bad] += rng.normal(0, 1.0, (n_bad, 3))
    result = pnp.estimate_pose(X, uv_n, f, seed=0)
    assert result is not None
    R, t, inliers = result
    np.testing.assert_allclose(R, scene.rotations[c], atol=1e-3)
    assert not inliers[bad].any() or inliers[bad].mean() < 0.1


def test_mapper_reconstructs_synthetic_scene(tmp_path):
    from test_sfm import _scene_to_db_and_model

    rng = np.random.default_rng(2)
    scene = synthetic.random_scene(rng, num_points=150, num_cameras=5, noise_px=0.3)
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.3, seed=5)

    from lfr_tpu.sfm import mapper

    model, stats = mapper.reconstruct(db, verbose=False)
    assert model is not None
    assert stats["num_reg_images"] == scene.num_cameras
    assert stats["num_sparse_points"] > 100
    assert stats["mean_reproj_error"] < 1.0
    assert stats["mean_track_length"] > 3.0

    # Up-to-similarity check: camera-center distance ratios must match GT.
    centers = {}
    gt_centers = {}
    for im in model.images.values():
        R = np.asarray(__import__("lfr_tpu.io.colmap_model", fromlist=["qvec_to_rotmat"]).qvec_to_rotmat(im.qvec))
        centers[im.name] = -R.T @ im.tvec
    for c in range(scene.num_cameras):
        gt_centers[f"im{c}.jpg"] = -scene.rotations[c].T @ scene.translations[c]
    names = sorted(centers)
    d = lambda A, a, b: np.linalg.norm(A[a] - A[b])  # noqa: E731
    # The narrow-arc geometry (2-8 deg triangulation angles, 0.3px noise)
    # carries a few-percent intrinsic shape uncertainty along depth.
    base = d(centers, names[0], names[1]) / d(gt_centers, names[0], names[1])
    for a in range(len(names)):
        for b in range(a + 1, len(names)):
            ratio = d(centers, names[a], names[b]) / max(d(gt_centers, names[a], names[b]), 1e-12)
            np.testing.assert_allclose(ratio, base, rtol=0.08)


def test_mapper_scales_to_more_cameras(tmp_path):
    """8-camera scene with noise: registration + accuracy should hold."""
    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper

    rng = np.random.default_rng(9)
    scene = synthetic.random_scene(rng, num_points=250, num_cameras=8, noise_px=0.4)
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.4, seed=9)
    model, stats = mapper.reconstruct(db, verbose=False)
    assert model is not None
    assert stats["num_reg_images"] == 8
    assert stats["num_sparse_points"] > 150
    assert stats["mean_reproj_error"] < 1.0


def test_mapper_20_cameras_noisy_with_outliers(tmp_path):
    """VERDICT target: 20-camera scene, pixel noise AND outlier matches.

    Exercises RANSAC initialization, local BA per registration, periodic
    retriangulation, and the array-based bookkeeping at a scale where the
    old per-feature dict loops were the bottleneck."""
    import time

    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper

    rng = np.random.default_rng(11)
    scene = synthetic.random_scene(
        rng, num_points=300, num_cameras=20, noise_px=0.4, arc_step=0.05
    )
    db, _ = _scene_to_db_and_model(
        scene, tmp_path, noise=0.4, outlier_frac=0.15, seed=11
    )
    t0 = time.perf_counter()
    model, stats = mapper.reconstruct(db, verbose=False)
    elapsed = time.perf_counter() - t0
    assert model is not None
    assert stats["num_reg_images"] == 20, stats
    assert stats["num_sparse_points"] > 150
    assert stats["mean_reproj_error"] < 1.2, stats
    assert stats["mean_track_length"] > 4.0, stats
    # Bookkeeping sanity: generous wall-clock bound that the dict-based
    # implementation blew through at this scale.
    assert elapsed < 300, f"mapper took {elapsed:.1f}s"


def test_local_ba_keeps_drift_bounded(tmp_path):
    """With global BA turned OFF (huge interval), per-registration local
    BA alone must keep the chained reconstruction consistent."""
    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper

    rng = np.random.default_rng(13)
    scene = synthetic.random_scene(rng, num_points=200, num_cameras=8, noise_px=0.3)
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.3, seed=13)
    opts = mapper.MapperOptions(ba_global_every=10_000)
    model, stats = mapper.reconstruct(db, options=opts, verbose=False)
    assert model is not None
    assert stats["num_reg_images"] == 8
    assert stats["mean_reproj_error"] < 1.5, stats


def test_failed_init_leaves_no_partial_state(tmp_path):
    """An initialization attempt that fails AFTER creating poses/points
    must fully reset — leaked partial state (R entries + tracks for
    images absent from `registered`) crashed local BA at 100 cameras
    (regression)."""
    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper as mapper_mod

    rng = np.random.default_rng(3)
    scene = synthetic.random_scene(rng, num_points=150, num_cameras=4, noise_px=0.3)
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.3, seed=7)
    m = mapper_mod.IncrementalMapper(db)
    (id1, id2), _ = max(m.pair_matches.items(), key=lambda kv: kv[1].shape[0])
    # Force the final point-count gate to fail: point creation disabled.
    m._new_point = lambda X, obs: None
    assert not m._try_initialize(id1, id2)
    assert not m.R and not m.registered and m.n_points == 0
    assert not m.registered_mask.any()
    assert (m.pid_of_g == -1).all()
    assert not m._pid_live.any() and not m.pair_set
    assert (m.per_img_cand == 0).all() and (m.nbr_assigned == 0).all()


def test_incremental_ranking_matches_full_recompute(tmp_path):
    """The O(degree)-per-assignment candidate-ranking bookkeeping must
    track the O(E) full recomputation exactly through registration,
    triangulation, completion, and filtering."""
    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper as mapper_mod

    rng = np.random.default_rng(21)
    scene = synthetic.random_scene(rng, num_points=200, num_cameras=6, noise_px=0.4)
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.4, outlier_frac=0.1, seed=21)
    m = mapper_mod.IncrementalMapper(db)

    checks = []
    orig_filter = m._filter_points

    def checked_filter():
        r = orig_filter()
        checks.append(
            np.array_equal(m.per_img_cand, m._ranking_counts_full())
        )
        return r

    m._filter_points = checked_filter
    model = m.reconstruct(verbose=False)
    assert model is not None
    assert checks and all(checks)
    np.testing.assert_array_equal(m.per_img_cand, m._ranking_counts_full())


def test_disconnected_scene_builds_multiple_models(tmp_path):
    """Two disjoint camera clusters in one database: the mapper must
    reconstruct both models and return the larger one (reference picks
    the largest colmap model by camera count, colmap_utils.py:238-264)."""
    from test_sfm import _scene_to_db_and_model

    from lfr_tpu.sfm import mapper as mapper_mod

    rng = np.random.default_rng(31)
    # Build one DB holding two independent scenes: cluster A (5 cams) and
    # cluster B (4 cams) share no matches.
    scene_a = synthetic.random_scene(rng, num_points=180, num_cameras=5, noise_px=0.3)
    scene_b = synthetic.random_scene(rng, num_points=150, num_cameras=4, noise_px=0.3)
    db, _ = _scene_to_db_and_model(
        scene_a, tmp_path, noise=0.3, seed=31, second_scene=scene_b
    )
    model, stats = mapper_mod.reconstruct(db, verbose=False)
    assert model is not None
    assert stats["num_models"] == 2, stats
    assert sorted(stats["model_sizes"], reverse=True) == [5, 4]
    assert stats["num_reg_images"] == 5  # largest selected
    # The selected model's images must all come from one cluster.
    names = {im.name for im in model.images.values()}
    assert all(n.startswith("a_") for n in names) or all(
        n.startswith("b_") for n in names
    )


def test_mapper_planar_scene_homography_init(tmp_path):
    """A purely planar scene defeats 8-point essential initialization
    (the dominant plane makes F quasi-degenerate); the mapper must fall
    back to homography decomposition like colmap's initializer."""
    from test_sfm import _scene_to_db_and_model

    rng = np.random.default_rng(11)
    scene = synthetic.planar_scene(
        rng, num_points=150, num_cameras=5, depth_step=0.0
    )[0]
    db, _ = _scene_to_db_and_model(scene, tmp_path, noise=0.2, seed=3)

    from lfr_tpu.sfm import mapper

    model, stats = mapper.reconstruct(db, verbose=False)
    assert model is not None
    # Registration of every view is not guaranteed on an EXACT plane (the
    # PnP stage has its own coplanarity corner); the init itself must work.
    assert stats["num_reg_images"] >= scene.num_cameras - 1
    assert stats["mean_reproj_error"] < 1.0


def test_decompose_homography_recovers_pose():
    """H = R + t n^T (normalized coords, plane distance folded into t)
    must decompose back to (R, t/|t|) among the candidates."""
    from lfr_tpu.sfm.mapper import IncrementalMapper

    rng = np.random.default_rng(4)
    w = 0.25 * rng.standard_normal(3)
    th = np.linalg.norm(w)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = np.array([0.4, -0.1, 0.2])
    n = np.array([0.1, -0.05, -1.0])
    n /= np.linalg.norm(n)
    H = R + np.outer(t, n)

    cands = IncrementalMapper._decompose_homography(H)
    assert cands
    t_unit = t / np.linalg.norm(t)
    errs = [
        (np.abs(Rc - R).max(), min(np.linalg.norm(tc - t_unit), np.linalg.norm(tc + t_unit)))
        for Rc, tc in cands
    ]
    best = min(errs, key=lambda e: e[0] + e[1])
    assert best[0] < 1e-6 and best[1] < 1e-6
