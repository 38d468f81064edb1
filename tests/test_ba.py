"""Bundle adjustment tests on synthetic scenes."""

import numpy as np
import pytest

from lfr_tpu.sfm import ba
from lfr_tpu.utils import synthetic


def _problem_from_scene(scene, rng, cam_noise=0.01, pt_noise=0.02, fix=(0,)):
    obs_cam, obs_pt, obs_uv, obs_focal = [], [], [], []
    f = scene.K[0, 0]
    for c in range(scene.num_cameras):
        vis = np.nonzero(scene.visible[c])[0]
        uv_px = scene.observations[c][vis]
        # Normalized coordinates.
        uv_n = (uv_px - scene.K[:2, 2]) / f
        obs_cam.append(np.full(len(vis), c))
        obs_pt.append(vis)
        obs_uv.append(uv_n)
        obs_focal.append(np.full(len(vis), f))

    R = scene.rotations.copy()
    t = scene.translations.copy()
    X = scene.points.copy()
    for c in range(scene.num_cameras):
        if c not in fix:
            R[c] = np.asarray(ba.so3_exp(rng.normal(0, cam_noise, 3))) @ R[c]
            t[c] = t[c] + rng.normal(0, cam_noise, 3)
    X = X + rng.normal(0, pt_noise, X.shape)

    fixed = np.zeros(scene.num_cameras, bool)
    for c in fix:
        fixed[c] = True

    obs_pt_arr = np.concatenate(obs_pt)
    order = np.argsort(obs_pt_arr, kind="stable")
    return ba.BAProblem(
        R,
        t,
        X,
        np.concatenate(obs_cam)[order],
        obs_pt_arr[order],
        np.concatenate(obs_uv)[order],
        np.concatenate(obs_focal)[order],
        fixed,
    )


def test_ba_reduces_cost_and_recovers_geometry():
    rng = np.random.default_rng(0)
    scene = synthetic.random_scene(rng, num_points=80, num_cameras=4)
    prob = _problem_from_scene(scene, rng, fix=(0, 1))

    R0, t0 = prob.R.copy(), prob.t.copy()
    R, t, fs, X, cost = ba.run_ba(prob, iterations=40)

    # Final mean reprojection error must be tiny (perfect synthetic data).
    n_obs = prob.obs_cam.shape[0]
    rms = np.sqrt(2 * cost / n_obs)
    assert rms < 0.05, f"rms reprojection {rms} px"

    # Fixed cameras untouched.
    np.testing.assert_allclose(R[0], prob.R[0], atol=1e-12)
    np.testing.assert_allclose(t[1], prob.t[1], atol=1e-12)

    # Free cameras moved back toward ground truth.
    for c in (2, 3):
        before = np.abs(R0[c] - scene.rotations[c]).max()
        after = np.abs(R[c] - scene.rotations[c]).max()
        assert after < before * 0.2


def test_ba_with_noisy_observations():
    rng = np.random.default_rng(1)
    scene = synthetic.random_scene(rng, num_points=60, num_cameras=3, noise_px=0.5)
    prob = _problem_from_scene(scene, rng, cam_noise=0.005, pt_noise=0.01, fix=(0, 1))
    _, _, _, _, cost = ba.run_ba(prob, iterations=30)
    n_obs = prob.obs_cam.shape[0]
    rms = np.sqrt(2 * cost / n_obs)
    assert rms < 1.5  # should settle near the 0.5px noise floor


def test_so3_exp_properties():
    rng = np.random.default_rng(2)
    w = rng.standard_normal(3) * 0.3
    import jax.numpy as jnp

    R = np.asarray(ba.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
    # Small-angle: exp(w) ~ I + [w]x
    w_small = np.array([1e-4, -2e-4, 5e-5])
    R_small = np.asarray(ba.so3_exp(jnp.asarray(w_small)))
    K = np.array(
        [[0, -w_small[2], w_small[1]], [w_small[2], 0, -w_small[0]], [-w_small[1], w_small[0], 0]]
    )
    np.testing.assert_allclose(R_small, np.eye(3) + K, atol=1e-7)


def test_ba_focal_refinement():
    """A global focal error on free cameras is absorbed by log-scale refinement."""
    rng = np.random.default_rng(3)
    scene = synthetic.random_scene(rng, num_points=80, num_cameras=4)
    prob = _problem_from_scene(scene, rng, cam_noise=0.0, pt_noise=0.0, fix=(0, 1))
    # Corrupt the focal of cameras 2 and 3 by 3%: observations were made at
    # f, but we claim f*1.03 -> normalized obs shrink by 1/1.03.
    bad = np.isin(prob.obs_cam, [2, 3])
    prob.obs_uv[bad] /= 1.03
    prob.refine_focal = True
    R, t, fs, X, cost = ba.run_ba(prob, iterations=40)
    n_obs = prob.obs_cam.shape[0]
    rms = np.sqrt(2 * cost / n_obs)
    assert rms < 0.2, rms
    # Recovered scales: ~1/1.03 on the corrupted cameras, ~1 on fixed ones.
    np.testing.assert_allclose(np.exp(fs[2:]), 1 / 1.03, rtol=0.01)
    np.testing.assert_allclose(fs[:2], 0.0, atol=1e-12)


def _long_track_problem(rng, n_cam, n_pts, cam_noise=0.005, pt_noise=0.02):
    """Every point observed by EVERY camera: track length = n_cam."""
    f = 500.0
    points = rng.uniform(-1.0, 1.0, (n_pts, 3))
    points[:, 2] += 6.0
    R = np.zeros((n_cam, 3, 3))
    t = np.zeros((n_cam, 3))
    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cam):
        Rc = np.asarray(ba.so3_exp(rng.normal(0, 0.02, 3)))
        center = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-0.3, 0.3)])
        R[c], t[c] = Rc, -Rc @ center
        cam_pts = points @ Rc.T + t[c]
        obs_cam.append(np.full(n_pts, c))
        obs_pt.append(np.arange(n_pts))
        obs_uv.append(cam_pts[:, :2] / cam_pts[:, 2:])
    order = np.argsort(np.concatenate(obs_pt), kind="stable")
    R_noisy, t_noisy = R.copy(), t.copy()
    for c in range(2, n_cam):
        R_noisy[c] = np.asarray(ba.so3_exp(rng.normal(0, cam_noise, 3))) @ R[c]
        t_noisy[c] = t[c] + rng.normal(0, cam_noise, 3)
    fixed = np.zeros(n_cam, bool)
    fixed[:2] = True
    return ba.BAProblem(
        R_noisy, t_noisy, points + rng.normal(0, pt_noise, points.shape),
        np.concatenate(obs_cam)[order], np.concatenate(obs_pt)[order],
        np.concatenate(obs_uv)[order], np.full(n_cam * n_pts, f)[order], fixed,
    )


def _dense_gn_step(prob, free_mask, n_points):
    """Dense reference: assemble the FULL weighted normal equations over
    (camera params + point params) with autodiff Jacobians and solve
    undamped Gauss-Newton, mirroring schur_step's masking/weighting."""
    import jax
    import jax.numpy as jnp

    C = prob.R.shape[0]
    d = ba.CAM_DOF
    fscale = np.zeros(C)
    r, Jc, Jp, w = ba._obs_jacobians(
        jnp.asarray(prob.R), jnp.asarray(prob.t), jnp.asarray(fscale),
        jnp.asarray(prob.points), jnp.asarray(prob.obs_cam),
        jnp.asarray(prob.obs_pt), jnp.asarray(prob.obs_uv),
        jnp.asarray(prob.obs_focal),
    )
    r, Jc, Jp, w = map(np.asarray, (r, Jc, Jp, w))
    Jc = Jc * free_mask[prob.obs_cam][:, None, :]
    sw = np.sqrt(w)[:, None, None]
    Jc, Jp = Jc * sw, Jp * sw
    rw = r * np.sqrt(w)[:, None]

    n = d * C + 3 * n_points
    H = np.zeros((n, n))
    g = np.zeros(n)
    for o in range(r.shape[0]):
        ci, pi = prob.obs_cam[o], prob.obs_pt[o]
        J = np.zeros((2, n))
        J[:, d * ci : d * ci + d] = Jc[o]
        J[:, d * C + 3 * pi : d * C + 3 * pi + 3] = Jp[o]
        H += J.T @ J
        g += J.T @ rw[o]
    fflat = np.concatenate([free_mask.reshape(-1), np.ones(3 * n_points)])
    H = H * fflat[:, None] * fflat[None, :] + np.diag(1.0 - fflat)
    g = g * fflat
    delta = np.linalg.solve(H, -g)
    return delta[: d * C].reshape(C, d), delta[d * C :].reshape(n_points, 3)


def test_schur_matches_dense_gn_long_track():
    """A 100-observation track must produce the SAME GN step through the
    grouped Schur path as through a dense solve (regression: a 32-obs cap
    once made the two systems inconsistent)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n_cam, n_pts = 100, 12
    prob = _long_track_problem(rng, n_cam, n_pts)
    counts = np.bincount(prob.obs_pt, minlength=n_pts)
    assert counts.min() == n_cam  # the long-track premise

    free = ba._free_mask(prob)
    pt_idx, pt_valid = ba._group_by_point(prob.obs_pt, n_pts)
    assert pt_idx.shape[1] == n_cam  # no silent cap
    assert pt_valid.sum() == prob.obs_pt.shape[0]  # every obs grouped once

    dc, dX = ba.schur_step(
        jnp.asarray(prob.R), jnp.asarray(prob.t),
        jnp.zeros(n_cam), jnp.asarray(prob.points),
        jnp.asarray(0.0),
        jnp.asarray(prob.obs_cam), jnp.asarray(prob.obs_pt),
        jnp.asarray(prob.obs_uv), jnp.asarray(prob.obs_focal),
        jnp.asarray(free), jnp.asarray(pt_idx), jnp.asarray(pt_valid),
        n_cameras=n_cam,
    )
    dc_ref, dX_ref = _dense_gn_step(prob, free, n_pts)
    scale = max(np.abs(dc_ref).max(), 1e-8)
    np.testing.assert_allclose(np.asarray(dc), dc_ref, atol=2e-3 * scale + 1e-6)
    np.testing.assert_allclose(
        np.asarray(dX), dX_ref, atol=2e-3 * max(np.abs(dX_ref).max(), 1e-8) + 1e-6
    )


def test_schur_point_chunking_matches_single_chunk(monkeypatch):
    """Streaming the point axis through the scan in small chunks must give
    the same GN step as one chunk (the chunking bounds the G/H aggregation
    buffers at 1,000-camera scale; it must not change the numbers)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    n_cam, n_pts = 10, 64
    prob = _long_track_problem(rng, n_cam, n_pts)
    free = ba._free_mask(prob)
    pt_idx, pt_valid = ba._group_by_point(prob.obs_pt, n_pts)
    args = (
        jnp.asarray(prob.R), jnp.asarray(prob.t),
        jnp.zeros(n_cam), jnp.asarray(prob.points),
        jnp.asarray(1e-3),
        jnp.asarray(prob.obs_cam), jnp.asarray(prob.obs_pt),
        jnp.asarray(prob.obs_uv), jnp.asarray(prob.obs_focal),
        jnp.asarray(free), jnp.asarray(pt_idx), jnp.asarray(pt_valid),
    )
    dc1, dX1 = ba.schur_step(*args, n_cameras=n_cam)
    monkeypatch.setattr(ba, "POINT_CHUNK", 16)  # force 4 chunks
    dc4, dX4 = ba.schur_step(*args, n_cameras=n_cam)
    np.testing.assert_allclose(np.asarray(dc4), np.asarray(dc1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dX4), np.asarray(dX1), atol=1e-6)


def test_ba_long_track_descends():
    """Full BA on the 100-camera single-visibility scene reaches the floor."""
    rng = np.random.default_rng(8)
    prob = _long_track_problem(rng, 100, 12, cam_noise=0.003, pt_noise=0.01)
    _, _, _, _, cost = ba.run_ba(prob, iterations=30)
    rms = np.sqrt(2 * cost / prob.obs_cam.shape[0])
    assert rms < 0.05, rms


def test_shared_focal_groups_couple_views():
    """Views in the same focal group recover ONE shared scale; a view in
    its own group recovers its own (COLMAP shared-intrinsics coupling)."""
    rng = np.random.default_rng(4)
    scene = synthetic.random_scene(rng, num_points=80, num_cameras=5)
    prob = _problem_from_scene(scene, rng, cam_noise=0.0, pt_noise=0.0, fix=(0, 1))
    # Cameras 2+3 share a physical camera with a 3% focal error; camera 4
    # is its own camera with a -2% error.
    bad_a = np.isin(prob.obs_cam, [2, 3])
    bad_b = prob.obs_cam == 4
    prob.obs_uv[bad_a] /= 1.03
    prob.obs_uv[bad_b] /= 0.98
    prob.refine_focal = True
    prob.focal_group = np.array([0, 1, 2, 2, 3])
    R, t, fs, X, cost = ba.run_ba(prob, iterations=40)
    rms = np.sqrt(2 * cost / prob.obs_cam.shape[0])
    assert rms < 0.2, rms
    # The shared group recovers one identical scale for both views.
    assert fs[2] == fs[3]
    np.testing.assert_allclose(np.exp(fs[2]), 1 / 1.03, rtol=0.01)
    np.testing.assert_allclose(np.exp(fs[4]), 1 / 0.98, rtol=0.01)
    np.testing.assert_allclose(fs[:2], 0.0, atol=1e-12)
