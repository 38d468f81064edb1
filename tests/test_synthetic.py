"""Tests for the synthetic scene generators.

The reference has no test data generator (SURVEY.md §4); these guard the
framework's ground-truth playground: camera rigs must see the surface at
ANY camera count, and the layered scene must model occlusion correctly.
"""

import numpy as np

from lfr_tpu.utils import synthetic


def test_arc_poses_bounded_span():
    """Rigs of any size keep every camera pointed at the surface."""
    for n in (4, 13, 30, 100, 300):
        poses = synthetic._arc_poses(n, look_z=6.0)
        assert len(poses) == n
        # Every optical axis (R^T @ [0,0,1]) must have a positive world-z
        # component much larger than lateral drift: camera faces the plane.
        for R, center in poses:
            axis = R.T @ np.array([0.0, 0.0, 1.0])
            assert axis[2] > 0.8, f"camera facing away at n={n}"
            assert abs(center[1]) <= 1.8 + 1e-9


def test_arc_poses_small_rig_unchanged():
    """<=13 cameras keep the original 0.1-rad / 0.15-unit spacing."""
    poses = synthetic._arc_poses(4, look_z=6.0)
    angles = [np.arctan2(R[0, 2], R[0, 0]) for R, _ in poses]
    np.testing.assert_allclose(angles, [-0.15, -0.05, 0.05, 0.15], atol=1e-12)
    np.testing.assert_allclose([c[1] for _, c in poses], [0, 0.15, 0.3, 0.45])


def test_planar_scene_large_rig_covisibility():
    rng = np.random.default_rng(0)
    scene, _ = synthetic.planar_scene(
        rng, num_points=60, num_cameras=60, width=320, height=240
    )
    vis = np.stack(scene.visible)
    # Every camera sees a meaningful share of the surface points, and
    # adjacent cameras share points to match.
    assert vis.mean(axis=1).min() > 0.15
    covis = [(vis[i] & vis[i + 1]).sum() for i in range(59)]
    assert min(covis) >= 5


def test_layered_scene_occlusion_and_mesh():
    rng = np.random.default_rng(1)
    scene, images = synthetic.layered_scene(
        rng, num_points=160, num_cameras=4, width=640, height=480
    )
    assert len(images) == 4 and images[0].shape == (480, 640, 3)
    assert scene.points.shape == (160, 3)

    vis = np.stack(scene.visible)
    bg = scene.points[:, 2] > 6.9
    # Some in-bounds background points must be occluded by a slab in at
    # least one view (that's the point of the scene).
    occluded_any = False
    for c in range(4):
        uv = scene.observations[c]
        inb = (
            (uv[:, 0] > 20)
            & (uv[:, 0] < 620)
            & (uv[:, 1] > 20)
            & (uv[:, 1] < 460)
        )
        occluded_any |= bool((inb & bg & ~vis[c]).any())
    assert occluded_any

    # Visible points reproject consistently: a visible slab point's pixel
    # must show the slab texture region (not background).  Spot-check via
    # geometry: un-project the pixel ray and verify it hits the point's
    # surface depth first.
    verts, faces = synthetic.layered_surface_mesh()
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    # background quad + one quad per slab
    assert len(verts) == 4 + 4 * len(synthetic.DEFAULT_SLABS)

    # Points lie on the mesh surfaces (z equals a surface z).
    zs = {round(v, 3) for v in verts[:, 2]}
    for z in np.unique(scene.points[:, 2].round(3)):
        assert z in zs


def test_layered_scene_exposure_jitter_changes_views():
    rng = np.random.default_rng(2)
    _, img_a = synthetic.layered_scene(
        rng, num_points=20, num_cameras=2, width=160, height=120,
        exposure_jitter=0.0,
    )
    rng = np.random.default_rng(2)
    _, img_b = synthetic.layered_scene(
        rng, num_points=20, num_cameras=2, width=160, height=120,
        exposure_jitter=0.25,
    )
    # Same geometry, different photometry.
    diff = np.abs(img_a[0].astype(float) - img_b[0].astype(float)).mean()
    assert diff > 2.0


def test_procedural_textures_families():
    from lfr_tpu.utils import corpus

    rng = np.random.default_rng(3)
    texs = corpus.procedural_textures(rng, count=6, size=128)
    assert len(texs) == 6
    for t in texs:
        assert t.shape == (128, 128, 3) and t.dtype == np.float32
        assert 0.0 <= t.min() and t.max() <= 255.0
        # Textured, not flat: every family must carry real contrast.
        assert t.std() > 5.0
    # Distinct families produce distinct images.
    flat = [t.mean(axis=2) for t in texs]
    assert np.abs(flat[0] - flat[1]).mean() > 1.0
