"""Evaluator tests: mesh PLY reading, surface sampling, accuracy modes."""

import os

import numpy as np

from lfr_tpu.eval import eth3d
from lfr_tpu.io.colmap_model import read_ply_mesh


def _write_tri_ply_binary(path, xyz, faces):
    n, m = len(xyz), len(faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {m}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode()
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(np.asarray(xyz, "<f4").tobytes())
        rec = np.zeros(m, dtype=np.dtype([("n", "u1"), ("v", "<i4", (3,))]))
        rec["n"] = 3
        rec["v"] = faces
        fh.write(rec.tobytes())


def _write_tri_ply_ascii(path, xyz, faces):
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(xyz)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(faces)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for p in xyz:
            fh.write(f"{p[0]} {p[1]} {p[2]}\n")
        for f in faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n")


UNIT_SQUARE = (
    np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float),
    np.array([[0, 1, 2], [0, 2, 3]]),
)


def test_read_ply_mesh_binary_and_ascii(tmp_path):
    xyz, faces = UNIT_SQUARE
    for writer, name in [(_write_tri_ply_binary, "b.ply"), (_write_tri_ply_ascii, "a.ply")]:
        p = os.path.join(tmp_path, name)
        writer(p, xyz, faces)
        vx, fc = read_ply_mesh(p)
        np.testing.assert_allclose(vx, xyz, atol=1e-6)
        np.testing.assert_array_equal(fc, faces)


def test_surface_sampling_density_and_support():
    xyz, faces = UNIT_SQUARE
    pts = eth3d.sample_mesh_surface(xyz, faces, spacing=0.05)
    # ~1 m^2 / (0.05 m)^2 = ~400 samples.
    assert pts.shape[0] >= 380
    # All samples on the z=0 plane inside the square.
    assert np.abs(pts[:, 2]).max() < 1e-9
    assert pts[:, :2].min() >= -1e-9 and pts[:, :2].max() <= 1 + 1e-9


def test_brute_force_nn_matches_kdtree():
    """Device brute-force NN path is numerically exact vs the KD-tree
    (ragged sizes exercise the chunk padding)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    q = (rng.normal(size=(3001, 3)) * 5).astype(np.float32)
    c = (rng.normal(size=(20003, 3)) * 5).astype(np.float32)
    d_brute = eth3d._min_dists_brute(q, c)
    d_ref, _ = cKDTree(c).query(q, k=1, workers=-1)
    np.testing.assert_allclose(d_brute, d_ref, atol=1e-5)


def test_scan_disk_cache_roundtrip(tmp_path):
    """Sampled scan surfaces persist beside the scan and reload with
    identical points; a touched scan invalidates the cache."""
    xyz, faces = UNIT_SQUARE
    p = os.path.join(tmp_path, "scan.ply")
    _write_tri_ply_binary(p, xyz, faces)
    scan1, mode1 = eth3d._load_scan_cached(p, 0.05)
    cache_file = f"{os.path.abspath(p)}.samples-0.05.npz"
    assert os.path.exists(cache_file) and mode1 == "surface"
    eth3d._scan_cache.clear()
    scan2, mode2 = eth3d._load_scan_cached(p, 0.05)
    np.testing.assert_array_equal(scan1.astype(np.float32), scan2)
    # Touch the scan: stale cache must be ignored and rewritten.
    os.utime(p, (1, 1))
    eth3d._scan_cache.clear()
    scan3, _ = eth3d._load_scan_cached(p, 0.05)
    assert scan3.shape[0] > 0


def test_accuracy_uses_surface_not_vertices(tmp_path):
    """A point at the CENTER of a big triangle is accurate w.r.t. the
    surface but far from every vertex — the regression the official
    point-to-scan evaluator gets right."""
    xyz = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    faces = np.array([[0, 1, 2]])
    scan_path = os.path.join(tmp_path, "scan.ply")
    _write_tri_ply_binary(scan_path, xyz, faces)

    center = np.array([[0.66, 0.66, 0.001]])
    rec_path = os.path.join(tmp_path, "rec.ply")
    _write_tri_ply_binary(rec_path, center, np.zeros((0, 3), int))

    res = eth3d.evaluate_ply(rec_path, scan_path)
    assert res["evaluation_mode"] == "surface"
    assert res["accuracies"][0] == 1.0  # within 1 cm of the surface

    res_v = eth3d.evaluate_ply(rec_path, scan_path, surface_spacing=None)
    assert res_v["evaluation_mode"] == "vertex"
    assert res_v["accuracies"][0] == 0.0  # ~0.93 m from nearest vertex

    txt = eth3d.format_results(res)
    assert "Evaluation-mode: surface" in txt


def test_device_count_path_matches_kdtree(monkeypatch):
    """The on-device count-within path (used at production scale to avoid
    shipping multi-million-point distance vectors through the tunnel)
    must agree exactly with the exact host KD-tree, including the
    padded-query x padded-corpus distance-0 correction."""
    rng = np.random.default_rng(3)
    # Corpus NOT a multiple of the 4096 block (both sides padded).
    scan = rng.uniform(-1, 1, (5001, 3))
    rec = scan[:301] + rng.normal(0, 0.01, (301, 3))
    monkeypatch.setenv("LFR_EVAL_BRUTE", "1")
    res_b = eth3d.evaluate_point_cloud(rec, scan, mode="surface")
    monkeypatch.setenv("LFR_EVAL_BRUTE", "0")
    res_k = eth3d.evaluate_point_cloud(rec, scan, mode="surface")
    np.testing.assert_allclose(res_b["accuracies"], res_k["accuracies"], atol=1e-12)
    np.testing.assert_allclose(
        res_b["completenesses"], res_k["completenesses"], atol=1e-12
    )

    # Corpus an exact block multiple (no corpus padding, queries padded).
    scan2 = rng.uniform(-1, 1, (4096, 3))
    rec2 = scan2[:100] + rng.normal(0, 0.01, (100, 3))
    monkeypatch.setenv("LFR_EVAL_BRUTE", "1")
    res_b2 = eth3d.evaluate_point_cloud(rec2, scan2, mode="surface")
    monkeypatch.setenv("LFR_EVAL_BRUTE", "0")
    res_k2 = eth3d.evaluate_point_cloud(rec2, scan2, mode="surface")
    np.testing.assert_allclose(res_b2["accuracies"], res_k2["accuracies"], atol=1e-12)
    np.testing.assert_allclose(
        res_b2["completenesses"], res_k2["completenesses"], atol=1e-12
    )


def _one_cam_model(f=100.0, w=200, h=200):
    from lfr_tpu.io import colmap_model as cm

    model = cm.Model()
    model.cameras[1] = cm.Camera(1, "PINHOLE", w, h, np.array([f, f, w / 2, h / 2]))
    model.images[1] = cm.Image(
        1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "cam0.png"
    )
    return model


def test_visibility_mask_occlusion_and_frustum():
    """Z-buffer visibility: a plane behind another is occluded; samples
    outside the occluder's silhouette (or outside the frustum) follow the
    frustum/depth rules; everything on the front plane is visible."""
    step = 0.02
    g = np.arange(-0.5, 0.5 + 1e-9, step)
    xx, yy = np.meshgrid(g, g)
    front = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, 2.0)], axis=1)
    # Same lateral extent at z=4: projects INSIDE the front plane's
    # silhouette -> occluded.
    back_occ = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, 4.0)], axis=1)
    # Far off-axis at z=4: projects outside the silhouette (clear of the
    # one-bin splat bleed at the boundary) -> visible.
    back_vis = np.stack(
        [xx.ravel() + 2.0, yy.ravel(), np.full(xx.size, 4.0)], axis=1
    )
    # Behind the camera -> never visible.
    behind = np.array([[0.0, 0.0, -3.0]])
    scan = np.concatenate([front, back_occ, back_vis, behind])

    from lfr_tpu.eval import eth3d

    mask = eth3d.scan_visibility_mask(scan, _one_cam_model())
    n = front.shape[0]
    assert mask[:n].all(), "front plane must be fully visible"
    assert not mask[n : 2 * n].any(), "occluded back samples must be masked"
    assert mask[2 * n : 3 * n].mean() > 0.95, "off-silhouette samples visible"
    assert not mask[-1], "behind-camera sample must be masked"


def test_visibility_restricts_completeness_only():
    """With a visibility subset, completeness is measured over visible
    samples only while accuracy keeps the full scan corpus."""
    rng = np.random.default_rng(0)
    scan = rng.uniform(-1, 1, (4000, 3))
    visible = scan[:1000]
    # Reconstruction covers exactly the visible half-space region.
    rec = visible + rng.normal(0, 1e-4, visible.shape)

    from lfr_tpu.eval import eth3d

    res = eth3d.evaluate_point_cloud(
        rec, scan, tolerances=[0.01], mode="surface+visibility",
        scan_completeness=visible,
    )
    assert res["completenesses"][0] == 1.0  # all visible samples covered
    assert res["accuracies"][0] == 1.0  # rec points near true surface
    res_full = eth3d.evaluate_point_cloud(rec, scan, tolerances=[0.01])
    assert res_full["completenesses"][0] < 0.5  # unmasked denominator
