"""Generate the checked-in miniature real-layout dataset fixtures.

Real ETH3D / LFE datasets cannot be downloaded here (no network egress),
so tests exercise the download-script layouts on miniature stand-ins that
replicate them exactly (reference: eth/download.sh:7-20 produces
images/dslr_images_undistorted/*.JPG + dslr_calibration_undistorted/ +
dslr_scan_eval/scan_alignment.mlp; local-feature-evaluation/download.sh
produces flat images/).  The fixtures hold ONLY what the downloads hold —
images, GT calibration, scan — everything else (database, match list,
features) is produced by the real tools at test time, so first contact
with the layouts is in CI, not production.

Usage: python scripts/make_mini_fixtures.py  (writes tests/fixtures/)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lfr_tpu.io import colmap_model
from lfr_tpu.utils import corpus, synthetic

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _save_jpg(path: str, img: np.ndarray) -> None:
    from PIL import Image as PILImage

    os.makedirs(os.path.dirname(path), exist_ok=True)
    PILImage.fromarray(img.astype(np.uint8)).save(path, quality=92)


def _texture(rng, idx: int) -> np.ndarray:
    paths = corpus.discover_local_images()
    if paths:
        from PIL import Image as PILImage

        return np.asarray(PILImage.open(paths[idx % len(paths)]).convert("RGB"))
    return synthetic.textured_image(rng, 512, 512)


def make_eth3d_mini(root: str) -> None:
    """ETH3D undistorted-archive layout with nested image names.

    The scan is split across TWO plys with DIFFERENT non-identity
    MLMatrix44 transforms (real scan_alignment.mlp projects carry one
    mesh per laser-scan station, each with its own alignment matrix).
    """
    rng = np.random.default_rng(20260820)
    scene, images = synthetic.planar_scene(
        rng,
        num_points=60,
        num_cameras=3,
        width=480,
        height=360,
        depth_step=0.4,
        texture=_texture(rng, 0),
        exposure_jitter=0.08,
    )

    gt = colmap_model.Model()
    cam_id = 1
    gt.cameras[cam_id] = colmap_model.Camera(
        cam_id,
        "PINHOLE",
        scene.width,
        scene.height,
        np.array([scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]]),
    )
    for c in range(scene.num_cameras):
        name = f"dslr_images_undistorted/DSC_{c + 1:04d}.JPG"
        _save_jpg(os.path.join(root, "images", name), images[c])
        gt.images[c + 1] = colmap_model.Image(
            c + 1,
            colmap_model.rotmat_to_qvec(scene.rotations[c]),
            scene.translations[c],
            cam_id,
            name,
        )
    colmap_model.write_model(os.path.join(root, "dslr_calibration_undistorted"), gt)

    # Scan: the true surface mesh, stored PRE-transformed by the inverse
    # of each station's alignment matrix, which the .mlp then restores.
    verts, faces = synthetic.planar_surface_mesh(depth_step=0.4)
    os.makedirs(os.path.join(root, "dslr_scan_eval"), exist_ok=True)

    def _rigid(angle_deg: float, axis: np.ndarray, t: np.ndarray) -> np.ndarray:
        axis = axis / np.linalg.norm(axis)
        a = np.deg2rad(angle_deg)
        K = np.array(
            [
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ]
        )
        R = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        return M

    stations = [
        (_rigid(17.0, np.array([0.2, 1.0, 0.1]), np.array([0.4, -0.2, 1.1])), [0, 1]),
        (_rigid(-9.0, np.array([1.0, 0.3, 0.6]), np.array([-0.7, 0.5, -0.3])), [2, 3]),
    ]
    mlp_entries = []
    for k, (M, face_rows) in enumerate(stations):
        sub_faces = faces[face_rows]
        used = np.unique(sub_faces)
        remap = {v: i for i, v in enumerate(used)}
        sub_verts = verts[used]
        sub_faces = np.vectorize(remap.get)(sub_faces)
        Minv = np.linalg.inv(M)
        stored = sub_verts @ Minv[:3, :3].T + Minv[:3, 3]
        ply_name = f"scan{k + 1}.ply"
        colmap_model.write_ply_mesh(
            os.path.join(root, "dslr_scan_eval", ply_name), stored, sub_faces
        )
        rows = "\n".join(" ".join(f"{v:.17g}" for v in row) + " " for row in M)
        mlp_entries.append(
            f'  <MLMesh filename="{ply_name}" label="{ply_name}">\n'
            f"   <MLMatrix44>\n{rows}\n</MLMatrix44>\n"
            "  </MLMesh>\n"
        )
    with open(os.path.join(root, "dslr_scan_eval", "scan_alignment.mlp"), "w") as fh:
        fh.write(
            "<!DOCTYPE MeshLabDocument>\n<MeshLabProject>\n <MeshGroup>\n"
            + "".join(mlp_entries)
            + " </MeshGroup>\n</MeshLabProject>\n"
        )


def make_lfe_mini(root: str) -> None:
    """LFE scene layout: flat images/ only (database + match list are made
    by dataset_tools at test time, like download.sh does after fetch)."""
    rng = np.random.default_rng(1787)
    # Layered (multi-depth) scene: a quasi-planar mini scene leaves the
    # 8-point essential estimate degenerate at these narrow baselines.
    scene, images = synthetic.layered_scene(
        rng,
        num_points=80,
        num_cameras=4,
        width=480,
        height=360,
        textures=[_texture(rng, 1), _texture(rng, 2), _texture(rng, 3)],
        exposure_jitter=0.1,
    )
    for c in range(scene.num_cameras):
        _save_jpg(os.path.join(root, "images", f"{c:03d}-view.jpg"), images[c])


def main() -> None:
    eth_root = os.path.join(FIXTURES, "eth3d_mini", "relief_mini")
    lfe_root = os.path.join(FIXTURES, "lfe_mini", "Fountain_mini")
    make_eth3d_mini(eth_root)
    make_lfe_mini(lfe_root)
    total = 0
    for base in (eth_root, lfe_root):
        for dirpath, _, files in os.walk(base):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
    print(f"fixtures written under {FIXTURES} ({total / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
