"""Synthetic scene generation for tests and benchmarks.

Provides the ground-truth playground the reference never had (it has zero
automated tests; SURVEY.md §4): random textured images with planted
keypoints + descriptors, shifted image pairs, and full multi-camera 3D
scenes with known poses for SfM validation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


def textured_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random texture with enough gradient structure for matching."""
    base = rng.random((h // 8 + 2, w // 8 + 2, 3))
    # Bilinear upsample to full size.
    yi = np.linspace(0, base.shape[0] - 1.001, h)
    xi = np.linspace(0, base.shape[1] - 1.001, w)
    y0 = yi.astype(int)
    x0 = xi.astype(int)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    img = (
        base[y0][:, x0] * (1 - fy) * (1 - fx)
        + base[y0][:, x0 + 1] * (1 - fy) * fx
        + base[y0 + 1][:, x0] * fy * (1 - fx)
        + base[y0 + 1][:, x0 + 1] * fy * fx
    )
    noise = rng.random((h, w, 3)) * 0.25
    img = (img * 0.75 + noise) * 255
    return img.astype(np.uint8)


def shifted_pair(
    rng: np.random.Generator, h: int = 240, w: int = 320, shift: Tuple[float, float] = (3.0, -2.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """(image, image shifted by integer (di, dj)) — exact translation pair."""
    di, dj = int(shift[0]), int(shift[1])
    big = textured_image(rng, h + 2 * abs(di) + 8, w + 2 * abs(dj) + 8)
    o = abs(di) + 4, abs(dj) + 4
    img1 = big[o[0] : o[0] + h, o[1] : o[1] + w]
    img2 = big[o[0] + di : o[0] + di + h, o[1] + dj : o[1] + dj + w]
    return img1.copy(), img2.copy()


def planted_features(
    rng: np.random.Generator,
    n: int,
    h: int,
    w: int,
    dim: int = 128,
    margin: float = 24.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random keypoints (x, y) inside margins + unit-norm descriptors."""
    xy = np.stack(
        [
            rng.uniform(margin, w - margin, n),
            rng.uniform(margin, h - margin, n),
        ],
        axis=1,
    )
    desc = rng.standard_normal((n, dim)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return xy, desc


# ---------------------------------------------------------------------------
# Full 3D scenes for SfM tests
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scene:
    points: np.ndarray            # (P, 3) world points
    rotations: np.ndarray         # (C, 3, 3) world->cam
    translations: np.ndarray      # (C, 3)
    K: np.ndarray                 # (3, 3) shared intrinsics
    width: int
    height: int
    observations: List[np.ndarray]  # per camera: (P, 2) pixel coords
    visible: List[np.ndarray]       # per camera: (P,) bool

    @property
    def num_cameras(self) -> int:
        return self.rotations.shape[0]


def _arc_poses(num_cameras: int, look_z: float) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Camera ring poses: (R, center) per camera, all seeing z=look_z.

    Cameras sit on an arc of radius ``look_z`` about the surface center
    with a small vertical offset per camera.  The angular step is 0.1 rad
    for small rigs (matching the original 4-camera layouts) but the TOTAL
    span is capped at 1.2 rad and the vertical run at 1.8 units, so rigs
    of any size keep every camera pointed at the surface (a 100-camera
    rig with a fixed 0.1-rad step would span +-4.95 rad — most cameras
    facing away from the scene entirely)."""
    arc_step = 0.1 if num_cameras <= 13 else 1.2 / (num_cameras - 1)
    y_step = 0.15 if num_cameras <= 13 else 1.8 / (num_cameras - 1)
    poses = []
    for c in range(num_cameras):
        angle = (c - (num_cameras - 1) / 2) * arc_step
        Ry = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ]
        )
        center = np.array(
            [look_z * np.sin(angle), y_step * c, look_z - look_z * np.cos(angle)]
        )
        poses.append((Ry, center))
    return poses


def _exposure_jitter(img: np.ndarray, rng: np.random.Generator, amount: float) -> np.ndarray:
    """Per-view photometric change: gain + gamma (different cameras/exposures)."""
    gain = 1.0 + rng.uniform(-amount, amount)
    gamma = float(np.exp(rng.uniform(-amount, amount)))
    out = np.clip(img.astype(np.float64) * gain, 0, 255)
    out = 255.0 * (out / 255.0) ** gamma
    return np.clip(out, 0, 255)


def planar_scene(
    rng: np.random.Generator,
    num_points: int = 150,
    num_cameras: int = 4,
    width: int = 640,
    height: int = 480,
    plane_z: float = 6.0,
    plane_half: float = 2.6,
    tex_px_per_unit: float = 220.0,
    texture: np.ndarray = None,
    depth_step: float = 0.0,
    exposure_jitter: float = 0.0,
) -> Tuple["Scene", List[np.ndarray]]:
    """A textured plane photographed by an arc of cameras.

    Unlike :func:`random_scene`, the rendered images show the *same*
    surface, so patch-based refinement has real correspondences to align.
    ``texture``: optional (H, W, 3) image (e.g. a real photograph) to map
    onto the plane — tiled/cropped to the needed size; default random
    synthetic texture.  ``depth_step``: when nonzero, the x<0 half of the
    surface sits at plane_z - depth_step and the x>=0 half at
    plane_z + depth_step — a piecewise-planar relief that keeps the
    essential matrix well-conditioned (a single plane is degenerate for
    E-based SfM initialization; COLMAP falls back to homography there).
    ``exposure_jitter``: per-view gain/gamma jitter amplitude (e.g. 0.15)
    emulating exposure changes between photographs.
    Returns (scene, images); scene.points lie on the surface.
    """
    tex_size = int(2 * plane_half * tex_px_per_unit) + 64
    if texture is None:
        texture = textured_image(rng, tex_size, tex_size).astype(np.float32)
    else:
        texture = np.asarray(texture, np.float32)
        reps = (
            -(-tex_size // texture.shape[0]),
            -(-tex_size // texture.shape[1]),
        )
        if max(reps) > 1:
            texture = np.tile(texture, (reps[0], reps[1], 1))
        texture = texture[:tex_size, :tex_size]

    px = rng.uniform(-plane_half * 0.8, plane_half * 0.8, num_points)
    pz = plane_z + np.where(px < 0, -depth_step, depth_step)
    points = np.stack(
        [
            px,
            rng.uniform(-plane_half * 0.8, plane_half * 0.8, num_points),
            pz,
        ],
        axis=1,
    )

    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)

    def tex_coords(xy_world):
        """Plane (x, y) -> texture (row, col)."""
        u = (xy_world[..., 0] + plane_half) * tex_px_per_unit + 32
        v = (xy_world[..., 1] + plane_half) * tex_px_per_unit + 32
        return v, u  # row = y, col = x

    def bilinear(tex, r, c):
        r = np.clip(r, 0, tex.shape[0] - 2)
        c = np.clip(c, 0, tex.shape[1] - 2)
        r0 = np.floor(r).astype(int)
        c0 = np.floor(c).astype(int)
        fr = (r - r0)[..., None]
        fc = (c - c0)[..., None]
        return (
            tex[r0, c0] * (1 - fr) * (1 - fc)
            + tex[r0, c0 + 1] * (1 - fr) * fc
            + tex[r0 + 1, c0] * fr * (1 - fc)
            + tex[r0 + 1, c0 + 1] * fr * fc
        )

    rotations, translations, observations, visible, images = [], [], [], [], []
    for c, (R, center) in enumerate(_arc_poses(num_cameras, plane_z)):
        t = -R @ center

        cam_pts = points @ R.T + t
        uv = (cam_pts / cam_pts[:, 2:]) @ K.T
        uv = uv[:, :2]
        vis = (
            (uv[:, 0] > 20) & (uv[:, 0] < width - 20) & (uv[:, 1] > 20) & (uv[:, 1] < height - 20)
        )

        # Render by inverse warping: pixel ray -> surface -> texture.
        jj, ii = np.meshgrid(np.arange(width), np.arange(height))
        rays = np.stack([jj, ii, np.ones_like(jj)], axis=-1).astype(np.float64) @ Kinv.T
        # World ray direction and origin.
        d = rays @ R  # R^T @ ray per pixel
        o = center
        if depth_step == 0.0:
            lam = (plane_z - o[2]) / d[..., 2]
            world = o[None, None] + lam[..., None] * d
        else:
            # Intersect both levels; keep the hit whose x sign matches its
            # level (pixels straddling the step pick the nearer surface).
            lam_a = (plane_z - depth_step - o[2]) / d[..., 2]
            lam_b = (plane_z + depth_step - o[2]) / d[..., 2]
            wa = o[None, None] + lam_a[..., None] * d
            wb = o[None, None] + lam_b[..., None] * d
            on_a = wa[..., 0] < 0
            on_b = wb[..., 0] >= 0
            # Default to whichever is geometrically consistent; where both
            # or neither are, take the nearer intersection.
            use_a = on_a & ~on_b
            both = on_a & on_b
            use_a = use_a | (both & (lam_a < lam_b))
            world = np.where(use_a[..., None], wa, wb)
        r_t, c_t = tex_coords(world[..., :2])
        img = bilinear(texture, r_t, c_t)
        img = np.clip(img, 0, 255)
        if exposure_jitter:
            img = _exposure_jitter(img, rng, exposure_jitter)
        images.append(img.astype(np.uint8))

        rotations.append(R)
        translations.append(t)
        observations.append(uv)
        visible.append(vis)

    scene = Scene(
        points=points,
        rotations=np.stack(rotations),
        translations=np.stack(translations),
        K=K,
        width=width,
        height=height,
        observations=observations,
        visible=visible,
    )
    return scene, images


def make_eth3d_dataset(
    root: str,
    scene: "Scene",
    rng: np.random.Generator,
    method: str = "sift",
    keypoint_noise_px: float = 0.0,
    descriptor_dim: int = 128,
    rendered_images: "List[np.ndarray]" = None,
    scan_mesh: "Tuple[np.ndarray, np.ndarray]" = None,
) -> str:
    """Materialize an ETH3D-layout dataset from a synthetic scene.

    Layout (reference: eth/benchmark.py:81-91, triangulation_pipeline.py):
      images/ + per-image ``<name>.<method>`` npz features,
      database.db (cameras + images only),
      dslr_calibration_undistorted/ (ground-truth model, no points),
      dslr_scan_eval/scan_alignment.mlp (+ scan ply),
      match-list.txt (exhaustive).

    Feature index == scene point index in every image; descriptors are
    per-point unit vectors plus per-image noise so MNN matching recovers
    ground-truth correspondences.
    """
    import os

    from ..io import colmap_db, colmap_model, features, match_list

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "dslr_scan_eval"), exist_ok=True)

    point_desc = rng.standard_normal((scene.points.shape[0], descriptor_dim)).astype(np.float32)
    point_desc /= np.linalg.norm(point_desc, axis=1, keepdims=True)

    db = colmap_db.ColmapDatabase.create(os.path.join(root, "database.db"))
    cam_id = db.add_camera(
        1, scene.width, scene.height,
        np.array([scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]]),
    )
    gt = colmap_model.Model()
    gt.cameras[cam_id] = colmap_model.Camera(
        cam_id, "PINHOLE", scene.width, scene.height,
        np.array([scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]]),
    )

    names = []
    for c in range(scene.num_cameras):
        name = f"im{c:04d}.png"
        names.append(name)
        img = (
            rendered_images[c]
            if rendered_images is not None
            else textured_image(rng, scene.height, scene.width)
        )
        try:
            import cv2

            cv2.imwrite(os.path.join(root, "images", name), img[:, :, ::-1])
        except ImportError:
            from PIL import Image as PILImage

            PILImage.fromarray(img).save(os.path.join(root, "images", name))
        iid = db.add_image(name, cam_id)
        gt.images[iid] = colmap_model.Image(
            iid,
            colmap_model.rotmat_to_qvec(scene.rotations[c]),
            scene.translations[c],
            cam_id,
            name,
        )
        obs = scene.observations[c].copy()
        if keypoint_noise_px:
            obs += rng.normal(0, keypoint_noise_px, obs.shape)
        # npz features use the -0.5 convention relative to COLMAP pixel
        # centers (reference: utils/extract_features_sift.py:93); the import
        # stage adds the 0.5 back.
        kp = np.hstack(
            [obs - 0.5, np.ones((obs.shape[0], 1)), np.zeros((obs.shape[0], 1))]
        )
        desc = point_desc + 0.05 * rng.standard_normal(point_desc.shape).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        # Hide invisible points' descriptors so they can't match.
        invis = ~scene.visible[c]
        desc[invis] = rng.standard_normal((int(invis.sum()), descriptor_dim))
        desc[invis] /= np.linalg.norm(desc[invis], axis=1, keepdims=True)
        features.save_features(
            os.path.join(root, "images", name), kp, desc, method_name=method
        )
    db.commit()
    db.close()

    colmap_model.write_model(os.path.join(root, "dslr_calibration_undistorted"), gt)
    match_list.write_match_list(
        os.path.join(root, "match-list.txt"), match_list.exhaustive_pairs(names)
    )

    # Ground-truth "scan": a triangulated surface mesh when the scene has
    # one (enables point-to-SURFACE evaluation), else the points.
    if scan_mesh is not None:
        colmap_model.write_ply_mesh(
            os.path.join(root, "dslr_scan_eval", "scan.ply"),
            scan_mesh[0],
            scan_mesh[1],
        )
        with open(os.path.join(root, "dslr_scan_eval", "scan_alignment.mlp"), "w") as fh:
            fh.write(
                '<!DOCTYPE MeshLabDocument>\n<MeshLabProject>\n <MeshGroup>\n'
                '  <MLMesh filename="scan.ply" label="scan">\n'
                "   <MLMatrix44>\n1 0 0 0 \n0 1 0 0 \n0 0 1 0 \n0 0 0 1 \n</MLMatrix44>\n"
                "  </MLMesh>\n </MeshGroup>\n</MeshLabProject>\n"
            )
        return root
    # Ground-truth "scan": the scene points themselves.
    scan_pts = {
        i + 1: colmap_model.Point3D(
            i + 1, scene.points[i], np.full(3, 200, np.uint8), 0.0,
            np.zeros(0, np.int64), np.zeros(0, np.int64),
        )
        for i in range(scene.points.shape[0])
    }
    colmap_model.write_ply(os.path.join(root, "dslr_scan_eval", "scan.ply"), scan_pts)
    with open(os.path.join(root, "dslr_scan_eval", "scan_alignment.mlp"), "w") as fh:
        fh.write(
            '<!DOCTYPE MeshLabDocument>\n<MeshLabProject>\n <MeshGroup>\n'
            '  <MLMesh filename="scan.ply" label="scan">\n'
            "   <MLMatrix44>\n1 0 0 0 \n0 1 0 0 \n0 0 1 0 \n0 0 0 1 \n</MLMatrix44>\n"
            "  </MLMesh>\n </MeshGroup>\n</MeshLabProject>\n"
        )
    return root


def random_scene(
    rng: np.random.Generator,
    num_points: int = 200,
    num_cameras: int = 4,
    width: int = 640,
    height: int = 480,
    noise_px: float = 0.0,
    arc_step: float = 0.15,
) -> Scene:
    """Cameras on an arc looking at a point cloud near the origin.

    ``arc_step``: angular spacing (rad) between cameras — shrink it for
    many-camera rigs so the far ends of the arc still see the cloud.
    """
    points = rng.uniform(-1.0, 1.0, (num_points, 3))
    points[:, 2] += 6.0

    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])

    rotations, translations, observations, visible = [], [], [], []
    for c in range(num_cameras):
        angle = (c - (num_cameras - 1) / 2) * arc_step
        Ry = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ]
        )
        center = np.array([2.5 * np.sin(angle), 0.2 * c * (arc_step / 0.15), 6.0 - 6.0 * np.cos(angle)])
        R = Ry
        t = -R @ center
        cam_pts = points @ R.T + t
        uv = (cam_pts / cam_pts[:, 2:]) @ K.T
        uv = uv[:, :2]
        if noise_px > 0:
            uv = uv + rng.normal(0, noise_px, uv.shape)
        vis = (
            (cam_pts[:, 2] > 0.2)
            & (uv[:, 0] > 2)
            & (uv[:, 0] < width - 2)
            & (uv[:, 1] > 2)
            & (uv[:, 1] < height - 2)
        )
        rotations.append(R)
        translations.append(t)
        observations.append(uv)
        visible.append(vis)

    return Scene(
        points=points,
        rotations=np.stack(rotations),
        translations=np.stack(translations),
        K=K,
        width=width,
        height=height,
        observations=observations,
        visible=visible,
    )

#: Default foreground slabs for :func:`layered_scene`: (z, x0, x1, y0, y1).
DEFAULT_SLABS: Tuple[Tuple[float, float, float, float, float], ...] = (
    (5.2, -1.9, -0.3, -1.4, 1.0),
    (6.0, 0.4, 2.0, -0.8, 1.6),
)


def layered_scene(
    rng: np.random.Generator,
    num_points: int = 160,
    num_cameras: int = 6,
    width: int = 640,
    height: int = 480,
    bg_z: float = 7.0,
    bg_half: float = 3.2,
    slabs: Tuple[Tuple[float, float, float, float, float], ...] = DEFAULT_SLABS,
    textures: List[np.ndarray] = None,
    tex_px_per_unit: float = 200.0,
    exposure_jitter: float = 0.0,
    fg_point_frac: float = 0.5,
) -> Tuple["Scene", List[np.ndarray]]:
    """Occlusion-bearing multi-surface scene: textured slabs floating in
    front of a textured background plane.

    Unlike :func:`planar_scene`, patches near slab edges straddle DEPTH
    DISCONTINUITIES — the two views of such a patch see different geometry
    (foreground on one side, differently-moving background on the other),
    the hard case for patch-alignment refinement on real data (the
    reference CNN faces these constantly on ETH3D; its patches are plain
    33x33 crops, two-view-refinement/refinement.py:23-43).  Per-camera
    visibility accounts for slab occlusion of background points, and
    ``exposure_jitter`` applies per-view gain/gamma.

    ``slabs``: (z, x0, x1, y0, y1) rectangles parallel to the background
    plane, z < bg_z.  ``textures``: [background, slab0, slab1, ...]; random
    textures fill in for missing entries.  Half of each slab's points are
    planted within 0.15 units (~14 px) of the slab boundary so refinement
    is exercised exactly at occlusion edges.
    Returns (scene, images); scene.points lie on the surfaces.
    """
    slabs = sorted(slabs, key=lambda s: s[0])  # nearest first
    n_surf = 1 + len(slabs)
    textures = list(textures) if textures else []

    def prep_texture(idx: int, size_px: int) -> np.ndarray:
        if idx < len(textures) and textures[idx] is not None:
            tex = np.asarray(textures[idx], np.float32)
            reps = (-(-size_px // tex.shape[0]), -(-size_px // tex.shape[1]))
            if max(reps) > 1:
                tex = np.tile(tex, (reps[0], reps[1], 1))
            return tex[:size_px, :size_px]
        return textured_image(rng, size_px, size_px).astype(np.float32)

    # Render extent is twice the point-planting extent so no pixel ray
    # falls off the textured background (off-plane rays would clamp to
    # the texture border and render as streaks).
    bg_render_half = 2.0 * bg_half
    bg_size = int(2 * bg_render_half * tex_px_per_unit) + 64
    bg_tex = prep_texture(0, bg_size)
    slab_texs = []
    for i, (z, x0, x1, y0, y1) in enumerate(slabs):
        size = int(max(x1 - x0, y1 - y0) * tex_px_per_unit) + 64
        slab_texs.append(prep_texture(1 + i, size))

    # --- plant points: background + per-slab (half near the boundary) ---
    n_fg = int(num_points * fg_point_frac)
    n_bg = num_points - n_fg
    pts = [
        np.stack(
            [
                rng.uniform(-bg_half * 0.85, bg_half * 0.85, n_bg),
                rng.uniform(-bg_half * 0.85, bg_half * 0.85, n_bg),
                np.full(n_bg, bg_z),
            ],
            axis=1,
        )
    ]
    per_slab = [n_fg // len(slabs)] * len(slabs)
    per_slab[0] += n_fg - sum(per_slab)
    edge_band = 0.15
    for (z, x0, x1, y0, y1), n in zip(slabs, per_slab):
        n_edge = n // 2
        n_in = n - n_edge
        pts.append(
            np.stack(
                [
                    rng.uniform(x0 + edge_band, x1 - edge_band, n_in),
                    rng.uniform(y0 + edge_band, y1 - edge_band, n_in),
                    np.full(n_in, z),
                ],
                axis=1,
            )
        )
        # Edge-band points: uniform along the perimeter, just inside.
        side = rng.integers(0, 4, n_edge)
        u = rng.uniform(0, 1, n_edge)
        off = rng.uniform(0.02, edge_band, n_edge)
        ex = np.where(
            side == 0, x0 + off, np.where(side == 1, x1 - off, x0 + u * (x1 - x0))
        )
        ey = np.where(
            side <= 1, y0 + u * (y1 - y0), np.where(side == 2, y0 + off, y1 - off)
        )
        pts.append(np.stack([ex, ey, np.full(n_edge, z)], axis=1))
    points = np.concatenate(pts, axis=0)

    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    Kinv = np.linalg.inv(K)

    def bilinear(tex, r, c):
        r = np.clip(r, 0, tex.shape[0] - 2)
        c = np.clip(c, 0, tex.shape[1] - 2)
        r0 = np.floor(r).astype(int)
        c0 = np.floor(c).astype(int)
        fr = (r - r0)[..., None]
        fc = (c - c0)[..., None]
        return (
            tex[r0, c0] * (1 - fr) * (1 - fc)
            + tex[r0, c0 + 1] * (1 - fr) * fc
            + tex[r0 + 1, c0] * fr * (1 - fc)
            + tex[r0 + 1, c0 + 1] * fr * fc
        )

    look_z = 0.5 * (slabs[0][0] + bg_z)
    rotations, translations, observations, visible, images = [], [], [], [], []
    for R, center in _arc_poses(num_cameras, look_z):
        t = -R @ center

        cam_pts = points @ R.T + t
        uv = (cam_pts / cam_pts[:, 2:]) @ K.T
        uv = uv[:, :2]
        vis = (
            (cam_pts[:, 2] > 0.2)
            & (uv[:, 0] > 20)
            & (uv[:, 0] < width - 20)
            & (uv[:, 1] > 20)
            & (uv[:, 1] < height - 20)
        )
        # Occlusion: a point is hidden if the camera->point segment crosses
        # a strictly nearer slab inside its rectangle.
        for z, x0, x1, y0, y1 in slabs:
            nearer = points[:, 2] > z + 1e-6
            denom = points[:, 2] - center[2]
            s = np.where(np.abs(denom) > 1e-12, (z - center[2]) / denom, -1.0)
            hit = center[None, :2] + s[:, None] * (points[:, :2] - center[None, :2])
            blocked = (
                nearer
                & (s > 0)
                & (s < 1)
                & (hit[:, 0] > x0)
                & (hit[:, 0] < x1)
                & (hit[:, 1] > y0)
                & (hit[:, 1] < y1)
            )
            vis &= ~blocked

        # --- render: nearest surface per pixel ray ---
        jj, ii = np.meshgrid(np.arange(width), np.arange(height))
        rays = np.stack([jj, ii, np.ones_like(jj)], axis=-1).astype(np.float64) @ Kinv.T
        d = rays @ R  # world-frame ray directions
        o = center
        dz = np.where(np.abs(d[..., 2]) > 1e-12, d[..., 2], 1e-12)
        lam_bg = (bg_z - o[2]) / dz
        world_bg = o[None, None] + lam_bg[..., None] * d
        r_t = (world_bg[..., 1] + bg_render_half) * tex_px_per_unit + 32
        c_t = (world_bg[..., 0] + bg_render_half) * tex_px_per_unit + 32
        img = bilinear(bg_tex, r_t, c_t)
        # Paint slabs far-to-near so the nearest valid hit wins.
        for (z, x0, x1, y0, y1), tex in zip(slabs[::-1], slab_texs[::-1]):
            lam = (z - o[2]) / dz
            w = o[None, None] + lam[..., None] * d
            on = (
                (lam > 0)
                & (w[..., 0] > x0)
                & (w[..., 0] < x1)
                & (w[..., 1] > y0)
                & (w[..., 1] < y1)
            )
            r_s = (w[..., 1] - y0) * tex_px_per_unit + 32
            c_s = (w[..., 0] - x0) * tex_px_per_unit + 32
            img = np.where(on[..., None], bilinear(tex, r_s, c_s), img)
        img = np.clip(img, 0, 255)
        if exposure_jitter:
            img = _exposure_jitter(img, rng, exposure_jitter)
        images.append(img.astype(np.uint8))

        rotations.append(R)
        translations.append(t)
        observations.append(uv)
        visible.append(vis)

    scene = Scene(
        points=points,
        rotations=np.stack(rotations),
        translations=np.stack(translations),
        K=K,
        width=width,
        height=height,
        observations=observations,
        visible=visible,
    )
    return scene, images


def layered_surface_mesh(
    bg_z: float = 7.0,
    bg_half: float = 3.2,
    slabs: Tuple[Tuple[float, float, float, float, float], ...] = DEFAULT_SLABS,
):
    """Triangulated ground-truth mesh of :func:`layered_scene`'s surfaces.

    The background quad spans the RENDER extent (2x ``bg_half``, matching
    :func:`layered_scene`) so every visible background pixel lies on it."""
    h = 2.0 * bg_half
    verts = [
        [-h, -h, bg_z], [h, -h, bg_z], [h, h, bg_z], [-h, h, bg_z],
    ]
    faces = [[0, 1, 2], [0, 2, 3]]
    for z, x0, x1, y0, y1 in slabs:
        b = len(verts)
        verts += [[x0, y0, z], [x1, y0, z], [x1, y1, z], [x0, y1, z]]
        faces += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def planar_surface_mesh(
    plane_z: float = 6.0, plane_half: float = 2.6, depth_step: float = 0.0
):
    """Triangulated ground-truth mesh of :func:`planar_scene`'s surface."""
    h = plane_half
    if depth_step == 0.0:
        verts = np.array(
            [[-h, -h, plane_z], [h, -h, plane_z], [h, h, plane_z], [-h, h, plane_z]]
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        return verts, faces
    za, zb = plane_z - depth_step, plane_z + depth_step
    verts = np.array(
        [
            [-h, -h, za], [0, -h, za], [0, h, za], [-h, h, za],
            [0, -h, zb], [h, -h, zb], [h, h, zb], [0, h, zb],
        ]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
    return verts, faces
