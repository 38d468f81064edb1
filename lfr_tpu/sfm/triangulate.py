"""Fixed-pose multi-view triangulation (the ``point_triangulator`` path).

Replaces the reference's ``colmap point_triangulator`` subprocess with pose
and intrinsics fixed and BA refining points only
(reference: colmap_utils.py:297-319).  Feature tracks are formed from the
database's verified matches by union-find; all tracks triangulate as ONE
batched DLT + batched point-only Gauss-Newton program on device, padded to
observation-count buckets.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io import colmap_db as db_mod
from ..io import colmap_model as model_mod
from . import cameras as cam_mod
from . import geometry

#: COLMAP point_triangulator-style defaults.
MAX_REPROJ_ERROR_PX = 4.0
MIN_TRI_ANGLE_DEG = 1.5
MIN_TRACK_LENGTH = 2
GN_ITERATIONS = 10

#: Observation-count padding buckets.
OBS_BUCKETS = (4, 8, 16, 32, 64, 128, 256)


# ---------------------------------------------------------------------------
# Track building from verified matches
# ---------------------------------------------------------------------------


def build_feature_tracks(
    num_features: Dict[int, int],
    pair_matches: List[Tuple[int, int, np.ndarray]],
) -> List[np.ndarray]:
    """Union-find over per-pair inlier matches -> feature tracks.

    Args:
      num_features: image_id -> keypoint count.
      pair_matches: (image_id1, image_id2, matches (K, 2)) triples.

    Returns a list of (track_len, 2) arrays of (image_id, feature_idx),
    keeping only tracks with at most one feature per image (conflicting
    merges are rejected, as in the solver's MSF).
    """
    image_ids = sorted(num_features)
    offsets = {}
    total = 0
    for iid in image_ids:
        offsets[iid] = total
        total += num_features[iid]

    parent = np.arange(total, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    # Image sets per root for the disjointness test.
    img_sets: Dict[int, set] = {}

    def images_of(root, node_img):
        s = img_sets.get(root)
        if s is None:
            s = {node_img}
        return s

    node_image = np.empty(total, dtype=np.int64)
    for iid in image_ids:
        node_image[offsets[iid] : offsets[iid] + num_features[iid]] = iid

    for id1, id2, matches in pair_matches:
        o1, o2 = offsets[id1], offsets[id2]
        for f1, f2 in matches:
            a = find(o1 + int(f1))
            b = find(o2 + int(f2))
            if a == b:
                continue
            sa = img_sets.get(a, {int(node_image[a])})
            sb = img_sets.get(b, {int(node_image[b])})
            if sa & sb:
                continue
            if len(sa) < len(sb):
                a, b, sa, sb = b, a, sb, sa
            parent[b] = a
            sa |= sb
            img_sets[a] = sa
            img_sets.pop(b, None)

    # Collect members per root.
    roots = np.array([find(i) for i in range(total)])
    order = np.argsort(roots, kind="stable")
    roots_sorted = roots[order]
    boundaries = np.nonzero(np.diff(roots_sorted))[0] + 1
    groups = np.split(order, boundaries)

    tracks = []
    rev_offsets = {offsets[iid]: iid for iid in image_ids}
    image_starts = np.array([offsets[iid] for iid in image_ids])
    for g in groups:
        if g.shape[0] < MIN_TRACK_LENGTH:
            continue
        img_idx = np.searchsorted(image_starts, g, side="right") - 1
        iids = np.array([image_ids[k] for k in img_idx])
        feats = g - image_starts[img_idx]
        tracks.append(np.stack([iids, feats], axis=1))
    return tracks


# ---------------------------------------------------------------------------
# Batched triangulation + point-only refinement
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iterations",))
def _triangulate_and_refine(P, uv, mask, centers, iterations: int = GN_ITERATIONS):
    """Batched DLT + point-only Gauss-Newton.

    P: (T, V, 3, 4); uv: (T, V, 2); mask: (T, V); centers: (T, V, 3).
    Returns (points (T, 3), reproj_sq (T, V), max_angle (T,)).
    """

    points = geometry.triangulate_dlt_batch(P, uv, mask)

    def reproj(X, P_v):
        h = jnp.concatenate([X, jnp.ones(1, X.dtype)])
        p = P_v @ h
        return p[:2] / jnp.where(jnp.abs(p[2]) < 1e-12, 1e-12, p[2]), p[2]

    def refine_step(X, _, P_t, uv_t, mask_t):
        def residual(Xp):
            proj, _ = jax.vmap(reproj, in_axes=(None, 0))(Xp, P_t)
            return ((proj - uv_t) * mask_t[:, None]).reshape(-1)

        r = residual(X)
        J = jax.jacfwd(residual)(X)  # (2V, 3)
        H = J.T @ J + 1e-6 * jnp.eye(3)
        g = J.T @ r
        dX = jnp.linalg.solve(H, g)
        X_new = X - dX
        better = jnp.sum(residual(X_new) ** 2) < jnp.sum(r**2)
        return jnp.where(better, X_new, X), None

    def refine_one(X, P_t, uv_t, mask_t):
        X, _ = jax.lax.scan(
            functools.partial(refine_step, P_t=P_t, uv_t=uv_t, mask_t=mask_t),
            X,
            None,
            length=iterations,
        )
        return X

    points = jax.vmap(refine_one)(points, P, uv, mask.astype(uv.dtype))

    # Per-observation squared reprojection error + depths.
    def errors_one(X, P_t, uv_t):
        proj, depth = jax.vmap(reproj, in_axes=(None, 0))(X, P_t)
        return jnp.sum((proj - uv_t) ** 2, axis=-1), depth

    reproj_sq, depths = jax.vmap(errors_one)(points, P, uv)

    # Max pairwise triangulation angle across valid observation pairs.
    def angles_one(X, c, m):
        d = X[None, :] - c  # (V, 3)
        norm = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-12)
        dn = d / norm[:, None]
        cosang = dn @ dn.T
        ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        pair_ok = m[:, None] & m[None, :]
        return jnp.max(jnp.where(pair_ok, ang, 0.0))

    max_angle = jax.vmap(angles_one)(points, centers, mask)
    # One (T, 4 + 2V) row block = one host transfer per bucket
    # (layout: [X (3), max_angle, reproj_sq (V), depths (V)]).
    return jnp.concatenate(
        [points, max_angle[:, None], reproj_sq, depths], axis=1
    )


@dataclasses.dataclass
class TriangulationResult:
    model: model_mod.Model
    stats: dict


def triangulate_model(
    database: db_mod.ColmapDatabase,
    empty_model: model_mod.Model,
    min_track_length: int = MIN_TRACK_LENGTH,
    max_reproj_error: float = MAX_REPROJ_ERROR_PX,
    min_tri_angle_deg: float = MIN_TRI_ANGLE_DEG,
    verbose: bool = False,
) -> TriangulationResult:
    """Triangulate all feature tracks against fixed poses."""
    images = {im.image_id: im for im in empty_model.images.values()}
    cams = empty_model.cameras

    # Per-image keypoints and projection data.
    kps: Dict[int, np.ndarray] = {}
    norm_uv: Dict[int, np.ndarray] = {}
    Ps: Dict[int, np.ndarray] = {}
    centers: Dict[int, np.ndarray] = {}
    for iid, im in images.items():
        kp = database.keypoints(iid)
        kps[iid] = kp
        cam = cams[im.camera_id]
        R = model_mod.qvec_to_rotmat(im.qvec)
        t = im.tvec
        # Work in undistorted normalized coordinates: P = [R | t], uv = K^-1 x
        # undistorted -> unified across camera models.
        if kp.shape[0]:
            norm_uv[iid] = cam_mod.pixel_to_normalized(cam, kp[:, :2].astype(np.float64))
        else:
            norm_uv[iid] = np.zeros((0, 2))
        Ps[iid] = np.concatenate([R, t[:, None]], axis=1)
        centers[iid] = -R.T @ t

    pair_matches = [
        (id1, id2, m) for id1, id2, m, _ in database.all_two_view_geometries() if m.shape[0]
    ]
    num_features = {iid: kps[iid].shape[0] for iid in images}
    tracks = build_feature_tracks(num_features, pair_matches)
    if verbose:
        print(f"[triangulate] {len(tracks)} candidate tracks")

    # Bucket tracks by observation count.
    focal = {iid: cam_mod.calibration_matrix(cams[images[iid].camera_id])[0, 0] for iid in images}
    points3D: Dict[int, model_mod.Point3D] = {}
    per_image_obs: Dict[int, List[Tuple[int, int]]] = {iid: [] for iid in images}
    next_pid = 1
    sum_err = 0.0
    n_obs_total = 0

    by_bucket: Dict[int, List[np.ndarray]] = {}
    for tr in tracks:
        v = tr.shape[0]
        bucket = next((b for b in OBS_BUCKETS if v <= b), None)
        if bucket is None:
            tr = tr[: OBS_BUCKETS[-1]]
            bucket = OBS_BUCKETS[-1]
        by_bucket.setdefault(bucket, []).append(tr)

    min_angle_rad = np.deg2rad(min_tri_angle_deg)

    #: Chunk huge buckets so the padded batch stays HBM-friendly.
    MAX_CHUNK = 4096

    for bucket, trs_all in sorted(by_bucket.items()):
        chunks = [trs_all[s : s + MAX_CHUNK] for s in range(0, len(trs_all), MAX_CHUNK)]
        for trs in chunks:
            # Pad the track count to a power-of-2 bucket (min 256) so
            # compiled programs are reused across runs/datasets — T varies
            # per scene and an unpadded leading dim recompiled the whole GN
            # program each run.
            T = len(trs)
            Tp = 1 << max(8, int(T - 1).bit_length())
            P = np.zeros((Tp, bucket, 3, 4), np.float64)
            uv = np.zeros((Tp, bucket, 2), np.float64)
            mask = np.zeros((Tp, bucket), bool)
            ctr = np.zeros((Tp, bucket, 3), np.float64)
            for k, tr in enumerate(trs):
                for v, (iid, fidx) in enumerate(tr):
                    P[k, v] = Ps[iid]
                    uv[k, v] = norm_uv[iid][fidx]
                    ctr[k, v] = centers[iid]
                    mask[k, v] = True
            # Padded rows get identity cameras; their outputs are ignored.
            P[T:, :, :, :3] = np.eye(3)
            mask[T:, 0] = True

            packed = np.asarray(
                _triangulate_and_refine(
                    jnp.asarray(P), jnp.asarray(uv), jnp.asarray(mask), jnp.asarray(ctr)
                )
            )[:T]
            pts = packed[:, :3]
            max_angle = packed[:, 3]
            reproj_sq = packed[:, 4 : 4 + bucket]
            depths = packed[:, 4 + bucket :]

            for k, tr in enumerate(trs):
                if not np.isfinite(pts[k]).all():
                    continue
                if max_angle[k] < min_angle_rad:
                    continue
                # Per-observation gating: positive depth + pixel reproj error.
                keep = []
                errs = []
                for v, (iid, fidx) in enumerate(tr):
                    err_px = np.sqrt(reproj_sq[k, v]) * focal[iid]
                    if depths[k, v] > 0 and err_px <= max_reproj_error:
                        keep.append((iid, fidx))
                        errs.append(err_px)
                if len(keep) < min_track_length:
                    continue
                pid = next_pid
                next_pid += 1
                image_ids = np.array([iid for iid, _ in keep])
                point2D_idxs = np.array([fi for _, fi in keep])
                err = float(np.mean(errs))
                points3D[pid] = model_mod.Point3D(
                    pid, pts[k].astype(np.float64), np.full(3, 128, np.uint8), err,
                    image_ids, point2D_idxs,
                )
                for iid, fi in keep:
                    per_image_obs[iid].append((int(fi), pid))
                sum_err += err * len(keep)
                n_obs_total += len(keep)

    # Assemble the output model: per-image point lists reference keypoints.
    out = model_mod.Model(cameras=dict(cams), images={}, points3D=points3D)
    for iid, im in images.items():
        kp = kps[iid]
        xys = kp[:, :2].astype(np.float64) if kp.shape[0] else np.zeros((0, 2))
        pids = np.full(xys.shape[0], -1, dtype=np.int64)
        for fi, pid in per_image_obs[iid]:
            pids[fi] = pid
        out.images[iid] = model_mod.Image(
            iid, im.qvec, im.tvec, im.camera_id, im.name, xys, pids
        )

    stats = analyze_model(out)
    return TriangulationResult(out, stats)


def analyze_model(model: model_mod.Model) -> dict:
    """COLMAP model_analyzer-equivalent statistics
    (reference: colmap_utils.py:266-294)."""
    n_points = len(model.points3D)
    n_obs = sum(len(p.image_ids) for p in model.points3D.values())
    reg_images = sum(
        1 for im in model.images.values() if (im.point3D_ids >= 0).any()
    )
    mean_track = n_obs / n_points if n_points else 0.0
    obs_per_image = n_obs / reg_images if reg_images else 0.0
    mean_err = (
        sum(p.error * len(p.image_ids) for p in model.points3D.values()) / n_obs
        if n_obs
        else 0.0
    )
    return dict(
        num_reg_images=reg_images,
        num_sparse_points=n_points,
        num_observations=n_obs,
        mean_track_length=round(mean_track, 6),
        num_observations_per_image=round(obs_per_image, 6),
        mean_reproj_error=round(mean_err, 6),
    )
