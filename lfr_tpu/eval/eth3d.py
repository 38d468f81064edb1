"""ETH3D-style multi-view evaluation: accuracy / completeness vs a scan.

In-framework replacement for the external ``ETH3DMultiViewEvaluation``
binary (reference: eth/benchmark.py:134-149): given a reconstructed sparse
point cloud and ground-truth scan points, computes, per tolerance t,

  accuracy(t)     = fraction of reconstruction points within t of the scan,
  completeness(t) = fraction of scan points within t of the reconstruction,
  F1(t)           = harmonic mean.

Scan geometry loads from a MeshLab ``.mlp`` project (PLY refs + per-mesh
4x4 alignment transforms) or directly from PLY files.  When the scan PLY
carries triangles, the scan SURFACE is densely point-sampled
(area-weighted, spacing << smallest tolerance) so accuracy measures
distance-to-surface like the official evaluator
(reference: eth/benchmark.py:138-149), not distance to the nearest scan
vertex; vertex-only scans fall back to vertex distances and the results
carry an ``evaluation_mode`` marker documenting the deviation.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Sequence

import numpy as np
from scipy.spatial import cKDTree

from ..config import ETH3D_TOLERANCES
from ..io.colmap_model import read_ply_mesh, read_ply_xyz

#: Surface sample spacing (m): 2.5 mm << the 1 cm smallest tolerance.
SURFACE_SPACING = 0.0025

#: Upper bound on generated surface samples (memory guard).
MAX_SURFACE_SAMPLES = 30_000_000


def sample_mesh_surface(
    xyz: np.ndarray,
    faces: np.ndarray,
    spacing: float = SURFACE_SPACING,
    rng: np.random.Generator = None,
    max_samples: int = MAX_SURFACE_SAMPLES,
) -> np.ndarray:
    """Area-weighted uniform point samples over a triangle mesh.

    Every triangle gets ceil(area / spacing^2) samples (at least its
    vertices remain represented through the sampling), so the returned
    cloud approximates the continuous surface to well below ``spacing``.
    """
    rng = rng or np.random.default_rng(0)
    a = xyz[faces[:, 0]]
    b = xyz[faces[:, 1]]
    c = xyz[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    per_tri = np.ceil(areas / (spacing * spacing)).astype(np.int64)
    per_tri = np.maximum(per_tri, 1)
    total = int(per_tri.sum())
    if total > max_samples:
        per_tri = np.maximum((per_tri * (max_samples / total)).astype(np.int64), 1)
        total = int(per_tri.sum())
    tri_idx = np.repeat(np.arange(faces.shape[0]), per_tri)
    u = rng.random(total)
    v = rng.random(total)
    flip = u + v > 1.0
    u[flip] = 1.0 - u[flip]
    v[flip] = 1.0 - v[flip]
    return (
        a[tri_idx]
        + u[:, None] * (b[tri_idx] - a[tri_idx])
        + v[:, None] * (c[tri_idx] - a[tri_idx])
    )


def load_mlp_scan(mlp_path: str, surface_spacing: float = SURFACE_SPACING):
    """Load + transform all meshes of a MeshLab project.

    Returns (points, mode): surface samples when any mesh has triangles
    (mode "surface"), otherwise raw vertices (mode "vertex").
    """
    tree = ET.parse(mlp_path)
    base = os.path.dirname(mlp_path)
    points = []
    any_faces = False
    for mesh in tree.iter("MLMesh"):
        filename = mesh.get("filename")
        matrix = np.eye(4)
        for mat in mesh.iter("MLMatrix44"):
            vals = [float(v) for v in mat.text.split()]
            matrix = np.array(vals).reshape(4, 4)
        xyz, faces = read_ply_mesh(os.path.join(base, filename))
        if faces is not None and surface_spacing:
            xyz = sample_mesh_surface(xyz, faces, surface_spacing)
            any_faces = True
        xyz_h = np.hstack([xyz, np.ones((xyz.shape[0], 1))])
        points.append((xyz_h @ matrix.T)[:, :3])
    if not points:
        raise ValueError(f"no meshes found in {mlp_path}")
    return np.concatenate(points), ("surface" if any_faces else "vertex")


#: Below this many query*corpus pairs a host KD-tree wins (build cost is
#: negligible and it is exact); above it the device brute-force path is
#: 10-50x faster than building/querying a tree over tens of millions of
#: surface samples.
_BRUTE_FORCE_MIN_PAIRS = int(1e8)

#: Shared block size for device NN work: the SAME padded device array then
#: serves as query blocks in one direction and corpus blocks in the other,
#: so a multi-million-sample scan is uploaded through the TPU tunnel once
#: per process instead of twice per evaluation.
_DEV_CHUNK = 4096

#: id(host array) -> (host array ref, true length, device blocks).  The
#: host reference pins the id; eviction is size-aware (see
#: _CACHE_BUDGET_BYTES) and frees evicted device blocks explicitly.
_device_blocks_cache: Dict[int, tuple] = {}

#: Combined host+device byte budget for _device_blocks_cache.  Scan
#: surface samples reach tens of millions of points (~1 GB host + ~0.5 GB
#: padded device f32 copy); bounding by footprint instead of entry count
#: keeps one big scan resident without pinning several.  Sized so the
#: cache never crowds the refinement stage's near-full-chip peak when a
#: benchmark alternates match and evaluation phases in one process.
_CACHE_BUDGET_BYTES = int(1.5e9)


def _cache_entry_bytes(entry: tuple) -> int:
    arr, _n, blocks = entry
    return int(arr.nbytes) + int(np.prod(blocks.shape)) * 4


def _evict_to_budget(incoming_bytes: int, protect: frozenset = frozenset()) -> None:
    """Drop oldest entries until the cache + incoming fits the budget,
    deleting evicted device blocks instead of waiting for GC.

    ``protect`` holds cache keys whose device blocks are live in the
    caller's hands: evicting (and .delete()ing) them mid-computation
    raises 'Array has been deleted' when the caller's jitted program runs
    — exactly what happens when a big-scene corpus upload evicts the
    queries entry fetched moments earlier."""
    total = sum(_cache_entry_bytes(e) for e in _device_blocks_cache.values())
    for key in list(_device_blocks_cache):
        if total + incoming_bytes <= _CACHE_BUDGET_BYTES:
            break
        if key in protect:
            continue
        entry = _device_blocks_cache.pop(key)
        total -= _cache_entry_bytes(entry)
        try:
            entry[2].delete()
        except Exception:
            pass


def release_device_blocks() -> None:
    """Free every cached device point block (host arrays stay cached in
    ``_scan_cache``/on disk, so re-populating costs one upload).

    Stage-boundary hygiene: the match-refine stage peaks near the full
    chip, and an evaluation's cached blocks surviving into it tip the
    refine program into ResourceExhausted.  Pipelines that interleave
    evaluation with refinement call this when the evaluation burst ends."""
    for key in list(_device_blocks_cache):
        entry = _device_blocks_cache.pop(key)
        try:
            entry[2].delete()
        except Exception:
            pass


def _device_blocks(arr: np.ndarray, protect: frozenset = frozenset()):
    """Padded (N_blocks, _DEV_CHUNK, 3) device copy of ``arr``, cached by
    object identity.  Padding rows sit at 1e6 on every axis: as corpus
    they never win a min against real geometry; as queries their nearest
    real distance is ~1e6 m (never within tolerance).  Padded-query vs
    padded-corpus pairs are at distance 0 — callers subtract that count
    (see _count_within).

    ``protect``: cache keys (``id(other_arr)``) that eviction must not
    touch because the caller still holds their device blocks."""
    import jax.numpy as jnp

    key = id(arr)
    hit = _device_blocks_cache.get(key)
    if hit is not None and hit[0] is arr:
        return hit[1], hit[2]
    a = np.ascontiguousarray(arr, np.float32)
    n = a.shape[0]
    # Block counts bucket to powers of two for program reuse (shapes are
    # static; distinct counts would recompile through the remote compiler).
    nb = 1 << max(0, (-(-n // _DEV_CHUNK) - 1)).bit_length()
    a = np.pad(a, ((0, nb * _DEV_CHUNK - n), (0, 0)), constant_values=1e6)
    blocks = jnp.asarray(a.reshape(-1, _DEV_CHUNK, 3))
    _evict_to_budget(int(arr.nbytes) + a.nbytes, protect=protect)
    _device_blocks_cache[key] = (arr, n, blocks)
    return n, blocks


def _min_dists_brute(queries: np.ndarray, corpus: np.ndarray) -> np.ndarray:
    """Nearest-neighbor distances by chunked brute force on the device.

    Distances use the direct squared-difference form (not the
    |q|^2+|c|^2-2qc matmul identity, which loses ~sqrt(eps)*|coord|
    absolute precision to cancellation — fatal at the 1 cm tolerance);
    XLA fuses the broadcast-subtract-square-reduce so the (Q, C) tile
    never hits HBM.  Padded corpus rows sit 1e6 m away so they never win
    the min; padded query rows are sliced off.
    """
    import jax.numpy as jnp

    q = np.ascontiguousarray(queries, np.float32)
    c = np.ascontiguousarray(corpus, np.float32)
    nq, nc = q.shape[0], c.shape[0]
    q_chunk = 2048
    c_chunk = min(8192, -(-nc // 128) * 128)
    # Block COUNTS round up to powers of two: reconstruction/scan sizes
    # vary per scene and the block count is a static program shape, so
    # without bucketing every run recompiles all_min (~10 s through the
    # remote compiler).  Padded query rows are sliced off below; padded
    # corpus rows sit 1e6 m away and never win the min.
    nqb = 1 << max(0, (-(-nq // q_chunk) - 1)).bit_length()
    ncb = 1 << max(0, (-(-nc // c_chunk) - 1)).bit_length()
    q = np.pad(q, ((0, nqb * q_chunk - nq), (0, 0)))
    c = np.pad(c, ((0, ncb * c_chunk - nc), (0, 0)), constant_values=1e6)
    c_chunks = jnp.asarray(c.reshape(-1, c_chunk, 3))

    d = _all_min(jnp.asarray(q.reshape(-1, q_chunk, 3)), c_chunks)
    return np.asarray(d).reshape(-1)[:nq].astype(np.float64)


def _all_min_impl(q_blocks, c_blocks):
    import jax.numpy as jnp
    from jax import lax

    def per_q(qb):  # (q_chunk, 3)
        def body(best, cb):  # cb: (c_chunk, 3)
            d2 = jnp.sum((qb[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
            return jnp.minimum(best, d2.min(axis=1)), None

        best, _ = lax.scan(
            body, jnp.full((qb.shape[0],), jnp.inf, jnp.float32), c_blocks
        )
        return best

    return jnp.sqrt(lax.map(per_q, q_blocks))


def _all_min(q_blocks, c_blocks):
    # Module-level jit (a per-call closure would retrace every call).
    global _all_min_jitted
    if _all_min_jitted is None:
        import jax

        _all_min_jitted = jax.jit(_all_min_impl)
    return _all_min_jitted(q_blocks, c_blocks)


_all_min_jitted = None


def _min_dists(queries: np.ndarray, corpus: np.ndarray) -> np.ndarray:
    """NN distances from each query to the corpus; picks host KD-tree or
    device brute force by problem size (override: LFR_EVAL_BRUTE=0/1)."""
    force = os.environ.get("LFR_EVAL_BRUTE")
    if force is not None:
        use_brute = force == "1"
    else:
        import jax

        use_brute = (
            queries.shape[0] * corpus.shape[0] >= _BRUTE_FORCE_MIN_PAIRS
            and jax.default_backend() != "cpu"
        )
    if use_brute:
        return _min_dists_brute(queries, corpus)
    d, _ = cKDTree(corpus).query(queries, k=1, workers=-1)
    return d


def _count_within_impl(q_blocks, c_blocks, tol2):
    """Per-tolerance count of queries whose squared NN distance <= tol2.

    Everything stays on device: only (T,) counts return to the host —
    at 100-camera scale the per-query distance vector alone is >100 MB
    through the tunnel."""
    import jax.numpy as jnp
    from jax import lax

    def per_q(qb):  # (chunk, 3)
        def body(best, cb):
            d2 = jnp.sum((qb[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
            return jnp.minimum(best, d2.min(axis=1)), None

        best, _ = lax.scan(
            body, jnp.full((qb.shape[0],), jnp.inf, jnp.float32), c_blocks
        )
        return (best[None, :] <= tol2[:, None]).sum(axis=1)  # (T,)

    return lax.map(per_q, q_blocks).sum(axis=0)


_count_within_jitted = None


def _fractions_within(
    queries: np.ndarray, corpus: np.ndarray, tolerances: Sequence[float]
) -> List[float]:
    """Fraction of queries within each tolerance of the corpus.

    Device path computes counts in one program over cached point blocks;
    padded queries and padded corpus both sit at 1e6, so their mutual
    distance-0 pairs are subtracted exactly (real geometry never reaches
    within tolerance of a 1e6 pad)."""
    force = os.environ.get("LFR_EVAL_BRUTE")
    if force is not None:
        use_brute = force == "1"
    else:
        import jax

        use_brute = (
            queries.shape[0] * corpus.shape[0] >= _BRUTE_FORCE_MIN_PAIRS
            and jax.default_backend() != "cpu"
        )
    if not use_brute:
        d, _ = cKDTree(corpus).query(queries, k=1, workers=-1)
        return [float((d <= t).mean()) for t in tolerances]

    global _count_within_jitted
    import jax
    import jax.numpy as jnp

    if _count_within_jitted is None:
        _count_within_jitted = jax.jit(_count_within_impl)
    nq, qb = _device_blocks(queries)
    # Protect the queries entry: the corpus upload's eviction pass must
    # not delete qb while it is live in the jitted call below.
    nc, cb = _device_blocks(corpus, protect=frozenset((id(queries),)))
    tol2 = jnp.asarray(np.square(np.asarray(tolerances, np.float32)))
    counts = np.asarray(_count_within_jitted(qb, cb, tol2), np.int64)
    n_pad_q = qb.shape[0] * qb.shape[1] - nq
    corpus_padded = cb.shape[0] * cb.shape[1] > nc
    if corpus_padded and n_pad_q:
        counts = counts - n_pad_q
    return [float(c) / nq for c in counts]


# ---------------------------------------------------------------------------
# Scan-sample visibility (z-buffer approximation)
# ---------------------------------------------------------------------------
#
# The official ETH3DMultiViewEvaluation accounts for scan occlusion /
# free-space when scoring (reference: eth/benchmark.py:138-149 runs the
# external binary against the laser-scan ground truth).  Here the analog:
# a scan surface sample participates in COMPLETENESS only when it is
# visible in at least ``min_views`` calibrated ground-truth views, where
# visibility is a point-splat z-buffer test — project every sample into
# each view, keep the nearest depth per coarse pixel bin, and accept
# samples within a relative depth tolerance of that minimum.  Accuracy
# keeps the full scan as its corpus (any true surface counts as correct).
# Distortion is ignored (valid for ETH3D's undistorted DSLR calibration
# and the synthetic pinhole rigs); results carry "+visibility" in
# ``evaluation_mode``.

#: Z-buffer bin size in pixels (coarse: silhouette bleed of one bin is an
#: accepted approximation; official scan observability is not available).
_VIS_GRID_PX = 8

#: Only every k-th sample splats into the depth buffer (the surface is
#: dense, so a 4x subsample still fills every covered bin); ALL samples
#: are depth-tested.  Cuts the scatter cost 4x.
_VIS_DEPTH_SUBSAMPLE = 4

#: A sample passes the depth test within this relative tolerance of the
#: bin's minimum depth (absorbs splat discretization on slanted surfaces).
_VIS_DEPTH_TOL_REL = 0.02

_vis_jitted = None


#: Cameras per visibility program: bounds one XLA program to a fixed
#: 64-step scan regardless of scene size (an unchunked 512-padded-view
#: program over a multi-million-sample scan crashed the TPU worker on a
#: 300-camera scene) and makes every scene share ONE compiled program.
_VIS_CAM_CHUNK = 64


def _visibility_impl(views, pts, n_valid, Rs, ts, intr, wh,
                     grid_w: int, n_bins: int, sub: int):
    """(N, 3) points x (C, ...) cameras -> updated (N,) int32 view counts.

    ``views`` chains across camera chunks on device; rows >= ``n_valid``
    are block padding and are excluded from the z-buffer (a padded zero
    point lands at a real depth in whatever bin the world origin projects
    to and can shadow true surface samples)."""
    import jax.numpy as jnp
    from jax import lax

    valid = jnp.arange(pts.shape[0]) < n_valid

    def one_cam(views, cam):
        R, t, k4, whc = cam
        c = pts @ R.T + t  # (N, 3) camera coords
        z = c[:, 2]
        front = valid & (z > 1e-9)
        zs = jnp.where(front, z, 1.0)
        px = k4[0] * c[:, 0] / zs + k4[2]
        py = k4[1] * c[:, 1] / zs + k4[3]
        gx = jnp.floor(px / _VIS_GRID_PX).astype(jnp.int32)
        gy = jnp.floor(py / _VIS_GRID_PX).astype(jnp.int32)
        wg = jnp.ceil(whc[0] / _VIS_GRID_PX).astype(jnp.int32)
        hg = jnp.ceil(whc[1] / _VIS_GRID_PX).astype(jnp.int32)
        inb = front & (gx >= 0) & (gy >= 0) & (gx < wg) & (gy < hg)
        bins = jnp.where(inb, gy * grid_w + gx, n_bins)
        depth = jnp.full((n_bins,), jnp.inf, jnp.float32)
        depth = depth.at[bins[::sub]].min(
            jnp.where(inb, z, jnp.inf)[::sub].astype(jnp.float32), mode="drop"
        )
        dmin = depth.at[jnp.minimum(bins, n_bins - 1)].get(mode="fill", fill_value=jnp.inf)
        visible = inb & (z <= dmin * (1.0 + _VIS_DEPTH_TOL_REL) + 1e-9)
        return views + visible.astype(jnp.int32), None

    views, _ = lax.scan(one_cam, views, (Rs, ts, intr, wh))
    return views


def scan_visibility_mask(
    scan: np.ndarray, model, min_views: int = 1
) -> np.ndarray:
    """(N,) bool: scan samples visible in >= ``min_views`` model views.

    ``model`` is an ``io.colmap_model.Model`` (ground-truth calibration;
    poses world-to-camera).  Pinhole projection from the calibration
    matrix; distortion terms are not applied."""
    global _vis_jitted
    import jax
    import jax.numpy as jnp

    from ..io.colmap_model import qvec_to_rotmat
    from ..sfm.cameras import calibration_matrix

    images = sorted(model.images.values(), key=lambda im: im.image_id)
    if not images or scan.shape[0] == 0:
        return np.ones(scan.shape[0], bool)
    Rs = np.stack([qvec_to_rotmat(im.qvec) for im in images]).astype(np.float32)
    ts = np.stack([im.tvec for im in images]).astype(np.float32)
    intr, wh = [], []
    for im in images:
        cam = model.cameras[im.camera_id]
        K = calibration_matrix(cam)
        intr.append([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        wh.append([cam.width, cam.height])
    intr = np.asarray(intr, np.float32)
    wh = np.asarray(wh, np.float32)

    # Pad the camera axis to a chunk multiple (w=h=0 dummies see nothing);
    # the host loop below feeds _VIS_CAM_CHUNK views per program call.
    c = len(images)
    cb = -(-c // _VIS_CAM_CHUNK) * _VIS_CAM_CHUNK
    pad = cb - c
    if pad:
        Rs = np.concatenate([Rs, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
        ts = np.concatenate([ts, np.zeros((pad, 3), np.float32)])
        intr = np.concatenate([intr, np.ones((pad, 4), np.float32)])
        wh = np.concatenate([wh, np.zeros((pad, 2), np.float32)])

    grid_w = int(np.ceil(wh[:, 0].max() / _VIS_GRID_PX))
    grid_h = int(np.ceil(wh[:, 1].max() / _VIS_GRID_PX))
    # Bucket the bin count (static shape) for cross-scene program reuse.
    n_bins = 1 << int(max(grid_w * grid_h, 1) - 1).bit_length()

    n, blocks = _device_blocks(np.ascontiguousarray(scan, np.float32))
    pts = blocks.reshape(-1, 3)

    if _vis_jitted is None:
        _vis_jitted = jax.jit(
            _visibility_impl, static_argnames=("grid_w", "n_bins", "sub")
        )
    views = jnp.zeros(pts.shape[0], jnp.int32)
    for ci in range(0, cb, _VIS_CAM_CHUNK):
        cj = ci + _VIS_CAM_CHUNK
        views = _vis_jitted(
            views,
            pts,
            jnp.int32(n),
            jnp.asarray(Rs[ci:cj]),
            jnp.asarray(ts[ci:cj]),
            jnp.asarray(intr[ci:cj]),
            jnp.asarray(wh[ci:cj]),
            grid_w=grid_w,
            n_bins=n_bins,
            sub=_VIS_DEPTH_SUBSAMPLE,
        )
    views = np.asarray(views)[:n]
    return views >= min_views


#: (scan path key, model path, model mtime, min_views) -> visible scan
#: array (kept so _device_blocks reuses its padded device copy across the
#: ref and raw evaluations of one benchmark run).
_visible_scan_cache: Dict[tuple, np.ndarray] = {}


def _model_dir_mtime(gt_model_path: str) -> float:
    """Latest mtime over the model files (cameras/images/points3D .txt or
    .bin) — the disk-cache validity signature for the GT calibration."""
    latest = 0.0
    try:
        for name in os.listdir(gt_model_path):
            if name.split(".")[0] in ("cameras", "images", "points3D"):
                latest = max(latest, os.path.getmtime(os.path.join(gt_model_path, name)))
    except OSError:
        pass
    return latest


def _visible_scan_cached(
    scan: np.ndarray, ground_truth: str, gt_model_path: str, min_views: int
) -> np.ndarray:
    model_abspath = os.path.abspath(gt_model_path)
    model_mtime = _model_dir_mtime(gt_model_path)
    key = (
        os.path.abspath(ground_truth),
        os.path.getmtime(ground_truth),
        model_abspath,
        model_mtime,
        min_views,
    )
    hit = _visible_scan_cache.get(key)
    if hit is not None:
        return hit
    # Disk cache beside the scan (like the surface samples): the
    # visibility pass projects millions of samples into every view —
    # tens of seconds at 100 cameras — and depends only on the fixed
    # ground truth, while benchmark drivers evaluate the same scene once
    # per method x {ref,raw} x repeat, often in separate processes.  The
    # payload records (and load-time validates) the GT model path and its
    # files' mtime as well as the scan's, mirroring the in-memory key —
    # a regenerated calibration or a different model dir with the same
    # scan must not silently reuse a stale mask.
    disk = None
    if not os.environ.get("LFR_NO_SCAN_CACHE"):
        disk = f"{key[0]}.visible-{min_views}-{scan.shape[0]}.npz"
    if disk and os.path.exists(disk):
        try:
            with np.load(disk) as z:
                if (
                    "model_path" in z.files
                    and float(z["mtime"]) == key[1]
                    and str(z["model_path"]) == model_abspath
                    and float(z["model_mtime"]) == model_mtime
                ):
                    visible = z["visible"]
                    _visible_scan_cache.clear()
                    _visible_scan_cache[key] = visible
                    return visible
        except Exception:
            pass
    from ..io.colmap_model import read_model

    mask = scan_visibility_mask(scan, read_model(gt_model_path), min_views)
    visible = np.ascontiguousarray(scan[mask])
    if disk is not None:
        try:
            tmp = disk + ".tmp"
            with open(tmp, "wb") as fh:
                np.savez(
                    fh,
                    visible=visible.astype(np.float32),
                    mtime=key[1],
                    model_path=model_abspath,
                    model_mtime=model_mtime,
                )
            os.replace(tmp, disk)
        except Exception:
            pass
    _visible_scan_cache.clear()
    _visible_scan_cache[key] = visible
    return visible


def evaluate_point_cloud(
    reconstruction: np.ndarray,
    scan: np.ndarray,
    tolerances: Sequence[float] = ETH3D_TOLERANCES,
    mode: str = "vertex",
    scan_completeness: np.ndarray = None,
) -> Dict[str, List[float]]:
    """Accuracy/completeness/F1 at each tolerance.

    ``scan_completeness`` (default: ``scan``) is the query set for the
    completeness direction — callers with a visibility mask pass the
    visible subset here while accuracy keeps the full scan corpus."""
    if scan_completeness is None:
        scan_completeness = scan
    if reconstruction.shape[0] == 0 or scan.shape[0] == 0:
        z = [0.0] * len(tolerances)
        return {
            "tolerances": list(tolerances),
            "accuracies": z,
            "completenesses": z,
            "f1_scores": z,
            "evaluation_mode": mode,
        }

    accuracies = _fractions_within(reconstruction, scan, tolerances)
    if scan_completeness.shape[0] == 0:
        # Visibility masking eliminated every scan sample (e.g. degenerate
        # GT calibration).  Accuracy is still computable from the full
        # scan; only the completeness direction has no queries — zero it
        # and warn loudly rather than silently returning all zeros, which
        # would read as a bad reconstruction instead of a masking failure.
        import warnings

        warnings.warn(
            "visibility mask eliminated every scan sample; completeness "
            "set to 0 (accuracy computed from the full scan)",
            RuntimeWarning,
        )
        completenesses = [0.0] * len(tolerances)
    else:
        completenesses = _fractions_within(
            scan_completeness, reconstruction, tolerances
        )
    f1s = [
        2 * a * c / (a + c) if (a + c) > 0 else 0.0
        for a, c in zip(accuracies, completenesses)
    ]
    return {
        "tolerances": list(tolerances),
        "accuracies": accuracies,
        "completenesses": completenesses,
        "f1_scores": f1s,
        "evaluation_mode": mode,
    }


def evaluate_ply(
    reconstruction_ply: str,
    ground_truth: str,
    tolerances: Sequence[float] = ETH3D_TOLERANCES,
    surface_spacing: float = SURFACE_SPACING,
    gt_model_path: str = None,
    visibility_min_views: int = 1,
) -> Dict[str, List[float]]:
    """Evaluate a reconstruction PLY against a scan (.mlp or .ply).

    Triangulated scans are surface-sampled; vertex-only clouds fall back
    to point-to-vertex distances (flagged via ``evaluation_mode``).

    With ``gt_model_path`` (a COLMAP ground-truth calibration directory),
    completeness is restricted to scan samples VISIBLE in at least
    ``visibility_min_views`` calibrated views (z-buffer approximation of
    the official evaluator's scan-observability handling); the mode
    string gains a "+visibility" suffix."""
    rec = read_ply_xyz(reconstruction_ply)
    scan, mode = _load_scan_cached(ground_truth, surface_spacing)
    scan_completeness = None
    if gt_model_path is not None and os.path.isdir(gt_model_path):
        scan_completeness = _visible_scan_cached(
            scan, ground_truth, gt_model_path, visibility_min_views
        )
        mode = mode + "+visibility"
    return evaluate_point_cloud(
        rec, scan, tolerances, mode=mode, scan_completeness=scan_completeness
    )


#: One-entry cache of the sampled scan keyed by (path, mtime, spacing):
#: every benchmark evaluates ref and raw against the same ground truth,
#: and surface sampling is the expensive half of an evaluation.
_scan_cache: Dict[tuple, tuple] = {}


def _load_scan_cached(ground_truth: str, surface_spacing: float):
    key = (
        os.path.abspath(ground_truth),
        os.path.getmtime(ground_truth),
        surface_spacing,
    )
    hit = _scan_cache.get(key)
    if hit is not None:
        return hit
    # Disk cache beside the scan: benchmark drivers evaluate the same
    # scene once per method x {ref,raw} across many processes, and
    # sampling tens of millions of surface points costs seconds each time.
    disk = (
        f"{key[0]}.samples-{surface_spacing}.npz"
        if surface_spacing and not os.environ.get("LFR_NO_SCAN_CACHE")
        else None
    )
    if disk and os.path.exists(disk):
        try:
            with np.load(disk) as z:
                if float(z["mtime"]) == key[1]:
                    scan, mode = z["scan"], str(z["mode"])
                    _scan_cache.clear()
                    _scan_cache[key] = (scan, mode)
                    return scan, mode
        except Exception:
            pass
    if ground_truth.endswith(".mlp"):
        scan, mode = load_mlp_scan(ground_truth, surface_spacing)
    else:
        xyz, faces = read_ply_mesh(ground_truth)
        if faces is not None and surface_spacing:
            scan, mode = sample_mesh_surface(xyz, faces, surface_spacing), "surface"
        else:
            scan, mode = xyz, "vertex"
    if disk and mode == "surface":
        try:
            tmp = disk + ".tmp"
            with open(tmp, "wb") as fh:
                np.savez(fh, scan=scan.astype(np.float32), mode=mode, mtime=key[1])
            os.replace(tmp, disk)
        except Exception:
            pass
    _scan_cache.clear()
    _scan_cache[key] = (scan, mode)
    return scan, mode


def format_results(results: Dict[str, List[float]]) -> str:
    """ETH3DMultiViewEvaluation-style stdout block
    (consumed as ``output/<m>-<d>-{ref,raw}.txt``).  A trailing mode line
    documents whether accuracy was measured against the sampled scan
    surface or (deviation from the official binary) bare scan vertices."""
    lines = [
        "Tolerances: " + ", ".join(str(t) for t in results["tolerances"]),
        "Accuracies: " + " ".join(f"{a:.6f}" for a in results["accuracies"]),
        "Completenesses: " + " ".join(f"{c:.6f}" for c in results["completenesses"]),
        "F1-scores: " + " ".join(f"{f:.6f}" for f in results["f1_scores"]),
        "Evaluation-mode: " + results.get("evaluation_mode", "vertex"),
    ]
    return "\n".join(lines) + "\n"
