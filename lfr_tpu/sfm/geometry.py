"""Projective geometry primitives (JAX, batched, TPU-first).

In-framework replacements for the geometry the reference delegates to the
COLMAP binaries (reference: reconstruction-scripts/colmap_utils.py:196-319):
rotations, projection, DLT triangulation, fundamental/essential/homography
estimation, and Sampson scoring — all shaped for ``vmap`` over hypothesis
or track batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def qvec_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def project(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """World points (..., 3) -> pixels (..., 2) for world-to-cam (R, t)."""
    cam = points @ jnp.swapaxes(R, -1, -2) + t
    uv = cam[..., :2] / cam[..., 2:3]
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], axis=-1)


def cam_depth(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return (points @ jnp.swapaxes(R, -1, -2) + t)[..., 2]


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------


def triangulate_dlt(P: jnp.ndarray, uv: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Multi-view DLT triangulation.

    Args:
      P: (V, 3, 4) projection matrices (K [R|t]).
      uv: (V, 2) pixel observations.
      mask: (V,) validity.

    Returns (3,) world point (least-squares homogeneous solution).
    """
    # Rows: u * P[2] - P[0], v * P[2] - P[1], zeroed when invalid.
    r0 = uv[:, 0:1] * P[:, 2] - P[:, 0]
    r1 = uv[:, 1:2] * P[:, 2] - P[:, 1]
    A = jnp.concatenate([r0, r1], axis=0)  # (2V, 4)
    m = jnp.concatenate([mask, mask]).astype(A.dtype)[:, None]
    A = A * m
    # Smallest right singular vector of A.
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    X = vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, jnp.sign(X[3]) + 1e-12, X[3])


triangulate_dlt_batch = jax.vmap(triangulate_dlt)


def projection_matrix(R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """K [R|t]: (..., 3, 4)."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return K @ Rt


# ---------------------------------------------------------------------------
# Fundamental / essential / homography estimation
# ---------------------------------------------------------------------------


def _normalize_points(x: jnp.ndarray):
    """Hartley normalization; x (N, 2) -> (x_norm, T (3,3))."""
    mean = jnp.mean(x, axis=0)
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return (x - mean) * scale, T


def nullvec_fix_last(A: jnp.ndarray) -> jnp.ndarray:
    """Null vector of a MINIMAL (..., 8, 9) design matrix by fixing the
    last component to 1 and solving the exact square system
    ``A[..., :8] g = -A[..., 8]`` (batched LU).

    Valid whenever the true solution's last component is nonzero — the
    F/H pipelines already normalize by the [2, 2] entry, so this is the
    same genericity assumption; a degenerate sample yields a low-scoring
    hypothesis, which RANSAC discards anyway.  Batched LU solves
    vectorize on TPU where the iterative small-matrix SVD does not
    (scripts/bench_nullvec.py), and the solution is exact (~1e-7
    residual on real epipolar minimal sets vs ~4e-3 for shifted inverse
    power iteration, whose convergence collapses when the minimal set's
    A^T A has several near-zero eigenvalues)."""
    g = jnp.linalg.solve(A[..., :8, :8], -A[..., :8, 8])
    v = jnp.concatenate([g, jnp.ones(g.shape[:-1] + (1,), g.dtype)], axis=-1)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def fundamental_8point(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray = None, fast: bool = False
) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix from (N>=8, 2) correspondences.

    ``w``: optional per-correspondence weights (for weighted refits).
    ``fast``: inverse-power null vector and NO rank-2 enforcement — for
    RANSAC hypothesis scoring only, where F's sole job is selecting an
    inlier set and the subsequent refit rebuilds it exactly.
    """
    n1, T1 = _normalize_points(x1)
    n2, T2 = _normalize_points(x2)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=1)
    if w is not None:
        A = A * w[:, None]
    if fast:
        F = nullvec_fix_last(A).reshape(3, 3)
        F = T2.T @ F @ T1
        return F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])
    if A.shape[0] < 9:
        # The null vector of a wide A is NOT in the thin SVD's row-space
        # basis (svd of (8, 9) returns only 8 right vectors); pad with
        # zero rows (A^T A unchanged) so vt is the full (9, 9) basis and
        # vt[-1] is the actual minimal singular vector.
        A = jnp.concatenate([A, jnp.zeros((9 - A.shape[0], 9), A.dtype)])
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    # Rank-2 enforcement.
    uF, sF, vFt = jnp.linalg.svd(F)
    F = (uF * sF.at[2].set(0.0)[None, :]) @ vFt
    F = T2.T @ F @ T1
    return F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])


def sampson_error(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance (px^2) for (N, 2) correspondences."""
    ones = jnp.ones((x1.shape[0], 1), x1.dtype)
    h1 = jnp.concatenate([x1, ones], axis=1)
    h2 = jnp.concatenate([x2, ones], axis=1)
    Fx1 = h1 @ F.T          # (N, 3) = F @ x1
    Ftx2 = h2 @ F           # (N, 3) = F^T @ x2
    num = jnp.sum(h2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def homography_dlt(
    x1: jnp.ndarray, x2: jnp.ndarray, fast: bool = False, w: jnp.ndarray = None
) -> jnp.ndarray:
    """Normalized DLT homography from (N>=4, 2) correspondences.

    ``fast``: fixed-last-component null vector (hypothesis scoring; the
    winning model is refit with the exact path).  ``w``: optional
    per-correspondence weights (weighted refits)."""
    n1, T1 = _normalize_points(x1)
    n2, T2 = _normalize_points(x2)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    rows1 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    rows2 = jnp.stack([z, z, z, u1, v1, o, -v2 * u1, -v2 * v1, -v2], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    if fast:
        H = nullvec_fix_last(A).reshape(3, 3)
    else:
        if A.shape[0] < 9:
            # See fundamental_8point: a wide A's null vector is outside
            # the thin SVD's row-space basis; zero-row padding restores it.
            A = jnp.concatenate([A, jnp.zeros((9 - A.shape[0], 9), A.dtype)])
        _, _, vt = jnp.linalg.svd(A, full_matrices=False)
        H = vt[-1].reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1.0, H[2, 2])


def homography_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric-ish transfer error |H x1 - x2|^2 (px^2)."""
    ones = jnp.ones((x1.shape[0], 1), x1.dtype)
    h1 = jnp.concatenate([x1, ones], axis=1)
    p = h1 @ H.T
    p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) < 1e-12, 1e-12, p[:, 2:])
    return jnp.sum((p - x2) ** 2, axis=1)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    E = K2.T @ F @ K1
    # Project onto the essential manifold (two equal singular values).
    u, s, vt = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) / 2.0
    return (u * jnp.array([sm, sm, 0.0])[None, :]) @ vt


def decompose_essential(E: jnp.ndarray):
    """Returns the 4 (R, t) candidates."""
    u, _, vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def triangulation_angles(
    points: jnp.ndarray, center1: jnp.ndarray, center2: jnp.ndarray
) -> jnp.ndarray:
    """Angle (rad) subtended at each point by the two camera centers."""
    d1 = points - center1
    d2 = points - center2
    cosang = jnp.sum(d1 * d2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1), 1e-12
    )
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
