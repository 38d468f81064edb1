"""Absolute camera pose from 2D-3D correspondences (PnP), batched RANSAC.

Used by the incremental mapper for image registration — the role COLMAP's
P3P RANSAC plays inside ``colmap mapper`` (reference: colmap_utils.py:
226-236 delegates all of this to the binary).  Hypotheses come from a
6-point DLT of the projection matrix, scored in parallel on device, then
the best pose is polished by Gauss-Newton on the inliers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ba import so3_exp

MAX_ERROR_PX = 8.0
NUM_HYPOTHESES = 256
MIN_INLIERS = 10


def _pose_from_dlt(X: jnp.ndarray, uv: jnp.ndarray):
    """Projection matrix from >=6 normalized 2D-3D correspondences.

    X: (K, 3) world points, uv: (K, 2) normalized image coords.
    Returns (R, t) with the scale/sign fixed by cheirality of the centroid.
    """
    k = X.shape[0]
    ones = jnp.ones((k, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=1)  # (K, 4)
    z = jnp.zeros_like(Xh)
    rows1 = jnp.concatenate([Xh, z, -uv[:, 0:1] * Xh], axis=1)
    rows2 = jnp.concatenate([z, Xh, -uv[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)  # (2K, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # Orthogonalize M -> R via SVD (closest rotation, up to scale).
    u, s, vtm = jnp.linalg.svd(M)
    det = jnp.linalg.det(u @ vtm)
    R = u @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, det])) @ vtm
    scale = jnp.sum(s * jnp.array([1.0, 1.0, det])) / 3.0
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # Fix sign so the centroid is in front of the camera.
    centroid = jnp.mean(X, axis=0)
    depth = (R @ centroid + t)[2]
    flip = jnp.sign(depth)
    return R * flip, t * flip


def _reproj_err_sq(R, t, X, uv, focal):
    c = X @ R.T + t
    z = jnp.where(jnp.abs(c[:, 2:]) < 1e-9, 1e-9, c[:, 2:])
    proj = c[:, :2] / z
    err = jnp.sum((proj - uv) ** 2, axis=1) * focal**2
    return jnp.where(c[:, 2] > 0, err, jnp.inf)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_pnp(X, uv, valid, focal, key, num_hypotheses: int = NUM_HYPOTHESES):
    n = X.shape[0]
    probs = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 6), replace=True, p=probs)

    def one(sample):
        R, t = _pose_from_dlt(X[sample], uv[sample])
        err = _reproj_err_sq(R, t, X, uv, focal)
        inl = (err <= MAX_ERROR_PX**2) & valid
        return R, t, jnp.sum(inl)

    Rs, ts, scores = jax.vmap(one)(idx)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]

    # Gauss-Newton polish on inliers (pose only), GUARDED: a step that
    # loses inliers is rejected (LO-RANSAC; an unguarded polish from a
    # contaminated hypothesis's inlier set can wander off and drop the
    # final count below the acceptance threshold — see the analogous
    # verify.py refit guard).
    def refine(carry, _):
        R, t, n_best = carry
        err = _reproj_err_sq(R, t, X, uv, focal)
        w = ((err <= MAX_ERROR_PX**2) & valid).astype(jnp.float32)

        def resid(params):
            dR = so3_exp(params[:3])
            c = X @ (dR @ R).T + (t + params[3:])
            z = jnp.where(jnp.abs(c[:, 2:]) < 1e-9, 1e-9, c[:, 2:])
            proj = c[:, :2] / z
            return ((proj - uv) * w[:, None] * focal[:, None]).reshape(-1)

        p0 = jnp.zeros(6)
        r = resid(p0)
        J = jax.jacfwd(resid)(p0)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        delta = jnp.linalg.solve(H, -J.T @ r)
        R2 = so3_exp(delta[:3]) @ R
        t2 = t + delta[3:]
        n2 = jnp.sum((_reproj_err_sq(R2, t2, X, uv, focal) <= MAX_ERROR_PX**2) & valid)
        take = n2 >= n_best
        R = jnp.where(take, R2, R)
        t = jnp.where(take, t2, t)
        return (R, t, jnp.maximum(n2, n_best)), None

    (R, t, _), _ = jax.lax.scan(refine, (R, t, scores[best]), None, length=5)
    err = _reproj_err_sq(R, t, X, uv, focal)
    inliers = (err <= MAX_ERROR_PX**2) & valid
    return R, t, inliers, jnp.sum(inliers)


def estimate_pose(
    points3D: np.ndarray,
    uv_normalized: np.ndarray,
    focal: float,
    seed: int = 0,
    min_inliers: int = MIN_INLIERS,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """RANSAC PnP; returns (R, t, inlier_mask) or None."""
    n = points3D.shape[0]
    if n < 6:
        return None
    bucket = max(64, 1 << (n - 1).bit_length())
    X = np.zeros((bucket, 3), np.float32)
    uv = np.zeros((bucket, 2), np.float32)
    valid = np.zeros(bucket, bool)
    X[:n] = points3D
    uv[:n] = uv_normalized
    valid[:n] = True
    focal_arr = np.full(bucket, focal, np.float32)

    R, t, inliers, count = _ransac_pnp(
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(valid),
        jnp.asarray(focal_arr),
        jax.random.PRNGKey(seed),
    )
    if int(count) < min_inliers:
        return None
    return np.asarray(R), np.asarray(t), np.asarray(inliers)[:n]
