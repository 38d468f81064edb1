"""COLMAP-compatible camera models: projection and undistortion.

Covers the models the reference pipelines encounter (ETH3D calibrations are
PINHOLE; LFE databases use SIMPLE_RADIAL/RADIAL from EXIF bootstraps).
Parameter layouts follow the public COLMAP conventions (see
lfr_tpu.io.colmap_db.CAMERA_MODELS).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..io.colmap_model import Camera


def calibration_matrix(cam: Camera) -> np.ndarray:
    p = cam.params
    if cam.model == "SIMPLE_PINHOLE" or cam.model == "SIMPLE_RADIAL" or cam.model == "RADIAL" or cam.model == "SIMPLE_RADIAL_FISHEYE" or cam.model == "RADIAL_FISHEYE":
        f, cx, cy = p[0], p[1], p[2]
        return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    # PINHOLE / OPENCV / FULL_OPENCV / OPENCV_FISHEYE / THIN_PRISM
    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def _distortion_params(cam: Camera) -> np.ndarray:
    p = cam.params
    if cam.model in ("SIMPLE_PINHOLE", "PINHOLE"):
        return np.zeros(0)
    if cam.model == "SIMPLE_RADIAL":
        return np.array([p[3]])
    if cam.model == "RADIAL":
        return np.array([p[3], p[4]])
    if cam.model == "OPENCV":
        return np.array(p[4:8])
    raise NotImplementedError(f"camera model {cam.model} not supported yet")


def distort_normalized(cam: Camera, xy: np.ndarray) -> np.ndarray:
    """Apply distortion to normalized camera coords (N, 2)."""
    d = _distortion_params(cam)
    if d.size == 0:
        return xy
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    if cam.model == "SIMPLE_RADIAL":
        radial = 1.0 + d[0] * r2
        return np.stack([x * radial, y * radial], axis=1)
    if cam.model == "RADIAL":
        radial = 1.0 + d[0] * r2 + d[1] * r2 * r2
        return np.stack([x * radial, y * radial], axis=1)
    if cam.model == "OPENCV":
        k1, k2, p1, p2 = d
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return np.stack([x * radial + dx, y * radial + dy], axis=1)
    raise NotImplementedError


def undistort_normalized(cam: Camera, xy: np.ndarray, iterations: int = 10) -> np.ndarray:
    """Invert distortion by fixed-point/Newton iteration (COLMAP-style)."""
    if _distortion_params(cam).size == 0:
        return xy
    u = xy.copy()
    for _ in range(iterations):
        d = distort_normalized(cam, u) - u  # distortion offset at current estimate
        u = xy - d
    return u


def pixel_to_normalized(cam: Camera, uv: np.ndarray) -> np.ndarray:
    """Pixels -> undistorted normalized coords (N, 2)."""
    K = calibration_matrix(cam)
    xy = (uv - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    return undistort_normalized(cam, xy)


def world_to_pixel(
    cam: Camera, R: np.ndarray, t: np.ndarray, points: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Project world points; returns (uv (N, 2), depth (N,))."""
    c = points @ R.T + t
    depth = c[:, 2]
    xy = c[:, :2] / np.where(np.abs(depth[:, None]) < 1e-12, 1e-12, depth[:, None])
    xy = distort_normalized(cam, xy)
    K = calibration_matrix(cam)
    uv = xy * np.array([K[0, 0], K[1, 1]]) + K[:2, 2]
    return uv, depth
