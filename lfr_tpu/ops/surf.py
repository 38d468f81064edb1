"""SURF feature extraction (Bay et al., ECCV 2006), TPU-native.

Replaces the reference's OpenCV ``xfeatures2d.SURF`` extractor
(reference: utils/extract_features_surf.py:37-58, extended=True,
hessianThreshold=500) with a from-scratch implementation:

  * integral image + box-filter approximations of the scale-normalized
    Hessian (the 9x9 base patterns of OpenCV's surf.cpp, scaled per layer;
    det H = Dxx*Dyy - (0.9*Dxy)^2) — dense response maps evaluate as pure
    strided-slice arithmetic on the integral image, which XLA vectorizes;
  * 3x3x3 non-max suppression over (x, y, scale) with quadratic sub-pixel
    / sub-scale interpolation;
  * dominant-orientation estimation from Gaussian-weighted Haar responses
    in a radius-6s disc with a pi/3 sliding window;
  * the EXTENDED 128-D descriptor: 4x4 subregions of an oriented 20s
    window, 5x5 Haar samples each, sums split by response sign,
    L2-normalized.

Output follows the reference npz contract: keypoints (K, 4) =
[x, y, size, angle_degrees] (OpenCV conventions: size = interpolated box
filter size, angle measured from +x toward -y), scores = det-of-Hessian
responses, descriptors (K, 128) float32.  Statistical, not byte,
compatibility with OpenCV is claimed (no cv2.xfeatures2d oracle exists in
this environment; see tests/test_surf.py property tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: OpenCV defaults (reference: extract_features_surf.py:37-40).
HESSIAN_THRESHOLD = 500.0
N_OCTAVES = 4
N_LAYERS = 4  # filter sizes per octave; layers 1..2 are NMS centers

#: 9x9 base box patterns (x0, y0, x1, y1, weight) from OpenCV surf.cpp.
_DX_BOXES = ((0, 2, 3, 7, 1.0), (3, 2, 6, 7, -2.0), (6, 2, 9, 7, 1.0))
_DY_BOXES = ((2, 0, 7, 3, 1.0), (2, 3, 7, 6, -2.0), (2, 6, 7, 9, 1.0))
_DXY_BOXES = (
    (1, 1, 4, 4, 1.0),
    (5, 1, 8, 4, -1.0),
    (1, 5, 4, 8, -1.0),
    (5, 5, 8, 8, 1.0),
)


def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H+1, W+1) with ii[y, x] = sum of img[:y, :x]."""
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _scaled_boxes(pattern, size: int):
    """Scale a 9x9 pattern to ``size``; weights become box averages."""
    ratio = size / 9.0
    out = []
    for x0, y0, x1, y1, w in pattern:
        sx0, sy0 = int(round(x0 * ratio)), int(round(y0 * ratio))
        sx1, sy1 = int(round(x1 * ratio)), int(round(y1 * ratio))
        area = max((sx1 - sx0) * (sy1 - sy0), 1)
        out.append((sx0, sy0, sx1, sy1, w / area))
    return out


@functools.partial(jax.jit, static_argnames=("size", "stride", "gh", "gw"))
def det_hessian_map(ii: jnp.ndarray, size: int, stride: int, gh: int, gw: int):
    """Dense det-of-Hessian response on the stride grid.

    Grid point (gi, gj) is the filter centered at pixel
    (gi*stride + size//2-ish margin handled by the caller's mask).  The
    window's top-left for grid origin 0 is pixel (0, 0).
    """

    def box_sum(bx0, by0, bx1, by1):
        # Sum over rows [gy+by0, gy+by1) x cols [gx+bx0, gx+bx1) where
        # (gy, gx) = (gi*stride, gj*stride) is the window top-left.
        def corner(dy, dx):
            return jax.lax.slice(
                ii,
                (dy, dx),
                (dy + (gh - 1) * stride + 1, dx + (gw - 1) * stride + 1),
                (stride, stride),
            )

        return (
            corner(by1, bx1) - corner(by0, bx1) - corner(by1, bx0) + corner(by0, bx0)
        )

    def pattern_sum(pattern):
        acc = None
        for sx0, sy0, sx1, sy1, w in _scaled_boxes(pattern, size):
            term = w * box_sum(sx0, sy0, sx1, sy1)
            acc = term if acc is None else acc + term
        return acc

    dxx = pattern_sum(_DX_BOXES)
    dyy = pattern_sum(_DY_BOXES)
    dxy = pattern_sum(_DXY_BOXES)
    return dxx * dyy - 0.81 * dxy * dxy


def _octave_sizes(octave: int):
    return [(9 + 6 * layer) << octave for layer in range(N_LAYERS)]


def _response_pyramid(ii_np: np.ndarray, h: int, w: int):
    """All (octave, layer) response maps as numpy, on aligned stride grids."""
    # Edge-pad the integral so every layer's slices stay in bounds; grid
    # points whose true window exceeds the image are masked below (boxes in
    # the replicated region difference to zero).
    pad = _octave_sizes(N_OCTAVES - 1)[-1] + 8
    ii = jnp.asarray(np.pad(ii_np, ((0, pad), (0, pad)), mode="edge"))
    pyramid = []
    for o in range(N_OCTAVES):
        stride = 1 << o
        sizes = _octave_sizes(o)
        if min(h, w) < sizes[-1] + 2:
            break
        # Grid dims: window top-left gy=gi*stride must keep the largest
        # window inside; use per-layer masks, shared grid extent.
        gh = (h - sizes[0]) // stride + 1
        gw = (w - sizes[0]) // stride + 1
        if gh < 3 or gw < 3:
            break
        maps = []
        for size in sizes:
            m = np.array(det_hessian_map(ii, size, stride, gh, gw))
            # Mask grid points whose window exceeds the image.
            max_g_y = (h - size) // stride + 1
            max_g_x = (w - size) // stride + 1
            if max_g_y < gh:
                m[max_g_y:] = -np.inf
            if max_g_x < gw:
                m[:, max_g_x:] = -np.inf
            maps.append(m)
        pyramid.append((o, stride, sizes, np.stack(maps)))
    return pyramid


def _nms_and_interp(pyramid, threshold: float):
    """3x3x3 NMS + quadratic interpolation.  Returns (x, y, size, score)."""
    out = []
    for o, stride, sizes, R in pyramid:
        L, gh, gw = R.shape
        for layer in range(1, L - 1):
            C = R[layer]
            mask = C > threshold
            # 26-neighbor max comparison.
            neigh_max = np.full_like(C, -np.inf)
            for dl in (-1, 0, 1):
                M = R[layer + dl]
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dl == 0 and dy == 0 and dx == 0:
                            continue
                        shifted = np.full_like(C, -np.inf)
                        ys = slice(max(dy, 0), gh + min(dy, 0))
                        yd = slice(max(-dy, 0), gh + min(-dy, 0))
                        xs = slice(max(dx, 0), gw + min(dx, 0))
                        xd = slice(max(-dx, 0), gw + min(-dx, 0))
                        shifted[yd, xd] = M[ys, xs]
                        neigh_max = np.maximum(neigh_max, shifted)
            mask &= C > neigh_max
            mask[0, :] = mask[-1, :] = False
            mask[:, 0] = mask[:, -1] = False
            gy, gx = np.nonzero(mask)
            if gy.size == 0:
                continue
            # Quadratic interpolation in (x, y, s).  Masked (-inf) entries
            # near margins produce non-finite intermediates that are
            # discarded by the finite/offset checks below.
            old_err = np.seterr(all="ignore")
            d = np.stack(
                [
                    (C[gy, gx + 1] - C[gy, gx - 1]) / 2,
                    (C[gy + 1, gx] - C[gy - 1, gx]) / 2,
                    (R[layer + 1][gy, gx] - R[layer - 1][gy, gx]) / 2,
                ],
                axis=1,
            )
            dxx = C[gy, gx + 1] + C[gy, gx - 1] - 2 * C[gy, gx]
            dyy = C[gy + 1, gx] + C[gy - 1, gx] - 2 * C[gy, gx]
            dss = R[layer + 1][gy, gx] + R[layer - 1][gy, gx] - 2 * C[gy, gx]
            dxy = (
                C[gy + 1, gx + 1] - C[gy + 1, gx - 1]
                - C[gy - 1, gx + 1] + C[gy - 1, gx - 1]
            ) / 4
            dxs = (
                R[layer + 1][gy, gx + 1] - R[layer + 1][gy, gx - 1]
                - R[layer - 1][gy, gx + 1] + R[layer - 1][gy, gx - 1]
            ) / 4
            dys = (
                R[layer + 1][gy + 1, gx] - R[layer + 1][gy - 1, gx]
                - R[layer - 1][gy + 1, gx] + R[layer - 1][gy - 1, gx]
            ) / 4
            H = np.stack(
                [
                    np.stack([dxx, dxy, dxs], -1),
                    np.stack([dxy, dyy, dys], -1),
                    np.stack([dxs, dys, dss], -1),
                ],
                axis=1,
            )
            with np.errstate(all="ignore"):
                try:
                    offs = -np.linalg.solve(
                        H + 1e-9 * np.eye(3), d[..., None]
                    )[..., 0]
                except np.linalg.LinAlgError:
                    offs = np.zeros_like(d)
            np.seterr(**old_err)
            offs = np.where(np.isfinite(offs), offs, 0.0)
            good = (np.abs(offs) <= 1.0).all(axis=1)
            gy, gx, offs = gy[good], gx[good], offs[good]
            if gy.size == 0:
                continue
            size = sizes[layer]
            center_off = (size - 1) / 2.0
            x = (gx + offs[:, 0]) * stride + center_off
            y = (gy + offs[:, 1]) * stride + center_off
            sz = size + offs[:, 2] * (6 << o)
            score = C[gy, gx]
            out.append(np.stack([x, y, sz, score], axis=1))
    if not out:
        return np.zeros((0, 4))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Orientation + descriptor (batched gathers on the integral image).
# ---------------------------------------------------------------------------


def _haar_xy(ii, cx, cy, r):
    """Axis-aligned Haar responses of full size 2r at center (cx, cy).

    dx = right half - left half; dy = bottom half - top half (image y
    down).  Coordinates are floats; boxes snap to integer pixels."""
    x0 = jnp.round(cx - r).astype(jnp.int32)
    y0 = jnp.round(cy - r).astype(jnp.int32)
    x1 = x0 + jnp.int32(2 * r)
    y1 = y0 + jnp.int32(2 * r)
    xm = x0 + jnp.int32(r)
    ym = y0 + jnp.int32(r)
    h1, w1 = ii.shape

    def clamp(y, x):
        return ii[jnp.clip(y, 0, h1 - 1), jnp.clip(x, 0, w1 - 1)]

    def box(ya, xa, yb, xb):
        return clamp(yb, xb) - clamp(ya, xb) - clamp(yb, xa) + clamp(ya, xa)

    dx = box(y0, xm, y1, x1) - box(y0, x0, y1, xm)
    dy = box(ym, x0, y1, x1) - box(y0, x0, ym, x1)
    return dx, dy


# Orientation sampling disc: integer offsets with i^2 + j^2 <= 36.
_ORI_OFFS = np.array(
    [(i, j) for i in range(-6, 7) for j in range(-6, 7) if i * i + j * j <= 36],
    np.float32,
)
_ORI_GAUSS = np.exp(-(np.sum(_ORI_OFFS**2, axis=1)) / (2 * 2.5**2)).astype(np.float32)


@jax.jit
def _orientations(ii, xy, scale):
    """Dominant Haar orientation per keypoint (radians, from +x toward -y)."""
    offs = jnp.asarray(_ORI_OFFS)
    gauss = jnp.asarray(_ORI_GAUSS)

    def one(c, s):
        px = c[0] + offs[:, 1] * s
        py = c[1] + offs[:, 0] * s
        r = jnp.maximum(jnp.round(2.0 * s), 1.0)
        dx, dy = jax.vmap(lambda a, b: _haar_xy(ii, a, b, r))(px, py)
        dx = dx * gauss
        dy = dy * gauss
        ang = jnp.arctan2(dy, dx)
        # pi/3 sliding windows at 10-degree steps.
        centers = jnp.linspace(-jnp.pi, jnp.pi, 36, endpoint=False)
        diff = jnp.abs(ang[None, :] - centers[:, None])
        diff = jnp.minimum(diff, 2 * jnp.pi - diff)
        inside = diff <= (jnp.pi / 6)
        sx = jnp.sum(jnp.where(inside, dx[None, :], 0.0), axis=1)
        sy = jnp.sum(jnp.where(inside, dy[None, :], 0.0), axis=1)
        best = jnp.argmax(sx * sx + sy * sy)
        # Angle convention: from +x toward -y (OpenCV keypoint.angle).
        return jnp.arctan2(-sy[best], sx[best])

    return jax.vmap(one)(xy, scale)


# Descriptor sampling: 20x20 grid (4x4 subregions x 5x5 samples) of unit
# offsets in [-10, 10).
_DESC_GRID = np.stack(
    np.meshgrid(np.arange(20) - 9.5, np.arange(20) - 9.5, indexing="ij"), -1
).astype(np.float32)  # (20, 20, 2) = (row=y', col=x') offsets in s units
_DESC_GAUSS = np.exp(
    -np.sum(_DESC_GRID**2, axis=-1) / (2 * 3.3**2)
).astype(np.float32)


@jax.jit
def _descriptors(ii, xy, scale, theta):
    """Extended 128-D SURF descriptors."""
    grid = jnp.asarray(_DESC_GRID.reshape(-1, 2))  # (400, 2) (y', x')
    gauss = jnp.asarray(_DESC_GAUSS.reshape(-1))

    def one(c, s, th):
        ct, st = jnp.cos(th), jnp.sin(th)
        # Rotate sample offsets into image coords (y down: rotating by th
        # about +x toward -y means image-frame rotation matrix below).
        gx = grid[:, 1] * s
        gy = grid[:, 0] * s
        px = c[0] + ct * gx + st * gy
        py = c[1] - st * gx + ct * gy
        r = jnp.maximum(jnp.round(s), 1.0)
        dx, dy = jax.vmap(lambda a, b: _haar_xy(ii, a, b, r))(px, py)
        # Rotate responses into the keypoint frame.
        tdx = (ct * dx - st * dy) * gauss
        tdy = (st * dx + ct * dy) * gauss
        tdx = tdx.reshape(4, 5, 4, 5)
        tdy = tdy.reshape(4, 5, 4, 5)

        pos_dy = (tdy >= 0)
        pos_dx = (tdx >= 0)

        def sub(vals, mask):
            return jnp.sum(
                jnp.where(mask, vals, 0.0), axis=(1, 3)
            )  # (4, 4)

        feats = jnp.stack(
            [
                sub(tdx, ~pos_dy), sub(jnp.abs(tdx), ~pos_dy),
                sub(tdx, pos_dy), sub(jnp.abs(tdx), pos_dy),
                sub(tdy, ~pos_dx), sub(jnp.abs(tdy), ~pos_dx),
                sub(tdy, pos_dx), sub(jnp.abs(tdy), pos_dx),
            ],
            axis=-1,
        )  # (4, 4, 8)
        v = feats.reshape(-1)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    return jax.vmap(one)(xy, scale, theta)


def extract_surf(
    image: np.ndarray,
    max_features: int = 4096,
    threshold: float = HESSIAN_THRESHOLD,
    upright: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SURF keypoints + extended descriptors.

    Returns (keypoints (K, 4) [x, y, size, angle_deg], scores,
    descriptors (K, 128) float32).
    """
    if image.ndim == 3:
        # The reference feeds an RGB array through COLOR_BGR2GRAY
        # (extract_features_surf.py:50,55), effectively swapping the R/B
        # weights; reproduce that quirk for statistical parity.
        image = image @ np.array([0.114, 0.587, 0.299])
    img = np.ascontiguousarray(image, np.float32)
    if img.max() <= 2.0:
        img = img * 255.0
    h, w = img.shape

    ii_np = np.asarray(integral_image(jnp.asarray(img)))
    pyramid = _response_pyramid(ii_np, h, w)
    kps = _nms_and_interp(pyramid, threshold)
    if kps.shape[0] == 0:
        return np.zeros((0, 4)), np.zeros(0), np.zeros((0, 128), np.float32)

    if kps.shape[0] > max_features:
        order = np.argsort(-kps[:, 3])[:max_features]
        kps = kps[order]

    xy = jnp.asarray(kps[:, :2], jnp.float32)
    scale = jnp.asarray(1.2 * kps[:, 2] / 9.0, jnp.float32)
    ii = jnp.asarray(ii_np)
    if upright:
        theta = jnp.zeros(kps.shape[0], jnp.float32)
    else:
        theta = _orientations(ii, xy, scale)
    desc = np.asarray(_descriptors(ii, xy, scale, theta))

    angles_deg = np.degrees(np.asarray(theta)) % 360.0
    keypoints = np.stack(
        [kps[:, 0], kps[:, 1], kps[:, 2], angles_deg], axis=1
    )
    return keypoints, kps[:, 3].copy(), desc.astype(np.float32)
