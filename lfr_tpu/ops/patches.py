"""Batched bilinear patch sampling on device.

Replicates the reference's patch extraction semantics — 33x33 patches with
grid spacing ps/(ps-1) px, bilinear interpolation, reflection padding over
pixel centers, align_corners=True (reference: two-view-refinement/
refinement.py:12-43) — as one jitted gather program.  Unlike the reference,
patches never bounce through host memory (reference: refinement.py:43 moves
them to CPU); they stay in HBM for the flow CNN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import PATCH_SIZE


def reflect_coord(x: jnp.ndarray, size) -> jnp.ndarray:
    """Reflect a continuous pixel coordinate into [0, size-1].

    align_corners=True reflection: the borders of the sampling domain are the
    *centers* of the edge pixels, so the reflection period is 2*(size-1).
    ``size`` may be a traced scalar (padded-image path).
    """
    span = jnp.maximum(size - 1, 1)
    x = jnp.mod(x, 2.0 * span)
    return jnp.where(x > span, 2.0 * span - x, x)


def sample_bilinear(image: jnp.ndarray, ij: jnp.ndarray, size=None) -> jnp.ndarray:
    """Bilinear sample ``image`` (H, W, C) at continuous (i, j) = (row, col)
    positions ``ij`` (..., 2), with reflection padding.

    ``size``: optional (h, w) *valid* extent when ``image`` is padded to a
    canonical shape — reflection and clamping then use the valid extent, so
    one compiled program serves every image size (padded-bucket trick).
    Returns (..., C).
    """
    if size is None:
        h, w = image.shape[0], image.shape[1]
    else:
        h, w = size[0], size[1]
    i = reflect_coord(ij[..., 0], h)
    j = reflect_coord(ij[..., 1], w)

    i0 = jnp.floor(i)
    j0 = jnp.floor(j)
    di = i - i0
    dj = j - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, h - 1)
    j1 = jnp.clip(j0 + 1, 0, w - 1)
    i0 = jnp.clip(i0, 0, h - 1)
    j0 = jnp.clip(j0, 0, w - 1)

    v00 = image[i0, j0]
    v01 = image[i0, j1]
    v10 = image[i1, j0]
    v11 = image[i1, j1]

    di = di[..., None]
    dj = dj[..., None]
    return (
        v00 * (1 - di) * (1 - dj)
        + v01 * (1 - di) * dj
        + v10 * di * (1 - dj)
        + v11 * di * dj
    )


def patch_offsets(patch_size: int = PATCH_SIZE, dtype=jnp.float32) -> jnp.ndarray:
    """(ps, ps, 2) grid of (di, dj) pixel offsets spanning +-ps/2 px.

    The reference's normalized grid `linspace(-1,1,ps) * ps/(dim-1)`
    unnormalizes to `linspace(-ps/2, ps/2, ps)` pixel offsets — spacing
    ps/(ps-1), slightly over one pixel (reference: refinement.py:12-30).
    """
    r = jnp.linspace(-patch_size / 2.0, patch_size / 2.0, patch_size, dtype=dtype)
    return jnp.stack(jnp.meshgrid(r, r, indexing="ij"), axis=-1)


@functools.partial(jax.jit, static_argnames=("patch_size",))
def extract_patches(
    image: jnp.ndarray, ij: jnp.ndarray, patch_size: int = PATCH_SIZE, size=None
) -> jnp.ndarray:
    """Extract patches centered at continuous (i, j) keypoint positions.

    Args:
      image: (H, W, C) array (possibly padded; see ``size``).
      ij: (N, 2) row/col centers, in the image's pixel coordinates.
      size: optional (h, w) valid extent for padded images.

    Returns (N, ps, ps, C) patches (NHWC — the framework's native layout).
    """
    offs = patch_offsets(patch_size, dtype=jnp.float32)
    coords = ij[:, None, None, :].astype(jnp.float32) + offs[None]
    return sample_bilinear(image, coords, size=size)
