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


def _window_crop(image_padded, k, bi, bj, window):
    """Slice a (window, window, C) crop — from one (H, W, C) image or, when
    ``image_padded`` is a (S, H, W, C) stack, from image ``k`` (the stacked
    mode serving the cross-pair streaming refiner)."""
    nch = image_padded.shape[-1]
    if image_padded.ndim == 4:
        return jax.lax.dynamic_slice(
            image_padded, (k, bi, bj, 0), (1, window, window, nch)
        )[0].astype(jnp.float32)
    return jax.lax.dynamic_slice(
        image_padded, (bi, bj, 0), (window, window, nch)
    ).astype(jnp.float32)


def extract_patches_separable(
    image_padded: jnp.ndarray,
    ij: jnp.ndarray,
    patch_size: int = PATCH_SIZE,
    window: int = None,
    img_idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """MXU-friendly patch extraction: per-patch crop + two banded matmuls.

    Bilinear sampling on the reference's patch grid is separable: with the
    grid spacing ps/(ps-1), a patch is R @ crop @ C^T where ``crop`` is an
    integer-aligned window around the keypoint and R/C are (ps, window)
    interpolation matrices depending only on the center's fractional part.
    This replaces ~4*ps^2 element gathers per patch with one contiguous
    window slice and two small batched matmuls.

    ``image_padded`` must already include a reflection margin large enough
    that every window is in bounds (see TwoViewRefiner); ``ij`` are centers
    in the padded image's coordinates.  When ``image_padded`` is a
    (S, H, W, C) stack, ``img_idx`` (N,) selects the source image per
    patch.  Returns (N, ps, ps, C) float32.
    """
    if window is None:
        # Row span is ps * ps/(ps-1) ~ ps+1.03; +1 sub-integer base offset
        # +1 bilinear upper tap => ps+4 guarantees in-window taps.
        window = patch_size + 4
    offs = jnp.linspace(-patch_size / 2.0, patch_size / 2.0, patch_size)
    h, w = image_padded.shape[-3], image_padded.shape[-2]

    def weights(center, axis_size):
        # Absolute sample coords along one axis and their integer window.
        pos = center + offs                       # (ps,)
        base = jnp.floor(pos[0]).astype(jnp.int32)
        # Keep the window in bounds; out-of-window taps lose weight (only
        # reachable when a query overruns the reflection margin).
        base = jnp.clip(base, 0, axis_size - window)
        rel = pos - base.astype(pos.dtype)
        # Bilinear tap weights as a broadcast hat function — no scatter:
        # column c gets weight max(0, 1 - |rel - c|).
        cols = jnp.arange(window, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, None] - cols[None, :]))
        return base, w

    def one_patch(center, k):
        bi, wi = weights(center[0], h)
        bj, wj = weights(center[1], w)
        crop = _window_crop(image_padded, k, bi, bj, window)
        tmp = jnp.einsum("rw,wvc->rvc", wi, crop)
        return jnp.einsum("qv,rvc->rqc", wj, tmp)

    if img_idx is not None:
        return jax.vmap(one_patch)(ij.astype(jnp.float32), img_idx)
    return jax.vmap(one_patch, in_axes=(0, None))(ij.astype(jnp.float32), 0)


def extract_patch_grid_separable(
    image_padded: jnp.ndarray,
    ij: jnp.ndarray,
    grid_step: int,
    patch_size: int = PATCH_SIZE,
    img_idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """All 9 patches of the 3x3 (+-grid_step px) offset grid per center from
    ONE crop and two banded matmuls.

    The fine refinement pass needs a patch at every (di, dj) offset with
    di, dj in {-g, 0, +g} around each center
    (reference: two-view-refinement/refinement.py:83-97).  Because the grid
    offsets are integer, the 3 row-shifted interpolation stencils share one
    crop window: stacking them into a (3*ps, W) row matrix R and a (3*ps, W)
    column matrix C makes R @ crop @ C^T a (3*ps, 3*ps) block matrix whose
    (a, b) block is the patch at offset (row_shift_a, col_shift_b) — all 9
    patches from one gather instead of nine (9x fewer HBM gathers, and the
    arithmetic runs on the MXU).

    Returns (N, 9, ps, ps, C) float32, offset-major in meshgrid-ij order.
    """
    window = patch_size + 4 + 2 * grid_step
    offs = jnp.linspace(-patch_size / 2.0, patch_size / 2.0, patch_size)
    shifts = jnp.asarray([-float(grid_step), 0.0, float(grid_step)])
    cols = jnp.arange(window, dtype=jnp.float32)

    def weights(center, axis_size):
        pos0 = center + shifts[0] + offs[0]
        base = jnp.clip(jnp.floor(pos0).astype(jnp.int32), 0, axis_size - window)
        # (3, ps) absolute positions -> (3*ps, W) stacked hat weights.
        rel = (center + shifts[:, None] + offs[None, :]).reshape(-1) - base
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, None] - cols[None, :]))
        return base, w

    nch = image_padded.shape[-1]
    h, w = image_padded.shape[-3], image_padded.shape[-2]

    def one(center, k):
        bi, wi = weights(center[0], h)
        bj, wj = weights(center[1], w)
        crop = _window_crop(image_padded, k, bi, bj, window)
        tmp = jnp.einsum("rw,wvc->rvc", wi, crop)
        out = jnp.einsum("qv,rvc->rqc", wj, tmp)  # (3ps, 3ps, C)
        out = out.reshape(3, patch_size, 3, patch_size, nch)
        return jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(
            9, patch_size, patch_size, nch
        )

    if img_idx is not None:
        return jax.vmap(one)(ij.astype(jnp.float32), img_idx)
    return jax.vmap(one, in_axes=(0, None))(ij.astype(jnp.float32), 0)


def extract_crops_unit(
    image_padded: jnp.ndarray,
    ij: jnp.ndarray,
    crop_size: int,
    img_idx: jnp.ndarray = None,
) -> jnp.ndarray:
    """Unit-lattice bilinear crops: ``crop_size`` samples at exactly 1 px
    spacing, centered on each (i, j).

    Unlike the reference patch grid (spacing ps/(ps-1),
    reference: refinement.py:12-30), a unit lattice makes every
    integer-offset sub-window of the crop an exact slice — the property the
    crop-feature fine pass needs to run the CNN backbone once per 65 px
    crop and serve all nine +-16 px grid patches from feature-map slices.
    Same separable crop+matmul formulation as
    :func:`extract_patches_separable`.  Returns (N, cs, cs, C) float32.
    """
    window = crop_size + 2
    offs = jnp.arange(crop_size, dtype=jnp.float32) - (crop_size - 1) / 2.0
    cols = jnp.arange(window, dtype=jnp.float32)

    def weights(center, axis_size):
        pos = center + offs
        base = jnp.clip(jnp.floor(pos[0]).astype(jnp.int32), 0, axis_size - window)
        rel = pos - base.astype(pos.dtype)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, None] - cols[None, :]))
        return base, w

    h, w = image_padded.shape[-3], image_padded.shape[-2]

    def one(center, k):
        bi, wi = weights(center[0], h)
        bj, wj = weights(center[1], w)
        crop = _window_crop(image_padded, k, bi, bj, window)
        tmp = jnp.einsum("rw,wvc->rvc", wi, crop)
        return jnp.einsum("qv,rvc->rqc", wj, tmp)

    if img_idx is not None:
        return jax.vmap(one)(ij.astype(jnp.float32), img_idx)
    return jax.vmap(one, in_axes=(0, None))(ij.astype(jnp.float32), 0)


#: Reflection margin added around images for the separable fast path; must
#: exceed the largest patch half-extent used anywhere (fine pass: 16.5*2 +
#: 16 grid + 1 ~ 50 px on the 2x image).
REFLECT_MARGIN = 96


def reflect_pad_image(image, margin: int = REFLECT_MARGIN):
    """Host-side reflect-101 padding (matches align-corners reflection for
    queries within the margin).  The margin is capped below the image size
    (numpy reflect constraint); callers should use ``effective_margin``."""
    import numpy as np

    margin = int(min(margin, image.shape[0] - 1, image.shape[1] - 1))
    return np.pad(image, ((margin, margin), (margin, margin), (0, 0)), mode="reflect")


def effective_margin(image, margin: int = REFLECT_MARGIN) -> int:
    return int(min(margin, image.shape[0] - 1, image.shape[1] - 1))


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
