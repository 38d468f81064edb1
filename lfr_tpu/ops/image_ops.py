"""Device-side image resampling: area resize and Gaussian pyramid-up.

The reference leans on OpenCV for INTER_AREA downscaling
(reference: compute_match_graph.py:113) and ``cv2.pyrUp`` 2x upsampling
(reference: refinement.py:142-143).  These JAX equivalents keep images
device-resident: area resize is expressed as two small matmuls (MXU-native),
pyr-up as a separable 5-tap convolution with reflect-101 borders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def area_resize_matrix(in_size: int, out_size: int, scale: float = None) -> np.ndarray:
    """(out_size, in_size) row-stochastic area-averaging matrix.

    Output pixel i averages input pixels over [i*s, (i+1)*s) — the
    INTER_AREA definition for arbitrary (also non-integer) scales.  ``s``
    defaults to in/out; pass the original downscale factor explicitly to
    reproduce OpenCV, which windows by the *given* factor rather than the
    ratio of rounded sizes.
    """
    s = in_size / out_size if scale is None else scale
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = i * s
        hi = (i + 1) * s
        k0 = int(np.floor(lo))
        k1 = min(int(np.ceil(hi)), in_size)
        for k in range(k0, k1):
            overlap = min(hi, k + 1) - max(lo, k)
            if overlap > 0:
                m[i, k] = overlap / s
    return m


@functools.lru_cache(maxsize=64)
def _cached_resize_matrix(in_size: int, out_size: int, scale) -> np.ndarray:
    return area_resize_matrix(in_size, out_size, scale)


@jax.jit
def _area_resize_apply(image, rh, rw):
    tmp = jnp.einsum("oh,hwc->owc", rh, image.astype(jnp.float32))
    return jnp.einsum("pw,owc->opc", rw, tmp)


def area_resize(
    image: jnp.ndarray, out_h: int, out_w: int, scale: float = None
) -> jnp.ndarray:
    """INTER_AREA-style resize of an (H, W, C) image to (out_h, out_w, C)."""
    h, w = image.shape[:2]
    rh = jnp.asarray(_cached_resize_matrix(h, out_h, scale))
    rw = jnp.asarray(_cached_resize_matrix(w, out_w, scale))
    return _area_resize_apply(image, rh, rw)


def area_resize_by_factor(image: jnp.ndarray, fact: float) -> jnp.ndarray:
    """Downscale by 1/fact with OpenCV-compatible output size (round(n/fact))
    and windowing (reference: compute_match_graph.py:113)."""
    h, w = image.shape[:2]
    return area_resize(image, int(round(h / fact)), int(round(w / fact)), scale=fact)


#: pyrUp per-axis kernel: zero-stuff then convolve [1 4 6 4 1]/8.
_PYR_EVEN = np.array([1.0, 6.0, 1.0]) / 8.0  # taps hitting even outputs
_PYR_ODD = np.array([4.0, 4.0]) / 8.0        # taps hitting odd outputs


def _pyr_up_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Upsample axis 0 by 2 with the Gaussian pyramid kernel, reflect-101."""
    n = x.shape[0]
    # Border continuation of the zero-stuffed signal under reflect-101:
    # the left edge mirrors to x[1], but on the right the trailing stuffed
    # zero makes the effective continuation x[n-1] (replicate).
    padded = jnp.concatenate([x[1:2], x, x[n - 1 : n]], axis=0)
    even = (
        _PYR_EVEN[0] * padded[:-2] + _PYR_EVEN[1] * padded[1:-1] + _PYR_EVEN[2] * padded[2:]
    )
    odd = _PYR_ODD[0] * padded[1:-1] + _PYR_ODD[1] * padded[2:]
    out = jnp.stack([even, odd], axis=1)
    return out.reshape((2 * n,) + x.shape[1:])


@jax.jit
def pyr_up(image: jnp.ndarray) -> jnp.ndarray:
    """2x Gaussian-pyramid upsampling of an (H, W, C) image -> (2H, 2W, C).

    Matches cv2.pyrUp: zero-stuffed upsampling followed by the 5x5 binomial
    kernel (x4), with reflect-101 border handling.
    """
    x = image.astype(jnp.float32)
    x = _pyr_up_axis(x)
    x = _pyr_up_axis(x.transpose(1, 0, 2))
    return x.transpose(1, 0, 2)
