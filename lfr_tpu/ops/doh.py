"""Determinant-of-Hessian (SURF-style) feature extraction, TPU-native.

Fills the reference's SURF slot (reference: utils/extract_features_surf.py:
37-58, OpenCV xfeatures2d.SURF with extended 128-D descriptors): a
blob detector using the determinant of the Gaussian Hessian over a scale
pyramid, with orientation and 128-D descriptors computed by the same
batched machinery as the SIFT path (lfr_tpu.ops.sift).  Descriptors are
gradient-histogram based rather than Haar-wavelet based — equivalent in
role (L2-normalized, 128-D, matched by MNN-ratio as in the reference
config) without claiming byte compatibility with OpenCV SURF.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sift as sift_mod

#: Response threshold on |det H| (normalized images).
HESSIAN_THRESHOLD = 1e-6
NUM_SCALES = 3
SIGMA0 = 2.0


def _det_hessian(gauss: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Scale-normalized determinant of the image Hessian."""
    dxx = jnp.roll(gauss, -1, 1) + jnp.roll(gauss, 1, 1) - 2 * gauss
    dyy = jnp.roll(gauss, -1, 0) + jnp.roll(gauss, 1, 0) - 2 * gauss
    dxy = (
        jnp.roll(gauss, (-1, -1), (0, 1))
        - jnp.roll(gauss, (-1, 1), (0, 1))
        - jnp.roll(gauss, (1, -1), (0, 1))
        + jnp.roll(gauss, (1, 1), (0, 1))
    ) / 4.0
    return (dxx * dyy - dxy * dxy) * sigma**4


@functools.partial(jax.jit, static_argnames=("n_octaves", "max_per_octave", "threshold"))
def _doh_pyramid(img, n_octaves: int, max_per_octave: int, threshold: float):
    """Whole-image DoH extraction as one device program (see
    lfr_tpu.ops.sift._sift_pyramid — same fused structure, det-of-Hessian
    response stack in place of DoG)."""
    k = 2.0 ** (1.0 / NUM_SCALES)
    sigmas = [SIGMA0 * (k**i) for i in range(NUM_SCALES + 2)]
    inc = [
        float(np.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-8)))
        for i in range(1, len(sigmas))
    ]

    if jnp.issubdtype(img.dtype, jnp.integer):
        img = img.astype(jnp.float32) / 255.0
    out = []
    octave_img = sift_mod._blur(img, sift_mod._gaussian_kernel(SIGMA0))
    for octave in range(n_octaves):
        gaussians = [octave_img]
        for s_inc in inc:
            gaussians.append(sift_mod._blur(gaussians[-1], sift_mod._gaussian_kernel(s_inc)))
        G = jnp.stack(gaussians)  # (S+2, H, W)
        R = jnp.stack([_det_hessian(G[i], sigmas[i]) for i in range(len(sigmas))])
        top_k = max(256, max_per_octave >> octave)
        out.append(sift_mod._device_octave_features(G, R, top_k, threshold, SIGMA0))
        octave_img = sift_mod._downsample2(gaussians[NUM_SCALES])
    return (
        jnp.concatenate([m for m, _ in out], axis=0),
        jnp.concatenate([d for _, d in out], axis=0),
    )


def extract_doh(
    image: np.ndarray,
    max_features: int = 4096,
    max_per_octave: int = 2048,
    threshold: float = HESSIAN_THRESHOLD,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract DoH blobs + 128-D descriptors.

    Returns (keypoints (K, 4) [x, y, scale, orientation], scores,
    descriptors) in input-image pixels.
    """
    return collect_doh(dispatch_doh(image, max_features, max_per_octave, threshold))


def dispatch_doh(
    image: np.ndarray,
    max_features: int = 4096,
    max_per_octave: int = 2048,
    threshold: float = HESSIAN_THRESHOLD,
):
    """Async dispatch; see lfr_tpu.ops.sift.dispatch_sift."""
    img, true_h, true_w, n_octaves = sift_mod.prepare_image(image, min_dim=24.0)
    meta, desc = _doh_pyramid(img, n_octaves, max_per_octave, threshold)
    sizes = sift_mod.octave_sizes(n_octaves, max_per_octave)
    return meta, desc, sizes, true_h, true_w, max_features


def collect_doh(handle) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    meta, desc, sizes, true_h, true_w, max_features = handle
    return sift_mod.collect_octave_features(
        np.asarray(meta), np.asarray(desc), sizes, true_h, true_w, max_features
    )
