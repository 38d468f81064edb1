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
    if image.ndim == 3:
        image = image @ np.array([0.299, 0.587, 0.114])
    true_h, true_w = image.shape
    pad_h = -(-true_h // sift_mod.SIFT_IMAGE_BUCKET) * sift_mod.SIFT_IMAGE_BUCKET - true_h
    pad_w = -(-true_w // sift_mod.SIFT_IMAGE_BUCKET) * sift_mod.SIFT_IMAGE_BUCKET - true_w
    if pad_h or pad_w:
        image = np.pad(
            image,
            ((0, min(pad_h, true_h - 1)), (0, min(pad_w, true_w - 1))),
            mode="reflect",
        )
    img = jnp.asarray(image, jnp.float32) / (255.0 if image.max() > 2 else 1.0)

    h, w = img.shape
    n_octaves = max(1, int(np.log2(min(h, w) / 24.0)))

    k = 2.0 ** (1.0 / NUM_SCALES)
    sigmas = [SIGMA0 * (k**i) for i in range(NUM_SCALES + 2)]
    inc = [
        float(np.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-8)))
        for i in range(1, len(sigmas))
    ]

    all_kp, all_scores, all_desc = [], [], []
    octave_img = sift_mod._blur(img, sift_mod._gaussian_kernel(SIGMA0))
    for octave in range(n_octaves):
        gaussians = [octave_img]
        for s_inc in inc:
            gaussians.append(sift_mod._blur(gaussians[-1], sift_mod._gaussian_kernel(s_inc)))
        G = jnp.stack(gaussians)  # (S+2, H, W)
        R = jnp.stack([_det_hessian(G[i], sigmas[i]) for i in range(len(sigmas))])

        # Use the DoH stack in place of DoG for extremum detection; reuse
        # the dense candidate machinery (it expects S+2 response levels).
        scores, pos, valid = sift_mod._octave_candidates(
            G, R, top_k=max_per_octave, peak_threshold=threshold
        )
        scores = np.asarray(scores)
        pos = np.asarray(pos)
        take = np.nonzero(np.asarray(valid))[0]
        if take.size:
            lv = pos[take, 0]
            ij = pos[take, 1:3]
            sigma = SIGMA0 * (2.0 ** ((lv - 1.0) / NUM_SCALES))
            lv_round = np.clip(np.round(lv - 1).astype(int) + 1, 1, NUM_SCALES)

            theta = np.zeros(take.size)
            desc_all = np.zeros((take.size, 128), np.float32)
            for level in range(1, NUM_SCALES + 1):
                sel = lv_round == level
                if not sel.any():
                    continue
                hist = np.asarray(
                    sift_mod._orientation_histogram(
                        G[level], jnp.asarray(ij[sel]), jnp.asarray(sigma[sel])
                    )
                )
                peak = hist.argmax(axis=1)
                theta[sel] = (peak + 0.5) / sift_mod.ORI_BINS * 2 * np.pi
                desc_all[sel] = np.asarray(
                    sift_mod._descriptors(
                        G[level],
                        jnp.asarray(ij[sel]),
                        jnp.asarray(sigma[sel]),
                        jnp.asarray(theta[sel]),
                    )
                )

            mult = 2.0**octave
            kp = np.stack(
                [ij[:, 1] * mult, ij[:, 0] * mult, sigma * mult, theta], axis=1
            )
            keep = scores[take] > threshold
            all_kp.append(kp[keep])
            all_scores.append(scores[take][keep])
            all_desc.append(desc_all[keep])

        octave_img = sift_mod._downsample2(gaussians[NUM_SCALES])

    if not all_kp:
        return np.zeros((0, 4)), np.zeros(0), np.zeros((0, 128), np.float32)
    kp = np.concatenate(all_kp)
    scores = np.concatenate(all_scores)
    desc = np.concatenate(all_desc)
    inside = (kp[:, 0] < true_w - 0.5) & (kp[:, 1] < true_h - 0.5)
    kp, scores, desc = kp[inside], scores[inside], desc[inside]
    if kp.shape[0] > max_features:
        order = np.argsort(-scores)[:max_features]
        kp, scores, desc = kp[order], scores[order], desc[order]
    return kp, scores, desc.astype(np.float32)
