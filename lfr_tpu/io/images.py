"""Host-side image loading and resizing.

Mirrors the reference's preprocessing exactly: BGR->RGB, grayscale promoted
to 3 channels, INTER_AREA downscale by ``1/fact``
(reference: two-view-refinement/compute_match_graph.py:99-113).  OpenCV is
used on the host for decode + resize parity; device-resident equivalents
live in lfr_tpu.ops.image_ops.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None
    _HAS_CV2 = False

from ..config import downscale_factor


def load_image_rgb(path: str) -> np.ndarray:
    """Load an image as (H, W, 3) uint8 RGB."""
    if _HAS_CV2:
        image = cv2.imread(path)
        if image is None:
            raise FileNotFoundError(f"could not read image {path}")
        image = image[:, :, ::-1]  # BGR -> RGB
    else:
        from PIL import Image

        image = np.asarray(Image.open(path).convert("RGB"))
    if image.ndim == 2:
        image = np.repeat(image[:, :, None], 3, axis=-1)
    return np.ascontiguousarray(image)


def resize_by_factor(image: np.ndarray, fact: float) -> np.ndarray:
    """INTER_AREA resize by 1/fact (reference: compute_match_graph.py:113)."""
    if fact == 1.0:
        return image
    if _HAS_CV2:
        return cv2.resize(image, None, fx=1.0 / fact, fy=1.0 / fact, interpolation=cv2.INTER_AREA)
    from .. import ops

    h, w = image.shape[:2]
    out = ops.image_ops.area_resize(image, round(h / fact), round(w / fact))
    return np.asarray(out).astype(image.dtype)


def load_and_downscale(
    path: str, max_edge: int, max_sum_edges: int
) -> Tuple[np.ndarray, float]:
    """Load an RGB image and downscale per the method's resolution caps.

    Returns (image, fact).
    """
    image = load_image_rgb(path)
    h, w = image.shape[:2]
    fact = downscale_factor(h, w, max_edge, max_sum_edges)
    return resize_by_factor(image, fact), fact


def pyr_up(image: np.ndarray) -> np.ndarray:
    """Host 2x Gaussian upsample (reference: refinement.py:142-143)."""
    if _HAS_CV2:
        return cv2.pyrUp(image)
    from .. import ops
    import jax.numpy as jnp

    return np.asarray(ops.image_ops.pyr_up(jnp.asarray(image)))
