"""Local real-image corpus discovery for self-supervised patch training.

The reference never released training data (reference: README.md:200), and
this machine has no network egress, so the training corpus is assembled
from real photographs and textures bundled with installed packages
(scikit-learn's sample photos, matplotlib's grace_hopper, pygame's photo
docs, labmaze's game textures).  Patch diversity comes from sampling
thousands of crop locations, scales, and warps per image.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

#: Real photographs (preferred: natural image statistics).
_PHOTO_CANDIDATES = [
    "sklearn/datasets/images/china.jpg",
    "sklearn/datasets/images/flower.jpg",
    "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    "pygame/docs/generated/_images/intro_freedom.jpg",
    "pygame/docs/generated/_images/intro_blade.jpg",
    "pygame/docs/generated/_images/camera_average.jpg",
    "pygame/docs/generated/_images/camera_rgb.jpg",
    "pygame/docs/generated/_images/camera_background.jpg",
]

#: Textured surfaces (game assets; structured detail, not sky gradients).
_TEXTURE_GLOBS = [
    "labmaze/assets/style_*/*_d.png",
    "labmaze/assets/style_*/*_m.png",
]


def _site_packages() -> List[str]:
    import sklearn

    return [os.path.dirname(os.path.dirname(sklearn.__file__))]


def discover_local_images(include_textures: bool = True) -> List[str]:
    """Paths of locally available real images, photos first."""
    roots = _site_packages()
    found: List[str] = []
    for root in roots:
        for rel in _PHOTO_CANDIDATES:
            p = os.path.join(root, rel)
            if os.path.exists(p):
                found.append(p)
        if include_textures:
            for pattern in _TEXTURE_GLOBS:
                found.extend(sorted(glob.glob(os.path.join(root, pattern))))
    return found


def load_corpus(
    max_images: Optional[int] = None,
    min_size: int = 128,
    include_textures: bool = True,
    exclude: Optional[List[str]] = None,
) -> List[np.ndarray]:
    """Load the corpus as float32 RGB arrays.

    ``exclude``: substrings of paths to hold out (e.g. for validation).
    """
    import cv2

    images = []
    for path in discover_local_images(include_textures):
        if exclude and any(e in path for e in exclude):
            continue
        img = cv2.imread(path)
        if img is None or min(img.shape[:2]) < min_size:
            continue
        images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32))
        if max_images and len(images) >= max_images:
            break
    return images
