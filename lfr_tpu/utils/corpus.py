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
    # Simulation-suite material scans: wood grain, marble, tile, brushed
    # metal, foil, skin — real-surface statistics at high resolution.
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/*.png",
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/*.png",
    # Outdoor ground/sky scans (vegetation-like spectra) + organic skins.
    "dm_control/locomotion/arenas/assets/outdoor_natural/*.png",
    "dm_control/suite/dog_assets/skin_texture.png",
    "dm_control/locomotion/soccer/assets/humanoid/B_01.png",
    "dm_control/locomotion/soccer/assets/humanoid/B_07.png",
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


def _octave_noise(rng: np.random.Generator, size: int, octaves: int = 6,
                  persistence: float = 0.55) -> np.ndarray:
    """Multi-octave value noise in [0, 1] (fractal surface detail)."""
    out = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        n = max(2, 2 ** (o + 2))
        if n > size:
            break
        coarse = rng.standard_normal((n, n)).astype(np.float32)
        # Bilinear upsample to full resolution.
        yi = np.linspace(0, n - 1, size)
        xi = np.linspace(0, n - 1, size)
        y0 = np.clip(yi.astype(int), 0, n - 2)
        x0 = np.clip(xi.astype(int), 0, n - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        up = (
            coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
            + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
            + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx
        )
        out += amp * up
        total += amp
        amp *= persistence
    out /= max(total, 1e-6)
    out -= out.min()
    return out / max(np.ptp(out), 1e-6)


def _spectral_texture(rng: np.random.Generator, size: int, alpha: float) -> np.ndarray:
    """1/f^alpha random-phase texture in [0, 1] (natural-image spectra;
    alpha ~1.8-2.2 matches vegetation/terrain photographs)."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec = (f ** (-alpha / 2.0)) * np.exp(
        2j * np.pi * rng.random((size, fx.shape[1]))
    )
    spec[0, 0] = 0.0
    img = np.fft.irfft2(spec, s=(size, size)).astype(np.float32)
    img -= img.min()
    return img / max(np.ptp(img), 1e-6)


def _voronoi_texture(rng: np.random.Generator, size: int, cells: int) -> np.ndarray:
    """Voronoi cell mosaic in [0, 1] (masonry / shattered-surface edges)."""
    pts = rng.random((cells, 2)) * size
    shades = rng.random(cells).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    d = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    lab = np.argmin(d, axis=-1)
    return shades[lab]


def _text_texture(rng: np.random.Generator, size: int) -> Optional[np.ndarray]:
    """Dense random glyph rendering in [0, 1] (signage/print statistics:
    high-contrast corners and strokes at a characteristic scale)."""
    try:
        from PIL import Image, ImageDraw, ImageFont
    except ImportError:
        return None
    img = Image.new("L", (size, size), int(rng.integers(180, 256)))
    draw = ImageDraw.Draw(img)
    font = ImageFont.load_default()
    glyphs = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcdefghijkmnopqrstuvwxyz"
    for _ in range(size * size // 220):
        x = int(rng.integers(0, size))
        y = int(rng.integers(0, size))
        s = "".join(rng.choice(list(glyphs), rng.integers(1, 8)))
        draw.text((x, y), s, fill=int(rng.integers(0, 90)), font=font)
    return np.asarray(img, np.float32) / 255.0


def procedural_textures(
    rng: np.random.Generator, count: int = 24, size: int = 512
) -> List[np.ndarray]:
    """Procedurally generated training textures (float32 RGB, [0, 255]).

    Families cycle through fractal octave noise, 1/f^alpha spectra
    (vegetation/terrain-like), Voronoi mosaics, and dense text — surface
    statistics the bundled-photo corpus is thin on.  Each sample gets a
    random 3-channel colorization so conv1 sees varied chroma.
    """
    out: List[np.ndarray] = []
    kinds = ["octave", "spectral", "voronoi", "text"]
    k = 0
    while len(out) < count:
        kind = kinds[k % len(kinds)]
        k += 1
        if kind == "octave":
            g = _octave_noise(rng, size, octaves=int(rng.integers(4, 8)))
        elif kind == "spectral":
            g = _spectral_texture(rng, size, alpha=float(rng.uniform(1.4, 2.4)))
        elif kind == "voronoi":
            g = _voronoi_texture(rng, size, cells=int(rng.integers(40, 400)))
            # Soften cell interiors with a little octave detail so patches
            # inside a cell are not featureless.
            g = 0.75 * g + 0.25 * _octave_noise(rng, size, octaves=5)
        else:
            g = _text_texture(rng, size)
            if g is None:
                continue
        lo = rng.random(3) * 80.0
        hi = 170.0 + rng.random(3) * 85.0
        rgb = lo[None, None, :] + g[..., None] * (hi - lo)[None, None, :]
        out.append(rgb.astype(np.float32))
    return out


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
