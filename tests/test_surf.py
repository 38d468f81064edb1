"""SURF extractor tests.

No cv2.xfeatures2d oracle exists in this environment, so correctness is
pinned by construction + invariance properties: box-filter responses vs a
brute-force integral-sum oracle, blob detection at the right location and
scale, rotation handling in orientation + descriptors, and cross-image
matching under a known shift.
"""

import numpy as np
import pytest

from lfr_tpu.ops import surf


def test_integral_image_box_sums():
    rng = np.random.default_rng(0)
    img = rng.random((40, 50)).astype(np.float32)
    import jax.numpy as jnp

    ii = np.asarray(surf.integral_image(jnp.asarray(img)))
    for (y0, x0, y1, x1) in [(0, 0, 40, 50), (3, 5, 17, 22), (10, 10, 11, 11)]:
        expect = img[y0:y1, x0:x1].sum()
        got = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
        np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_det_hessian_map_matches_bruteforce():
    rng = np.random.default_rng(1)
    img = (rng.random((64, 64)) * 255).astype(np.float32)
    import jax.numpy as jnp

    ii_np = np.asarray(surf.integral_image(jnp.asarray(img)))
    pad = 60
    ii_pad = np.pad(ii_np, ((0, pad), (0, pad)), mode="edge")
    size, stride = 15, 1
    gh = (64 - 9) // stride + 1
    gw = gh
    m = np.asarray(
        surf.det_hessian_map(jnp.asarray(ii_pad), size, stride, gh, gw)
    )

    def box(y0, x0, y1, x1):
        return ii_np[y1, x1] - ii_np[y0, x1] - ii_np[y1, x0] + ii_np[y0, x0]

    for gy, gx in [(0, 0), (7, 11), (20, 33)]:
        vals = {}
        for name, pattern in [
            ("dx", surf._DX_BOXES), ("dy", surf._DY_BOXES), ("dxy", surf._DXY_BOXES)
        ]:
            acc = 0.0
            for sx0, sy0, sx1, sy1, w in surf._scaled_boxes(pattern, size):
                acc += w * box(gy + sy0, gx + sx0, gy + sy1, gx + sx1)
            vals[name] = acc
        expect = vals["dx"] * vals["dy"] - 0.81 * vals["dxy"] ** 2
        np.testing.assert_allclose(m[gy, gx], expect, rtol=1e-4, atol=1e-3)


def _blob_image(h=200, w=200, cx=100, cy=100, sigma=6.0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 200.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma**2))
    return img.astype(np.float32)


def test_detects_blob_at_correct_location_and_scale():
    img = _blob_image(sigma=6.0)
    kps, scores, desc = surf.extract_surf(img, threshold=100.0)
    assert kps.shape[0] >= 1
    best = np.argmax(scores)
    x, y, size, _ = kps[best]
    assert abs(x - 100) < 2.5 and abs(y - 100) < 2.5
    # SURF scale s = 1.2*size/9 should track the blob sigma (loose band).
    s = 1.2 * size / 9.0
    assert 3.0 < s < 12.0
    assert desc.shape == (kps.shape[0], 128)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-5)


def test_scale_tracks_blob_size():
    s_small = None
    s_big = None
    for sigma, store in [(4.0, "small"), (8.0, "big")]:
        kps, scores, _ = surf.extract_surf(_blob_image(sigma=sigma), threshold=50.0)
        best = np.argmax(scores)
        if store == "small":
            s_small = kps[best, 2]
        else:
            s_big = kps[best, 2]
    assert s_big > s_small * 1.4, (s_small, s_big)


def test_orientation_follows_gradient_rotation():
    """A step edge rotated by 90 degrees rotates the dominant angle."""
    h = w = 120
    base = np.zeros((h, w), np.float32)
    base[:, 60:] = 200.0  # vertical edge: gradient along +x
    import jax.numpy as jnp

    ii = surf.integral_image(jnp.asarray(base))
    xy = jnp.asarray([[60.0, 60.0]], jnp.float32)
    scale = jnp.asarray([2.0], jnp.float32)
    th_x = float(np.asarray(surf._orientations(ii, xy, scale))[0])
    assert abs(((th_x + np.pi) % (2 * np.pi)) - np.pi) < 0.2  # ~0 rad (+x)

    rot = base.T.copy()  # horizontal edge: gradient along +y (image down)
    ii_r = surf.integral_image(jnp.asarray(rot))
    th_y = float(np.asarray(surf._orientations(ii_r, xy, scale))[0])
    # +y image gradient = -90 deg in the from-+x-toward--y convention.
    assert abs(th_y - (-np.pi / 2)) < 0.2 or abs(th_y - 1.5 * np.pi) < 0.2


def test_descriptor_rotation_invariance():
    """Descriptors of a pattern and its rotated copy (with angle from the
    orientation stage) should match closely."""
    import cv2

    rng = np.random.default_rng(5)
    img = (rng.random((60, 60)) * 255).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    big = np.zeros((240, 240), np.float32)
    big[90:150, 90:150] = img

    deg = 40.0
    M = cv2.getRotationMatrix2D((120, 120), deg, 1.0)
    rot = cv2.warpAffine(big, M, (240, 240))

    import jax.numpy as jnp

    xy = jnp.asarray([[120.0, 120.0]], jnp.float32)
    scale = jnp.asarray([3.0], jnp.float32)

    ii_a = surf.integral_image(jnp.asarray(big))
    ii_b = surf.integral_image(jnp.asarray(rot))
    th_a = surf._orientations(ii_a, xy, scale)
    th_b = surf._orientations(ii_b, xy, scale)
    d_a = np.asarray(surf._descriptors(ii_a, xy, scale, th_a))[0]
    d_b = np.asarray(surf._descriptors(ii_b, xy, scale, th_b))[0]
    assert float(d_a @ d_b) > 0.75, float(d_a @ d_b)


def test_cross_image_matching_under_shift():
    """Features of a shifted copy should MNN-match at the shift offset."""
    from lfr_tpu.ops import matchers
    from lfr_tpu.utils import synthetic

    rng = np.random.default_rng(7)
    img = synthetic.textured_image(rng, 240, 300)
    if img.ndim == 3:
        img = img @ np.array([0.114, 0.587, 0.299])
    img = img.astype(np.float32)
    dx, dy = 7, -4
    shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)

    kp1, s1, d1 = surf.extract_surf(img, threshold=200.0)
    kp2, s2, d2 = surf.extract_surf(shifted, threshold=200.0)
    assert kp1.shape[0] > 10 and kp2.shape[0] > 10

    m, sims = matchers.match(d1, d2, "ratio", 0.8)
    assert m.shape[0] >= 6, m.shape
    delta = kp2[m[:, 1], :2] - kp1[m[:, 0], :2]
    err = np.linalg.norm(delta - np.array([dx, dy]), axis=1)
    # Most matches should agree with the planted shift.
    assert np.median(err) < 1.5, np.median(err)
