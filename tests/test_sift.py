"""TPU-native SIFT tests: repeatability, invariance, cv2 cross-check."""

import numpy as np
import pytest

from lfr_tpu.ops import sift
from lfr_tpu.utils import synthetic


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return synthetic.textured_image(rng, 240, 320)


def test_extract_basics(image):
    kp, scores, desc = sift.extract_sift(image, max_features=512)
    assert kp.shape[0] > 50
    assert kp.shape[1] == 4
    assert desc.shape == (kp.shape[0], 128)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-4)
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < 320).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < 240).all()
    assert (kp[:, 2] > 0).all()
    assert (scores > 0).all()


def test_shift_repeatability():
    rng = np.random.default_rng(1)
    img1, img2 = synthetic.shifted_pair(rng, 200, 280, (5, -7))
    kp1, _, d1 = sift.extract_sift(img1, max_features=400)
    kp2, _, d2 = sift.extract_sift(img2, max_features=400)

    from lfr_tpu.ops.matchers import mnn_ratio_matcher

    m, s = mnn_ratio_matcher(d1, d2, ratio=0.8)
    assert m.shape[0] > 30
    # image2 content is image1 shifted by (di,dj)=(5,-7): x2 = x1 + 7, y2 = y1 - 5.
    delta = kp2[m[:, 1], :2] - kp1[m[:, 0], :2]
    med = np.median(delta, axis=0)
    np.testing.assert_allclose(med, [7.0, -5.0], atol=0.5)
    good = np.linalg.norm(delta - [7, -5], axis=1) < 1.5
    assert good.mean() > 0.8


def test_cv2_cross_matching(image):
    """Our descriptors must match cv2.SIFT's on the same image content."""
    cv2 = pytest.importorskip("cv2")
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    cv_sift = cv2.SIFT_create(nfeatures=400)
    cv_kp, cv_desc = cv_sift.detectAndCompute(gray, None)
    assert len(cv_kp) > 50
    cv_xy = np.array([k.pt for k in cv_kp])
    cv_desc = cv_desc / np.linalg.norm(cv_desc, axis=1, keepdims=True)

    kp, _, desc = sift.extract_sift(image, max_features=400)

    from lfr_tpu.ops.matchers import mnn_ratio_matcher

    m, _ = mnn_ratio_matcher(desc, cv_desc.astype(np.float32), ratio=0.9)
    assert m.shape[0] > 20
    # Matched pairs should be spatially coincident.
    d = np.linalg.norm(kp[m[:, 0], :2] - cv_xy[m[:, 1]], axis=1)
    assert np.median(d) < 2.0
    assert (d < 4).mean() > 0.6
