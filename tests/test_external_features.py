"""External-method feature files flow through the match-graph pipeline.

The reference documents an npz contract for out-of-repo extractors
(D2-Net 512-D, SuperPoint 256-D, R2D2 128-D, Key.Net; reference:
README.md:65-91, 155-158): `keypoints` (N x 2..4, x/y first) and
L2-normalized `descriptors` (N x D).  The framework must accept any D and
any keypoint column count through matching + refinement + proto encode.
"""

import os

import numpy as np
import pytest

from lfr_tpu.config import get_method
from lfr_tpu.io import features as features_io
from lfr_tpu.io import protos
from lfr_tpu.pipelines import match_graph
from lfr_tpu.utils import synthetic


def _make_scene(tmp_path, method_name, descriptor_dim, kp_cols):
    import cv2

    rng = np.random.default_rng(3)
    scene, images = synthetic.planar_scene(
        rng, num_points=400, num_cameras=2, width=200, height=160
    )
    image_dir = tmp_path / "images"
    image_dir.mkdir()
    names = []
    for i, img in enumerate(images):
        name = f"im{i}.png"
        cv2.imwrite(str(image_dir / name), img[:, :, ::-1])
        names.append(name)

    # Shared per-point unit descriptors => MNN recovers correspondences.
    base = rng.standard_normal((scene.points.shape[0], descriptor_dim)).astype(
        np.float32
    )
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    for i, name in enumerate(names):
        xy = scene.observations[i]
        vis = scene.visible[i]
        kp = np.zeros((int(vis.sum()), kp_cols), dtype=np.float32)
        kp[:, :2] = xy[vis]
        if kp_cols > 2:
            kp[:, 2] = 1.0  # scale
        desc = base[vis] + 0.02 * rng.standard_normal((int(vis.sum()), descriptor_dim))
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        desc = desc.astype(np.float32)
        # The reference writes npz payloads to extension-less `.{method}`
        # paths (reference: extract_features_surf.py:79-85): savez on an
        # open handle, so numpy cannot append ".npz".
        with open(image_dir / f"{name}.{method_name}", "wb") as fh:
            np.savez(
                fh,
                keypoints=kp,
                scores=np.ones(kp.shape[0], dtype=np.float32),
                descriptors=desc,
            )
    with open(tmp_path / "match-list.txt", "w") as fh:
        fh.write(f"{names[0]} {names[1]}\n")
    return str(image_dir), str(tmp_path / "match-list.txt")


@pytest.mark.parametrize(
    "method_name,descriptor_dim,kp_cols",
    [("superpoint", 256, 2), ("d2-net", 512, 3), ("keynet", 128, 4)],
)
def test_external_npz_through_match_graph(tmp_path, method_name, descriptor_dim, kp_cols):
    image_dir, mlist = _make_scene(tmp_path, method_name, descriptor_dim, kp_cols)
    method = get_method(method_name)
    out = str(tmp_path / "matches.pb")
    written = match_graph.compute_match_graph(
        image_dir, mlist, method, out, skip_refinement=True, progress=False
    )
    pairs = []
    for f in written:
        pairs.extend(protos.read_matching_file(f))
    assert len(pairs) == 1
    assert pairs[0].matches.shape[0] >= 20  # MNN recovered correspondences
    # Displacement grids are zero under SKIP_REFINEMENT.
    assert np.all(pairs[0].disp1 == 0) and np.all(pairs[0].disp2 == 0)


def test_load_features_pads_keypoint_columns(tmp_path):
    """N x 2 keypoints complete to the 4-column (x, y, scale, ori) form."""
    with open(tmp_path / "a.png.superpoint", "wb") as fh:
        np.savez(fh, keypoints=np.array([[3.0, 4.0]], dtype=np.float32),
                 descriptors=np.eye(1, 256, dtype=np.float32))
    fs = features_io.load_features(str(tmp_path / "a.png"), "superpoint")
    comp = fs.completed_keypoints()
    assert comp.shape == (1, 4)
    assert comp[0, 2] == 1.0 and comp[0, 3] == 0.0
