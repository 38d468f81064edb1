"""Feature extraction CLI: images directory -> per-image npz feature files.

The in-framework counterpart of the reference's extraction scripts
(reference: utils/extract_features_sift.py:34-141,
utils/extract_features_surf.py:14-85): images are capped at ``max_edge``,
features extracted on device, and keypoints rescaled to original-image
coordinates before writing the npz contract files.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
from typing import Callable, Dict

import numpy as np

from ..io import features as features_io
from ..io import images as images_io

EXTRACTORS: Dict[str, Callable] = {}


def register_extractor(name: str):
    def wrap(fn):
        EXTRACTORS[name] = fn
        return fn

    return wrap


@register_extractor("sift")
def _sift(image: np.ndarray, max_features: int):
    from ..ops.sift import extract_sift

    return extract_sift(image, max_features=max_features)


def _sift_dispatch(image, max_features):
    from ..ops.sift import dispatch_sift

    return dispatch_sift(image, max_features=max_features)


def _sift_collect(handle):
    from ..ops.sift import collect_sift

    return collect_sift(handle)


_sift.dispatch = _sift_dispatch
_sift.collect = _sift_collect


@register_extractor("surf")
def _surf(image: np.ndarray, max_features: int):
    """Real SURF: box-filter det-of-Hessian + Haar extended descriptors
    (reference: utils/extract_features_surf.py:37-58)."""
    from ..ops.surf import extract_surf

    return extract_surf(image, max_features=max_features)


#: The reference rescales only x, y for SURF — size/angle stay at the
#: extraction resolution (extract_features_surf.py:66-69); SIFT rescales
#: its scale column too (extract_features_sift.py:79-111).
_surf.scale_column = False


@register_extractor("doh")
def _doh(image: np.ndarray, max_features: int):
    """Gaussian det-of-Hessian blobs with SIFT-style descriptors — kept as
    an alternative detector under its honest name (it filled the surf slot
    before the real SURF landed)."""
    from ..ops.doh import extract_doh

    return extract_doh(image, max_features=max_features)


def _doh_dispatch(image, max_features):
    from ..ops.doh import dispatch_doh

    return dispatch_doh(image, max_features=max_features)


def _doh_collect(handle):
    from ..ops.doh import collect_doh

    return collect_doh(handle)


_doh.dispatch = _doh_dispatch
_doh.collect = _doh_collect


def extract_directory(
    image_path: str,
    method_name: str,
    max_edge: int = 1600,
    max_features: int = 4096,
    output_extension: str = None,
    verbose: bool = True,
) -> int:
    """Extract features for all images; returns the image count."""
    extractor = EXTRACTORS.get(method_name)
    if extractor is None:
        raise ValueError(
            f"no extractor registered for {method_name!r}; available: {sorted(EXTRACTORS)}"
        )
    ext = (output_extension or f".{method_name}").lstrip(".")
    dispatch = getattr(extractor, "dispatch", None)
    collect = getattr(extractor, "collect", None)

    def finish(name, path, h, w, factor, keypoints, scores, descriptors):
        # Back to original-image coordinates
        # (reference: extract_features_surf.py:66-69).
        keypoints = keypoints.copy()
        keypoints[:, :2] *= factor
        if keypoints.shape[1] > 2 and getattr(extractor, "scale_column", True):
            keypoints[:, 2] *= factor
        features_io.save_features(path, keypoints, descriptors, scores, method_name=ext)
        if verbose:
            print(
                f"[{name}] {h}x{w}, factor {factor:.4f}; {keypoints.shape[0]} keypoints",
                file=sys.stderr,
                flush=True,
            )

    count = 0
    pending = collections.deque()  # (name, path, h, w, factor, handle)
    # Recursive discovery: real datasets nest images (ETH3D undistorted
    # archives put them under images/dslr_images_undistorted/, and the
    # GT model names them with that prefix — eth/download.sh layout);
    # names stay relative so features land next to each image.
    names = []
    for dirpath, dirnames, filenames in os.walk(image_path):
        dirnames.sort()
        rel = os.path.relpath(dirpath, image_path)
        for fn in sorted(filenames):
            names.append(fn if rel == "." else os.path.join(rel, fn))
    for name in names:
        path = os.path.join(image_path, name)
        try:
            image = images_io.load_image_rgb(path)
        except Exception:
            continue
        h, w = image.shape[:2]
        factor = max(1.0, max(h, w) / max_edge)
        small = images_io.resize_by_factor(image, factor)
        count += 1

        if dispatch is None:
            finish(name, path, h, w, factor, *extractor(small, max_features))
            continue
        # Pipelined path: dispatch image N+1 before syncing image N, so
        # host decode/npz IO and the device-link round trips overlap.
        pending.append((name, path, h, w, factor, dispatch(small, max_features)))
        if len(pending) >= 3:
            rec = pending.popleft()
            finish(*rec[:5], *collect(rec[5]))
    while pending:
        rec = pending.popleft()
        finish(*rec[:5], *collect(rec[5]))
    return count


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="TPU-native feature extraction")
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--method_name", required=True, choices=sorted(EXTRACTORS))
    parser.add_argument("--max_edge", type=int, default=1600)
    parser.add_argument("--max_features", type=int, default=4096)
    parser.add_argument("--output_extension", default=None)
    args = parser.parse_args(argv)
    extract_directory(
        args.image_path,
        args.method_name,
        args.max_edge,
        args.max_features,
        args.output_extension,
    )


if __name__ == "__main__":
    main()
