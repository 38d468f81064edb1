"""Refined-vs-raw A/B demonstration on a synthetic planar scene.

Builds an ETH3D-layout dataset whose images genuinely show the same
surface, perturbs the keypoints, runs the FULL pipeline twice (refined and
raw, as every reference benchmark does; reference: eth/benchmark.py:114-132)
with a trained flow-CNN checkpoint, and reports triangulation accuracy.

Usage: python scripts/demo_refinement.py --checkpoint weights/panet.msgpack \
           [--noise 1.5] [--out /tmp/demo]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--noise", type=float, default=1.5)
    parser.add_argument("--out", default=None)
    parser.add_argument("--cameras", type=int, default=4)
    parser.add_argument("--points", type=int, default=150)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()

    from lfr_tpu.utils.platform import select_platform

    select_platform(args.platform)

    from lfr_tpu.pipelines import benchmark
    from lfr_tpu.utils import synthetic

    root = args.out or tempfile.mkdtemp(prefix="lfr_demo_")
    if os.path.exists(os.path.join(root, "database.db")):
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    rng = np.random.default_rng(0)
    scene, images = synthetic.planar_scene(
        rng, num_points=args.points, num_cameras=args.cameras
    )
    synthetic.make_eth3d_dataset(
        root, scene, rng, keypoint_noise_px=args.noise, rendered_images=images
    )
    print(f"dataset: {root} ({args.cameras} cameras, {args.points} points, "
          f"{args.noise}px keypoint noise)")

    results = benchmark.run_eth(
        root,
        "sift",
        output_path=os.path.join(root, "output"),
        checkpoint=args.checkpoint,
        batch_size=args.batch_size,
        verbose=True,
    )

    for tag in ("raw", "ref"):
        ev = results[tag]["evaluation"]
        tri = results[tag]["triangulation"]
        print(
            f"[{tag}] reproj={tri['mean_reproj_error']:.3f}px "
            f"points={tri['num_sparse_points']} "
            f"acc@1cm={ev['accuracies'][0]:.3f} acc@2cm={ev['accuracies'][1]:.3f} "
            f"comp@1cm={ev['completenesses'][0]:.3f}"
        )
    imp = (
        results["ref"]["evaluation"]["accuracies"][0]
        - results["raw"]["evaluation"]["accuracies"][0]
    )
    print(f"accuracy@1cm improvement (ref - raw): {imp:+.3f}")


if __name__ == "__main__":
    main()
