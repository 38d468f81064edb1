"""Refined-vs-raw A/B with the TRAINED flow CNN on HELD-OUT photo scenes.

The accuracy north star (reference protocol: held-out scenes,
eth/benchmark.py:114-149, README.md:104-115): run the full match ->
refine -> solve -> import -> triangulate -> evaluate chain twice
(refined and raw) on multi-view datasets whose images are REAL
PHOTOGRAPHS rendered from an arc of cameras (this host has no network
egress, so locally bundled photos stand in for downloaded benchmark
scenes), using the checkpoint trained on the real image corpus — no
oracle aligner anywhere.

LEAK-FREE SPLIT: every photo evaluated here (china, flower,
grace_hopper) is excluded from training by default
(lfr_tpu.models.train.DEFAULT_HOLDOUT), and the scene set includes an
OCCLUSION scene (textured slabs over a background plane, patches
straddling depth discontinuities, per-view exposure jitter) — the hard
case the planar scenes cannot probe.

Writes results/ab_real.json and prints a markdown table.

Usage: python scripts/ab_realistic.py [--checkpoint weights/panet_holdout.msgpack]
       [--out results/ab_real.json] [--noise 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="weights/panet_holdout.msgpack")
    ap.add_argument("--out", default="results/ab_real.json")
    ap.add_argument("--noise", type=float, default=2.0,
                    help="keypoint noise (px) planted on the raw features")
    ap.add_argument("--num_cameras", type=int, default=4)
    ap.add_argument("--num_points", type=int, default=120)
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--fine_mode",
        default="grid",
        choices=["grid", "crop"],
        help="fine-pass formulation for the refiner (crop = TPU-fast)",
    )
    ap.add_argument(
        "--sfm",
        action="store_true",
        help="also run the full-SfM (incremental mapper) refined-vs-raw A/B",
    )
    args = ap.parse_args()

    import tempfile

    from lfr_tpu.pipelines import benchmark
    from lfr_tpu.utils import synthetic
    from lfr_tpu.utils.corpus import load_corpus

    from lfr_tpu.models.train import DEFAULT_HOLDOUT
    from lfr_tpu.utils.corpus import discover_local_images

    # The held-out photos, by name (training excludes exactly these).
    paths = discover_local_images(include_textures=False)
    held_paths = [p for p in paths if any(h in p for h in DEFAULT_HOLDOUT)]
    if len(held_paths) < 3:
        raise SystemExit(f"expected 3 held-out photos, found {held_paths}")
    import cv2

    held = [
        cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32)
        for p in held_paths
    ]
    scenes = {os.path.basename(p).split(".")[0]: img for p, img in zip(held_paths, held)}
    scenes["occlusion"] = None  # layered scene built from the held-out photos

    workdir = args.workdir or tempfile.mkdtemp(prefix="lfr_ab_")
    all_results = {}
    rows = []
    for name, photo in scenes.items():
        rng = np.random.default_rng(hash(name) % (2**32))
        if name == "occlusion":
            scene, images = synthetic.layered_scene(
                rng,
                num_points=args.num_points,
                num_cameras=args.num_cameras,
                width=480,
                height=360,
                textures=held,
                exposure_jitter=0.12,
            )
            mesh = synthetic.layered_surface_mesh()
        else:
            scene, images = synthetic.planar_scene(
                rng,
                num_points=args.num_points,
                num_cameras=args.num_cameras,
                width=480,
                height=360,
                texture=photo,
                # Depth relief keeps E-based SfM init non-degenerate.
                depth_step=0.5 if args.sfm else 0.0,
            )
            mesh = synthetic.planar_surface_mesh(
                depth_step=0.5 if args.sfm else 0.0
            )
        root = os.path.join(workdir, name)
        synthetic.make_eth3d_dataset(
            root,
            scene,
            rng,
            keypoint_noise_px=args.noise,
            rendered_images=images,
            # Triangulated GT surface: accuracy measures distance to the
            # SURFACE (like the official ETH3D evaluator), not to sparse
            # GT vertices.
            scan_mesh=mesh,
        )
        results = benchmark.run_eth(
            root,
            "sift",
            output_path=os.path.join(workdir, "out_" + name),
            checkpoint=args.checkpoint,
            verbose=False,
            fine_mode=args.fine_mode,
        )
        raw_t = results["raw"]["triangulation"]
        ref_t = results["ref"]["triangulation"]
        raw_e = results["raw"]["evaluation"]
        ref_e = results["ref"]["evaluation"]
        all_results[name] = {
            "raw": {"triangulation": raw_t, "evaluation": raw_e},
            "ref": {"triangulation": ref_t, "evaluation": ref_e},
        }
        if args.sfm:
            # The triangulation A/B already wrote its per-run DBs into
            # ``root``; the SfM A/B gets a pristine copy of the dataset.
            import shutil

            root_sfm = root + "_sfm"
            shutil.copytree(
                root,
                root_sfm,
                ignore=shutil.ignore_patterns("sift-*.db", "sparse-*", "*.ply"),
            )
            sfm_results = benchmark.run_sfm(
                root_sfm,
                "sift",
                output_path=os.path.join(workdir, "out_sfm_" + name),
                checkpoint=args.checkpoint,
                verbose=False,
                fine_mode=args.fine_mode,
            )
            all_results[name]["sfm"] = {
                "raw": sfm_results["raw"],
                "ref": sfm_results["ref"],
            }
        rows.append(
            (
                name,
                raw_t["mean_reproj_error"], ref_t["mean_reproj_error"],
                raw_e["accuracies"][0], ref_e["accuracies"][0],
                raw_e["accuracies"][1], ref_e["accuracies"][1],
                raw_t["num_sparse_points"], ref_t["num_sparse_points"],
            )
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    payload = {
        "checkpoint": args.checkpoint,
        "fine_mode": args.fine_mode,
        "keypoint_noise_px": args.noise,
        "training_holdout": list(DEFAULT_HOLDOUT),
        "split": (
            "every evaluated photo is excluded from CNN training "
            "(leak-free); 'occlusion' is a layered scene with depth "
            "discontinuities and per-view exposure jitter"
        ),
        "scenes": all_results,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)

    print("\n| scene | reproj raw | reproj ref | acc@1cm raw | acc@1cm ref "
          "| acc@2cm raw | acc@2cm ref | points raw | points ref |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[0]} | {r[1]:.3f} | {r[2]:.3f} | {r[3]:.3f} | {r[4]:.3f} "
            f"| {r[5]:.3f} | {r[6]:.3f} | {r[7]} | {r[8]} |"
        )
    if args.sfm:
        print("\nFull SfM (incremental mapper) refined vs raw:")
        print("| scene | reproj raw | reproj ref | reg raw | reg ref "
              "| points raw | points ref | track raw | track ref |")
        print("|---|---|---|---|---|---|---|---|---|")
        for name in all_results:
            s = all_results[name].get("sfm")
            if not s:
                continue
            a, b = s["raw"]["reconstruction"], s["ref"]["reconstruction"]
            print(
                f"| {name} | {a['mean_reproj_error']:.3f} | "
                f"{b['mean_reproj_error']:.3f} | {a['num_reg_images']} | "
                f"{b['num_reg_images']} | {a['num_sparse_points']} | "
                f"{b['num_sparse_points']} | {a['mean_track_length']:.2f} | "
                f"{b['mean_track_length']:.2f} |"
            )
    print(f"\nwrote {args.out} (workdir {workdir})")


if __name__ == "__main__":
    main()
