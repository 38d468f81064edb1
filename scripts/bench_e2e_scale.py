"""Production-scale end-to-end benchmark: the full chain on one TPU chip.

Renders a photo-textured multi-view scene at benchmark scale (default 30
cameras, 640x480), then runs the COMPLETE production pipeline with REAL
feature extraction — TPU SIFT -> MNN matching + coarse-to-fine CNN
refinement (match graph) -> multi-view LM solve -> DB import + geometric
verification -> fixed-pose triangulation -> point-to-surface evaluation —
as a refined-vs-raw A/B, recording per-stage wall-clock.

This is the reference's primary end-to-end entry point at dataset scale
(reference: eth/benchmark.py:94-149 chains the same six stages across OS
processes); here it is one program and the arrays stay on device between
stages.

Writes results/e2e_scale_r02.json and prints a stage-timing table.

Usage: python scripts/bench_e2e_scale.py [--num_cameras 30] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="weights/panet_real.msgpack")
    ap.add_argument("--out", default="results/e2e_scale_r02.json")
    ap.add_argument("--num_cameras", type=int, default=30)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--max_features", type=int, default=2048)
    ap.add_argument("--fine_mode", default="crop", choices=["grid", "crop"])
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import tempfile

    from lfr_tpu.pipelines import benchmark
    from lfr_tpu.pipelines import extract_features
    from lfr_tpu.utils import synthetic
    from lfr_tpu.utils.corpus import load_corpus

    photos = load_corpus(include_textures=False, min_size=300)
    if not photos:
        raise SystemExit("no local real photos found")

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    scene, images = synthetic.planar_scene(
        rng,
        num_points=64,  # planted features are replaced by real SIFT below
        num_cameras=args.num_cameras,
        width=args.width,
        height=args.height,
        texture=photos[0],
        depth_step=0.5,
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="lfr_e2e_")
    root = os.path.join(workdir, "scene")
    synthetic.make_eth3d_dataset(
        root,
        scene,
        rng,
        rendered_images=images,
        scan_mesh=synthetic.planar_surface_mesh(depth_step=0.5),
    )
    t_dataset = time.perf_counter() - t0

    # Replace the planted features with REAL TPU SIFT extraction (the
    # production path; reference: utils/extract_features_sift.py).
    image_dir = os.path.join(root, "images")
    for f in os.listdir(image_dir):
        if f.endswith(".sift"):
            os.remove(os.path.join(image_dir, f))
    t0 = time.perf_counter()
    n_feats = extract_features.extract_directory(
        image_dir, "sift", max_features=args.max_features, verbose=False
    )
    t_extract = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = benchmark.run_eth(
        root,
        "sift",
        output_path=os.path.join(workdir, "out"),
        checkpoint=args.checkpoint,
        verbose=False,
        fine_mode=args.fine_mode,
        batch_size=2048,
    )
    t_bench = time.perf_counter() - t0

    # Derived throughputs.
    n_images = args.num_cameras
    n_pairs = n_images * (n_images - 1) // 2
    spans = {s["span"]: s["ms"] for s in results["timing"]}
    mg_ms = spans.get("match_graph", 0.0)

    payload = {
        "config": {
            "num_cameras": n_images,
            "image_size": [args.width, args.height],
            "max_features": args.max_features,
            "n_pairs": n_pairs,
            "fine_mode": args.fine_mode,
            "checkpoint": args.checkpoint,
            "device": "tpu v5e (1 chip)",
        },
        "stage_wall_s": {
            "dataset_render": round(t_dataset, 2),
            "sift_extract": round(t_extract, 2),
            "match_graph_refine": round(mg_ms / 1e3, 2),
            "solve": round(spans.get("solve", 0.0) / 1e3, 2),
            "triangulation_ref": round(spans.get("triangulation_ref", 0.0) / 1e3, 2),
            "triangulation_raw": round(spans.get("triangulation_raw", 0.0) / 1e3, 2),
            "evaluation_ref": round(spans.get("evaluation_ref", 0.0) / 1e3, 2),
            "evaluation_raw": round(spans.get("evaluation_raw", 0.0) / 1e3, 2),
            "total_pipeline": round(t_bench, 2),
        },
        "throughput": {
            "images_per_s_extract": round(n_images / t_extract, 2),
            "pairs_per_s_match_refine": round(n_pairs / (mg_ms / 1e3), 2) if mg_ms else None,
        },
        "stats": {tag: results[tag] for tag in ("ref", "raw") if tag in results},
        "features_extracted": n_feats,
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)

    print(f"\n{n_images} images ({args.width}x{args.height}), {n_pairs} pairs, "
          f"max {args.max_features} features, fine_mode={args.fine_mode}")
    print("| stage | wall s |")
    print("|---|---|")
    for k, v in payload["stage_wall_s"].items():
        print(f"| {k} | {v} |")
    for tag in ("ref", "raw"):
        if tag in results:
            st = dict(results[tag])
            ev = st.pop("evaluation", {})
            acc = ev.get("accuracies", [None, None])[:2]
            print(f"{tag}: {st} acc@1,2cm={acc}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
