"""Focused SfM-scale benchmark: run_sfm on an existing rendered dataset.

bench_e2e_scale.py --sfm measures the FULL chain (triangulation benchmark
+ SfM A/B); this driver runs just the SfM leg (match graph -> solve ->
incremental mapper ref & raw) against a dataset that already has images,
features, and a match list — for re-measuring mapper scale without
re-paying the rest of the pipeline (reference: the LFE benchmark's
reconstruction stage, local-feature-evaluation/benchmark.py:106-126).

Usage: python scripts/bench_sfm_scale.py --dataset <dir> --out <json>
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lfr_tpu.utils.platform import select_platform


def main() -> None:
    select_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--checkpoint", default="weights/panet_holdout.msgpack")
    ap.add_argument("--fine_mode", default="crop")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from lfr_tpu.pipelines import benchmark
    from lfr_tpu.utils.timing import CompileMeter

    CompileMeter.seconds()
    t0 = time.perf_counter()
    results = benchmark.run_sfm(
        args.dataset,
        "sift",
        output_path=os.path.join(os.path.dirname(args.out) or ".", "out_sfm_scale"),
        checkpoint=args.checkpoint,
        verbose=True,
        fine_mode=args.fine_mode,
        batch_size=2048,
    )
    wall = time.perf_counter() - t0

    with open(os.path.join(args.dataset, "match-list.txt")) as fh:
        n_pairs = sum(1 for l in fh if l.strip())
    n_images = len(
        [f for f in os.listdir(os.path.join(args.dataset, "images")) if not f.endswith(".sift")]
    )
    payload = {
        "config": {
            "dataset": args.dataset,
            "num_images": n_images,
            "n_pairs": n_pairs,
            "fine_mode": args.fine_mode,
            "checkpoint": args.checkpoint,
            "device": "tpu v5e (1 chip)",
        },
        "sfm_wall_s": round(wall, 2),
        "compile_s": round(CompileMeter.seconds(), 2),
        "match_graph_breakdown": results.get("match_graph_breakdown", {}),
        "ref": results.get("ref"),
        "raw": results.get("raw"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    for tag in ("ref", "raw"):
        rec = results.get(tag, {}).get("reconstruction", {})
        print(
            f"{tag}: reg {rec.get('num_reg_images')}/{n_images}, "
            f"points {rec.get('num_sparse_points')}, "
            f"reproj {rec.get('mean_reproj_error')}"
        )
        print(f"{tag} phases: {rec.get('phase_times')}")
    print(f"wall {wall:.1f}s (compile {payload['compile_s']}s); wrote {args.out}")


if __name__ == "__main__":
    main()
