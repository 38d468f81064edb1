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

Every stage runs ``--repeat`` times (default 3) and the report carries
median + min/max, so a single slow run (tunnel hiccup, first-compile)
can't masquerade as the steady state (the reference prints per-stage
wall-clock for the same reason, solve.cc:585-589,640-641).

``--sfm`` additionally runs the full incremental-mapper SfM refined-vs-raw
A/B on the same scene (reference: colmap mapper,
reconstruction-scripts/colmap_utils.py:226-236).

Usage: python scripts/bench_e2e_scale.py [--num_cameras 100] [--repeat 3]
       [--scene planar|layered] [--sfm] [--out ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import numpy as np


def _median_spread(xs):
    xs = sorted(xs)
    return {
        "median_s": round(float(np.median(xs)), 2),
        "min_s": round(xs[0], 2),
        "max_s": round(xs[-1], 2),
        "runs": [round(x, 2) for x in xs],
    }


def _clean_run_artifacts(root: str, method: str):
    """Remove per-run DBs / sparse models / PLYs so a repeat starts clean
    (the pipelines refuse to overwrite them, like the reference's
    reconstruction_pipeline.py:67-68)."""
    for pat in (f"{method}-*.db", f"sparse-{method}-*", f"*.ply"):
        for p in glob.glob(os.path.join(root, pat)):
            if os.path.isdir(p):
                shutil.rmtree(p)
            else:
                os.remove(p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="weights/panet_holdout.msgpack")
    ap.add_argument("--out", default="results/e2e_scale_r03.json")
    ap.add_argument("--num_cameras", type=int, default=30)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--max_features", type=int, default=2048)
    ap.add_argument("--fine_mode", default="crop", choices=["grid", "crop"])
    ap.add_argument("--scene", default="planar", choices=["planar", "layered"])
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sfm", action="store_true",
                    help="also run the incremental-mapper SfM A/B")
    ap.add_argument(
        "--match_mode",
        default="exhaustive",
        choices=["exhaustive", "sequential"],
        help="'sequential' rewrites the match list to a frame window plus "
        "sparse loop closures (the reference's LFE big-scene shape: "
        "provided match lists, not all-pairs; "
        "local-feature-evaluation/download.sh fetches 1.3-1.6k-image "
        "scenes with such lists)",
    )
    ap.add_argument("--match_window", type=int, default=10,
                    help="sequential window size (with --match_mode sequential)")
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
    if args.scene == "layered":
        scene, images = synthetic.layered_scene(
            rng,
            num_points=64,  # planted features are replaced by real SIFT below
            num_cameras=args.num_cameras,
            width=args.width,
            height=args.height,
            textures=photos[:3],
            exposure_jitter=0.12,
        )
        mesh = synthetic.layered_surface_mesh()
    else:
        scene, images = synthetic.planar_scene(
            rng,
            num_points=64,
            num_cameras=args.num_cameras,
            width=args.width,
            height=args.height,
            texture=photos[0],
            depth_step=0.5,
        )
        mesh = synthetic.planar_surface_mesh(depth_step=0.5)
    workdir = args.workdir or tempfile.mkdtemp(prefix="lfr_e2e_")
    root = os.path.join(workdir, "scene")
    synthetic.make_eth3d_dataset(
        root, scene, rng, rendered_images=images, scan_mesh=mesh
    )
    n_pairs = args.num_cameras * (args.num_cameras - 1) // 2
    if args.match_mode == "sequential":
        from lfr_tpu.io import match_list as ml

        names = sorted(
            f for f in os.listdir(os.path.join(root, "images"))
            if f.endswith(".png") or f.endswith(".jpg")
        )
        pairs = set(ml.sequential_pairs(names, args.match_window))
        # Sparse loop closures: exhaustive over every 10th frame (the arc
        # revisits nothing, so these are the long-baseline constraints a
        # real sequence's loop closures would provide).
        pairs.update(ml.exhaustive_pairs(names[::10]))
        pairs = sorted(pairs)
        ml.write_match_list(os.path.join(root, "match-list.txt"), pairs)
        n_pairs = len(pairs)
    t_dataset = time.perf_counter() - t0

    image_dir = os.path.join(root, "images")
    n_images = args.num_cameras

    stage_runs: dict = {}
    results = None
    sfm_results = None
    sfm_wall = []
    probes = []

    from lfr_tpu.utils.healthprobe import probe

    def _probe(tag: str):
        """Environment health snapshot (link latency + fixed matmul): a
        stage outlier whose neighboring probes balloon too is an
        environment stall, not a pipeline regression."""
        p = dict(probe())
        p["at"] = tag
        probes.append(p)
        print(f"[e2e] probe {tag}: {p}", file=sys.stderr, flush=True)

    from lfr_tpu.utils.timing import CompileMeter

    CompileMeter.seconds()  # register the listener before any compiles
    compile_runs: dict = {}
    mg_breakdowns = []

    def _staged(key, fn):
        """Run fn, recording wall + XLA-compile seconds under key."""
        c0 = CompileMeter.seconds()
        t0 = time.perf_counter()
        out = fn()
        stage_runs.setdefault(key, []).append(time.perf_counter() - t0)
        compile_runs.setdefault(key, []).append(CompileMeter.seconds() - c0)
        return out

    for rep in range(max(1, args.repeat)):
        # Fresh start: drop extracted features and per-run artifacts.
        for f in os.listdir(image_dir):
            if f.endswith(".sift"):
                os.remove(os.path.join(image_dir, f))
        _clean_run_artifacts(root, "sift")
        if rep:
            # The refine stage peaks near the full chip; device blocks
            # cached by the previous repeat's evaluation (plus anything
            # only reachable through GC cycles) must not crowd it.
            import gc

            from lfr_tpu.eval import eth3d

            eth3d._evict_to_budget(eth3d._CACHE_BUDGET_BYTES)  # drop all
            eth3d._visible_scan_cache.clear()
            gc.collect()

        print(f"[e2e] repeat {rep}: extracting...", file=sys.stderr, flush=True)
        _probe(f"rep{rep}_pre_extract")
        n_feats = _staged(
            "sift_extract",
            lambda: extract_features.extract_directory(
                image_dir, "sift", max_features=args.max_features, verbose=False
            ),
        )
        print(
            f"[e2e] repeat {rep}: extract {stage_runs['sift_extract'][-1]:.1f}s,"
            " running pipeline...",
            file=sys.stderr,
            flush=True,
        )

        _probe(f"rep{rep}_pre_pipeline")
        results = _staged(
            "total_pipeline",
            lambda: benchmark.run_eth(
                root,
                "sift",
                output_path=os.path.join(workdir, f"out_{rep}"),
                checkpoint=args.checkpoint,
                verbose=False,
                fine_mode=args.fine_mode,
                batch_size=2048,
            ),
        )
        mg_breakdowns.append(results.get("match_graph_breakdown", {}))
        _probe(f"rep{rep}_post_pipeline")
        for s in results["timing"]:
            stage_runs.setdefault(s["span"], []).append(s["ms"] / 1e3)
        print(
            f"[e2e] repeat {rep}: pipeline {stage_runs['total_pipeline'][-1]:.1f}s",
            file=sys.stderr,
            flush=True,
        )

        if args.sfm:
            root_sfm = root + f"_sfm{rep}"
            shutil.copytree(
                root,
                root_sfm,
                ignore=shutil.ignore_patterns("sift-*.db", "sparse-*", "*.ply"),
            )
            c0 = CompileMeter.seconds()
            t0 = time.perf_counter()
            # Reuse this repeat's match graph + solution: the reference
            # computes the match graph once per scene and feeds the same
            # files to each reconstruction (benchmark.py:94-112), so the
            # SfM wall-clock is the mapper, not a duplicate match stage.
            mg_pb = os.path.join(workdir, f"out_{rep}", "sift-scene-matches.pb")
            sol_pb = os.path.join(workdir, f"out_{rep}", "sift-scene-solution.pb")
            sfm_results = benchmark.run_sfm(
                root_sfm,
                "sift",
                output_path=os.path.join(workdir, f"out_sfm_{rep}"),
                checkpoint=args.checkpoint,
                verbose=False,
                fine_mode=args.fine_mode,
                batch_size=2048,
                matches_file=mg_pb if os.path.exists(mg_pb) else None,
                solution_file=sol_pb if os.path.exists(sol_pb) else None,
            )
            sfm_wall.append(time.perf_counter() - t0)
            compile_runs.setdefault("sfm", []).append(CompileMeter.seconds() - c0)

    stage_stats = {k: _median_spread(v) for k, v in stage_runs.items()}
    med_extract = stage_stats["sift_extract"]["median_s"]
    med_mg = stage_stats.get("match_graph", {}).get("median_s", 0.0)
    # Repeat 0 pays every XLA compile in the process (attributed below via
    # CompileMeter); the warm stats are the reproducible steady state.
    stage_warm = (
        {k: _median_spread(v[1:]) for k, v in stage_runs.items()}
        if args.repeat >= 2
        else None
    )
    n_refined = [
        b.get("n_refined_matches") for b in mg_breakdowns if b.get("n_refined_matches")
    ]
    mg_runs = stage_runs.get("match_graph", [])
    refined_tput = (
        round(
            float(np.median([n / t for n, t in zip(n_refined, mg_runs)])), 1
        )
        if n_refined and len(mg_runs) == len(n_refined)
        else None
    )

    payload = {
        "config": {
            "num_cameras": n_images,
            "image_size": [args.width, args.height],
            "max_features": args.max_features,
            "n_pairs": n_pairs,
            "fine_mode": args.fine_mode,
            "scene": args.scene,
            "checkpoint": args.checkpoint,
            "repeat": args.repeat,
            "device": "tpu v5e (1 chip)",
        },
        "dataset_render_s": round(t_dataset, 2),
        "stage_wall_s": stage_stats,
        "stage_wall_warm_s": stage_warm,
        "stage_compile_s": {
            k: [round(c, 2) for c in v] for k, v in compile_runs.items()
        },
        "throughput": {
            "images_per_s_extract": round(n_images / med_extract, 2),
            "pairs_per_s_match_refine": round(n_pairs / med_mg, 2) if med_mg else None,
            # The CNN refines every mutual-NN match; dividing the stage by
            # the post-verification inlier count (as the round-4 review
            # did) understates it by the outlier fraction.
            "refined_matches_per_s": refined_tput,
        },
        "match_graph_breakdown": mg_breakdowns,
        "stats": {tag: results[tag] for tag in ("ref", "raw") if tag in results},
        "features_extracted": n_feats,
        "health_probes": probes,
    }
    if args.sfm and sfm_results is not None:
        payload["sfm_wall_s"] = _median_spread(sfm_wall)
        payload["sfm_compile_s"] = [round(c, 2) for c in compile_runs.get("sfm", [])]
        payload["sfm"] = {
            tag: sfm_results[tag] for tag in ("ref", "raw") if tag in sfm_results
        }
        payload["sfm"]["match_graph_breakdown"] = sfm_results.get(
            "match_graph_breakdown", {}
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)

    print(f"\n{n_images} images ({args.width}x{args.height}), {n_pairs} pairs, "
          f"max {args.max_features} features, fine_mode={args.fine_mode}, "
          f"scene={args.scene}, repeat={args.repeat}")
    print("| stage | median s | min | max |")
    print("|---|---|---|---|")
    for k, v in stage_stats.items():
        print(f"| {k} | {v['median_s']} | {v['min_s']} | {v['max_s']} |")
    for tag in ("ref", "raw"):
        if tag in results:
            st = dict(results[tag])
            ev = st.pop("evaluation", {})
            acc = ev.get("accuracies", [None, None])[:2]
            print(f"{tag}: {st} acc@1,2cm={acc}")
    if args.sfm and sfm_results is not None:
        for tag in ("ref", "raw"):
            print(f"sfm {tag}: {sfm_results[tag]}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
