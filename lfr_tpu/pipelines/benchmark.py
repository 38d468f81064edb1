"""Unified benchmark driver: match -> solve -> reconstruct -> evaluate.

One program replacing the reference's three near-identical subprocess
drivers (reference: eth/benchmark.py:94-149, local-feature-evaluation/
benchmark.py:85-126, custom_demo.py:87-126), always producing the
refined/raw A/B pair.  Method hyper-parameters come from the single config
registry (lfr_tpu.config.METHODS).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

from ..config import get_method
from ..solver import solve as solve_mod
from ..utils import timing
from . import match_graph as mg_mod
from . import triangulation as tri_pipeline


def run_eth(
    dataset_path: str,
    method_name: str,
    output_path: str = "output",
    skip_refinement: bool = False,
    checkpoint: Optional[str] = None,
    refiner=None,
    evaluate: bool = True,
    batch_size: int = None,
    verbose: bool = True,
    fine_mode: str = "grid",
) -> dict:
    """ETH3D triangulation benchmark for one dataset
    (reference: eth/benchmark.py:69-149)."""
    method = get_method(method_name)
    dataset_name = os.path.basename(os.path.normpath(dataset_path))
    os.makedirs(output_path, exist_ok=True)

    matches_file = os.path.join(output_path, f"{method_name}-{dataset_name}-matches.pb")
    solution_file = os.path.join(output_path, f"{method_name}-{dataset_name}-solution.pb")
    scan_file = os.path.join(dataset_path, "dslr_scan_eval", "scan_alignment.mlp")

    # Two-view stage.
    if refiner is None and not skip_refinement:
        from .refinement import TwoViewRefiner

        variables = None
        if checkpoint:
            from ..models.checkpoint import load_any

            variables = load_any(checkpoint)
        kwargs = {"batch_size": batch_size} if batch_size else {}
        refiner = TwoViewRefiner(variables=variables, fine_mode=fine_mode, **kwargs)

    spans = timing.Spans()
    mg_breakdown: dict = {}
    with spans.span("match_graph"):
        mg_mod.compute_match_graph(
            os.path.join(dataset_path, "images"),
            os.path.join(dataset_path, "match-list.txt"),
            method,
            matches_file,
            refiner=refiner,
            skip_refinement=skip_refinement,
            progress=verbose,
            sub_spans=mg_breakdown,
        )

    # Multi-view solve.
    if not skip_refinement:
        with spans.span("solve"):
            solve_mod.solve_file(matches_file, solution_file, verbose=verbose)

    results = {}
    runs = [("raw", None)] if skip_refinement else [("ref", solution_file), ("raw", None)]
    for tag, sol in runs:
        with spans.span(f"triangulation_{tag}"):
            stats = tri_pipeline.triangulation_pipeline(
                dataset_path, method_name, matches_file, sol, verbose=verbose
            )
        results[tag] = stats
        ply = os.path.join(dataset_path, f"sparse-{method_name}-{tag}.ply")
        if evaluate and os.path.exists(scan_file):
            from ..eval import eth3d

            with spans.span(f"evaluation_{tag}"):
                # Completeness restricted to scan samples visible in the
                # ground-truth views (z-buffer approximation of the
                # official evaluator's scan-observability handling).
                ev = eth3d.evaluate_ply(
                    ply,
                    scan_file,
                    gt_model_path=os.path.join(
                        dataset_path, "dslr_calibration_undistorted"
                    ),
                )
            results[tag]["evaluation"] = ev
            out_txt = os.path.join(output_path, f"{method_name}-{dataset_name}-{tag}.txt")
            with open(out_txt, "w") as fh:
                fh.write(eth3d.format_results(ev))

    if evaluate and os.path.exists(scan_file):
        # Stage hygiene: cached eval blocks must not crowd a subsequent
        # match-refine stage's near-full-chip peak (e.g. run_sfm after
        # run_eth in one process); host/disk caches make re-upload cheap.
        from ..eval import eth3d

        eth3d.release_device_blocks()

    results["timing"] = spans.report()
    results["match_graph_breakdown"] = mg_breakdown
    with open(
        os.path.join(output_path, f"{method_name}-{dataset_name}-stats.json"), "w"
    ) as fh:
        json.dump(results, fh, indent=2)
    return results


def run_sfm(
    dataset_path: str,
    method_name: str,
    output_path: str = "output",
    skip_refinement: bool = False,
    checkpoint: Optional[str] = None,
    refiner=None,
    batch_size: int = None,
    verbose: bool = True,
    fine_mode: str = "grid",
    matches_file: Optional[str] = None,
    solution_file: Optional[str] = None,
) -> dict:
    """Full-SfM benchmark for one dataset — the LFE / custom-demo path
    (reference: local-feature-evaluation/benchmark.py:85-126,
    custom_demo.py:87-126).

    ``matches_file``/``solution_file``: existing artifacts to reuse —
    the reference computes the match graph once per scene and feeds the
    same files to every downstream stage (benchmark.py:94-112); pass
    both to skip the match and solve stages entirely.
    """
    from . import reconstruction as rec_pipeline

    method = get_method(method_name)
    dataset_name = os.path.basename(os.path.normpath(dataset_path))
    os.makedirs(output_path, exist_ok=True)

    reuse = matches_file is not None and (skip_refinement or solution_file)
    if matches_file is None:
        matches_file = os.path.join(
            output_path, f"{method_name}-{dataset_name}-matches.pb"
        )
    if solution_file is None and not skip_refinement:
        solution_file = os.path.join(
            output_path, f"{method_name}-{dataset_name}-solution.pb"
        )

    mg_breakdown: dict = {}
    if not reuse:
        if refiner is None and not skip_refinement:
            from .refinement import TwoViewRefiner

            variables = None
            if checkpoint:
                from ..models.checkpoint import load_any

                variables = load_any(checkpoint)
            kwargs = {"batch_size": batch_size} if batch_size else {}
            refiner = TwoViewRefiner(variables=variables, fine_mode=fine_mode, **kwargs)

        mg_mod.compute_match_graph(
            os.path.join(dataset_path, "images"),
            os.path.join(dataset_path, "match-list.txt"),
            method,
            matches_file,
            refiner=refiner,
            skip_refinement=skip_refinement,
            progress=verbose,
            sub_spans=mg_breakdown,
        )
        if not skip_refinement:
            solve_mod.solve_file(matches_file, solution_file, verbose=verbose)

    results = {}
    runs = [("raw", None)] if skip_refinement else [("ref", solution_file), ("raw", None)]
    for tag, sol in runs:
        out_json = os.path.join(output_path, f"{method_name}-{dataset_name}-{tag}.json")
        results[tag] = rec_pipeline.reconstruction_pipeline(
            dataset_path, method_name, matches_file, sol, out_json, verbose=verbose
        )
    results["match_graph_breakdown"] = mg_breakdown
    with open(
        os.path.join(output_path, f"{method_name}-{dataset_name}-stats.json"), "w"
    ) as fh:
        json.dump(results, fh, indent=2)
    return results


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="lfr_tpu benchmark driver")
    sub = parser.add_subparsers(dest="command", required=True)

    p_eth = sub.add_parser("eth", help="ETH3D triangulation benchmark")
    p_eth.add_argument("--dataset_path", required=True)
    p_eth.add_argument("--method_name", required=True)
    p_eth.add_argument("--output_path", default="output")
    p_eth.add_argument("--checkpoint", default=None)
    p_eth.add_argument("--no_eval", action="store_true")
    p_eth.add_argument("--fine_mode", default="grid", choices=["grid", "crop"])

    for name, helptext in [
        ("lfe", "local-feature-evaluation SfM benchmark"),
        ("custom", "custom-dataset SfM benchmark"),
    ]:
        p = sub.add_parser(name, help=helptext)
        p.add_argument("--dataset_path", required=True)
        p.add_argument("--method_name", required=True)
        p.add_argument("--output_path", default="output")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--fine_mode", default="grid", choices=["grid", "crop"])

    args = parser.parse_args(argv)
    skip = "SKIP_REFINEMENT" in os.environ
    if args.command == "eth":
        run_eth(
            args.dataset_path,
            args.method_name,
            args.output_path,
            skip_refinement=skip,
            checkpoint=args.checkpoint,
            evaluate=not args.no_eval,
            fine_mode=args.fine_mode,
        )
    else:
        run_sfm(
            args.dataset_path,
            args.method_name,
            args.output_path,
            skip_refinement=skip,
            checkpoint=args.checkpoint,
            fine_mode=args.fine_mode,
        )


if __name__ == "__main__":
    main()
