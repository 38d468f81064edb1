"""Unified CLI: ``python -m lfr_tpu <command> ...``.

The reference splits its drivers across per-directory scripts invoked by
hand (reference: eth/benchmark.py, local-feature-evaluation/benchmark.py,
custom_demo.py, two-view-refinement/compute_match_graph.py,
multi-view-refinement/solve, reconstruction-scripts/*.py, utils/*.py);
here every stage is one subcommand of one program, sharing the single
method-config registry (lfr_tpu/config.py) instead of the reference's
triplicated per-driver dicts (reference: eth/benchmark.py:18-39).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "extract": (
        "lfr_tpu.pipelines.extract_features",
        "TPU-native feature extraction (sift/surf/doh) -> npz per image",
    ),
    "match": (
        "lfr_tpu.pipelines.match_graph",
        "match graph + two-view CNN refinement -> MatchingFile",
    ),
    "solve": (
        "lfr_tpu.solver.solve",
        "multi-view track solve: MatchingFile -> SolutionFile",
    ),
    "triangulate": (
        "lfr_tpu.pipelines.triangulation",
        "fixed-pose triangulation pipeline (ETH3D layout)",
    ),
    "reconstruct": (
        "lfr_tpu.pipelines.reconstruction",
        "incremental SfM pipeline (LFE layout)",
    ),
    "benchmark": (
        "lfr_tpu.pipelines.benchmark",
        "end-to-end eth/lfe/custom benchmark drivers (ref & raw A/B)",
    ),
    "dataset": (
        "lfr_tpu.pipelines.dataset_tools",
        "dataset bootstrap: create-db, create-db-eth, match-list, image-list",
    ),
    "compare": (
        "lfr_tpu.eval.compare",
        "compare two reconstructions on commonly registered images",
    ),
}


def _usage() -> str:
    lines = ["usage: python -m lfr_tpu <command> [args...]", "", "commands:"]
    for name, (_, help_text) in COMMANDS.items():
        lines.append(f"  {name:<12} {help_text}")
    lines.append("")
    lines.append("run `python -m lfr_tpu <command> --help` for per-command flags")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0
    cmd = argv[0]
    entry = COMMANDS.get(cmd)
    if entry is None:
        print(f"unknown command {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2
    import importlib

    module = importlib.import_module(entry[0])
    module.main(argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
