"""Fixed-pose triangulation pipeline (ETH3D layout).

The reference's ``triangulation_pipeline.py`` without subprocesses
(reference: reconstruction-scripts/triangulation_pipeline.py:12-95):
copy the pristine database, import (optionally refined) features, verify,
triangulate against the ground-truth calibration, and export TXT + PLY.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import types
from typing import Optional

from ..io import colmap_db as db_mod
from ..io import colmap_model as model_mod
from ..sfm import triangulate as tri_mod
from . import import_features as import_mod


def triangulation_pipeline(
    dataset_path: str,
    method_name: str,
    matches_file: str,
    solution_file: Optional[str] = None,
    reference_model_dir: str = "dslr_calibration_undistorted",
    verbose: bool = True,
) -> dict:
    refine = solution_file is not None
    tag = "ref" if refine else "raw"

    paths = types.SimpleNamespace()
    paths.database_path = os.path.join(dataset_path, f"{method_name}-{tag}.db")
    paths.image_path = os.path.join(dataset_path, "images")
    paths.reference_model_path = os.path.join(dataset_path, reference_model_dir)
    paths.empty_model_path = os.path.join(dataset_path, f"sparse-{method_name}-{tag}-empty")
    paths.model_path = os.path.join(dataset_path, f"sparse-{method_name}-{tag}")
    paths.ply_model_path = os.path.join(dataset_path, f"sparse-{method_name}-{tag}.ply")

    if os.path.exists(paths.database_path):
        raise FileExistsError(
            f"The database file already exists: {paths.database_path}"
        )
    from ..utils import timing

    spans = timing.Spans()
    shutil.copyfile(os.path.join(dataset_path, "database.db"), paths.database_path)

    model_mod.generate_empty_model(paths.reference_model_path, paths.empty_model_path)
    with spans.span("import_verify"):
        matching_stats = import_mod.import_features(
            method_name,
            paths.database_path,
            paths.image_path,
            matches_file,
            solution_file,
            verbose=verbose,
        )

    empty_model = model_mod.read_model(paths.empty_model_path)
    db = db_mod.ColmapDatabase(paths.database_path)
    with spans.span("triangulate"):
        result = tri_mod.triangulate_model(db, empty_model, verbose=verbose)
    db.close()

    with spans.span("write_model"):
        model_mod.write_model(paths.model_path, result.model)
        model_mod.write_ply(paths.ply_model_path, result.model.points3D)

    stats = dict(
        matching=matching_stats,
        triangulation=result.stats,
        timing=spans.report(),
    )
    if verbose:
        print(json.dumps(stats))
    return stats


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="fixed-pose triangulation pipeline")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--method_name", required=True)
    parser.add_argument("--matches_file", required=True)
    parser.add_argument("--solution_file", default=None)
    parser.add_argument("--reference_model_dir", default="dslr_calibration_undistorted")
    args = parser.parse_args(argv)
    triangulation_pipeline(
        args.dataset_path,
        args.method_name,
        args.matches_file,
        args.solution_file,
        args.reference_model_dir,
    )


if __name__ == "__main__":
    main()
