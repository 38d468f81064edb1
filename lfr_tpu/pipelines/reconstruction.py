"""Full SfM reconstruction pipeline (the LFE benchmark path).

The reference's ``reconstruction_pipeline.py`` without subprocesses
(reference: reconstruction-scripts/reconstruction_pipeline.py:14-91):
copy the pristine database, import (optionally refined) features, verify,
run incremental SfM, and emit the matching + reconstruction statistics as
JSON lines (reference format: colmap_utils.py:218-223, 287-294).
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
from ..sfm import mapper as mapper_mod
from . import import_features as import_mod


def reconstruction_pipeline(
    dataset_path: str,
    method_name: str,
    matches_file: str,
    solution_file: Optional[str] = None,
    output_file: Optional[str] = None,
    verbose: bool = True,
) -> dict:
    refine = solution_file is not None
    tag = "ref" if refine else "raw"

    paths = types.SimpleNamespace()
    paths.database_path = os.path.join(dataset_path, f"{method_name}-{tag}.db")
    paths.image_path = os.path.join(dataset_path, "images")
    paths.sparse_path = os.path.join(dataset_path, f"sparse-{method_name}-{tag}")

    if os.path.exists(paths.database_path):
        raise FileExistsError(f"Database file already exists: {paths.database_path}")
    shutil.copy(os.path.join(dataset_path, "database.db"), paths.database_path)

    matching_stats = import_mod.import_features(
        method_name,
        paths.database_path,
        paths.image_path,
        matches_file,
        solution_file,
        verbose=verbose,
    )

    db = db_mod.ColmapDatabase(paths.database_path)
    model, reconstruction_stats = mapper_mod.reconstruct(db, verbose=verbose)
    db.close()
    if model is not None:
        model_mod.write_model(paths.sparse_path, model)
        model_mod.write_ply(paths.sparse_path + ".ply", model.points3D)
    else:
        print("Warning: Could not reconstruct any model")

    stats = dict(matching=matching_stats, reconstruction=reconstruction_stats)
    if output_file:
        with open(output_file, "w") as fh:
            fh.write(json.dumps(matching_stats))
            fh.write("\n")
            fh.write(json.dumps(reconstruction_stats))
    if verbose:
        print(json.dumps(stats))
    return stats


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="incremental SfM pipeline")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--method_name", required=True)
    parser.add_argument("--matches_file", required=True)
    parser.add_argument("--solution_file", default=None)
    parser.add_argument("--output_file", default=None)
    args = parser.parse_args(argv)
    reconstruction_pipeline(
        args.dataset_path,
        args.method_name,
        args.matches_file,
        args.solution_file,
        args.output_file,
    )


if __name__ == "__main__":
    main()
