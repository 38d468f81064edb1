"""ETH3D-style multi-view evaluation: accuracy / completeness vs a scan.

In-framework replacement for the external ``ETH3DMultiViewEvaluation``
binary (reference: eth/benchmark.py:134-149): given a reconstructed sparse
point cloud and ground-truth scan points, computes, per tolerance t,

  accuracy(t)     = fraction of reconstruction points within t of the scan,
  completeness(t) = fraction of scan points within t of the reconstruction,
  F1(t)           = harmonic mean.

Scan geometry loads from a MeshLab ``.mlp`` project (PLY refs + per-mesh
4x4 alignment transforms) or directly from PLY files.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Sequence

import numpy as np
from scipy.spatial import cKDTree

from ..config import ETH3D_TOLERANCES
from ..io.colmap_model import read_ply_xyz


def load_mlp_scan(mlp_path: str) -> np.ndarray:
    """Load and transform all meshes referenced by a MeshLab project file."""
    tree = ET.parse(mlp_path)
    base = os.path.dirname(mlp_path)
    points = []
    for mesh in tree.iter("MLMesh"):
        filename = mesh.get("filename")
        matrix = np.eye(4)
        for mat in mesh.iter("MLMatrix44"):
            vals = [float(v) for v in mat.text.split()]
            matrix = np.array(vals).reshape(4, 4)
        xyz = read_ply_xyz(os.path.join(base, filename))
        xyz_h = np.hstack([xyz, np.ones((xyz.shape[0], 1))])
        points.append((xyz_h @ matrix.T)[:, :3])
    if not points:
        raise ValueError(f"no meshes found in {mlp_path}")
    return np.concatenate(points)


def evaluate_point_cloud(
    reconstruction: np.ndarray,
    scan: np.ndarray,
    tolerances: Sequence[float] = ETH3D_TOLERANCES,
) -> Dict[str, List[float]]:
    """Accuracy/completeness/F1 at each tolerance."""
    if reconstruction.shape[0] == 0 or scan.shape[0] == 0:
        z = [0.0] * len(tolerances)
        return {"tolerances": list(tolerances), "accuracies": z, "completenesses": z, "f1_scores": z}

    scan_tree = cKDTree(scan)
    rec_tree = cKDTree(reconstruction)
    d_rec_to_scan, _ = scan_tree.query(reconstruction, k=1)
    d_scan_to_rec, _ = rec_tree.query(scan, k=1)

    accuracies, completenesses, f1s = [], [], []
    for t in tolerances:
        acc = float((d_rec_to_scan <= t).mean())
        comp = float((d_scan_to_rec <= t).mean())
        f1 = 2 * acc * comp / (acc + comp) if (acc + comp) > 0 else 0.0
        accuracies.append(acc)
        completenesses.append(comp)
        f1s.append(f1)
    return {
        "tolerances": list(tolerances),
        "accuracies": accuracies,
        "completenesses": completenesses,
        "f1_scores": f1s,
    }


def evaluate_ply(
    reconstruction_ply: str,
    ground_truth: str,
    tolerances: Sequence[float] = ETH3D_TOLERANCES,
) -> Dict[str, List[float]]:
    """Evaluate a reconstruction PLY against a scan (.mlp or .ply)."""
    rec = read_ply_xyz(reconstruction_ply)
    if ground_truth.endswith(".mlp"):
        scan = load_mlp_scan(ground_truth)
    else:
        scan = read_ply_xyz(ground_truth)
    return evaluate_point_cloud(rec, scan, tolerances)


def format_results(results: Dict[str, List[float]]) -> str:
    """ETH3DMultiViewEvaluation-style stdout block
    (consumed as ``output/<m>-<d>-{ref,raw}.txt``)."""
    lines = [
        "Tolerances: " + ", ".join(str(t) for t in results["tolerances"]),
        "Accuracies: " + " ".join(f"{a:.6f}" for a in results["accuracies"]),
        "Completenesses: " + " ".join(f"{c:.6f}" for c in results["completenesses"]),
        "F1-scores: " + " ".join(f"{f:.6f}" for f in results["f1_scores"]),
    ]
    return "\n".join(lines) + "\n"
