"""Pack graph components into padded size buckets for the batched solver.

This replaces the reference's thread-pool scheduling of per-component Ceres
problems (reference: solve.cc:614-635): components are grouped by
power-of-two node-count buckets, padded, and solved as dense batches; the
bucket list is the unit that shards across devices.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from .graph import PatchGraph
from .lm import ComponentBatch
from .tracks import Tracks


@dataclasses.dataclass
class PackedBuckets:
    batches: List[ComponentBatch]
    #: per batch: (B, N) global node index for scattering solutions back
    #: (-1 on padding).
    node_maps: List[np.ndarray]


def _next_pow2(x: int, floor: int = 2) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


def pack_components(
    graph: PatchGraph,
    tracks: Tracks,
    component_idx: np.ndarray,
    max_batch_elems: int = 1 << 24,
    max_batch_edges: int = 1 << 18,
) -> PackedBuckets:
    """Group non-singleton components into padded ComponentBatches.

    ``max_batch_elems`` caps B * (2N)^2 (dense normal equations) and
    ``max_batch_edges`` caps B * E (per-edge Jacobian temporaries) per
    batch, bounding the solver's peak HBM.
    """
    n_nodes = graph.num_nodes
    if n_nodes == 0:
        return PackedBuckets([], [])

    n_comp = int(component_idx.max()) + 1
    comp_sizes = np.bincount(component_idx, minlength=n_comp)

    # Keep directed edges internal to a component (reference drops
    # cross-component edges, solve.cc:114-123 `continue`).
    keep = component_idx[graph.edge_src] == component_idx[graph.edge_dst]
    esrc = graph.edge_src[keep]
    edst = graph.edge_dst[keep]
    esim = graph.edge_sim[keep]
    eflow = graph.edge_flow[keep]
    eintra = tracks.track_idx[esrc] == tracks.track_idx[edst]
    ecomp = component_idx[esrc]

    # Group nodes and edges by component.
    node_order = np.argsort(component_idx, kind="stable")
    node_comp_sorted = component_idx[node_order]
    node_starts = np.searchsorted(node_comp_sorted, np.arange(n_comp))
    node_ends = np.append(node_starts[1:], n_nodes)

    edge_order = np.argsort(ecomp, kind="stable")
    ecomp_sorted = ecomp[edge_order]
    edge_starts = np.searchsorted(ecomp_sorted, np.arange(n_comp))
    edge_ends = np.append(edge_starts[1:], esrc.shape[0])

    # Local node index within each component.
    local_idx = np.zeros(n_nodes, dtype=np.int64)
    pos_in_sorted = np.empty(n_nodes, dtype=np.int64)
    pos_in_sorted[node_order] = np.arange(n_nodes)
    local_idx = pos_in_sorted - node_starts[component_idx]

    # Bucket assignment.
    buckets: Dict[int, List[int]] = {}
    for c in range(n_comp):
        size = comp_sizes[c]
        if size <= 1:
            continue  # singletons skipped (reference: solve.cc:619-622)
        buckets.setdefault(_next_pow2(int(size)), []).append(c)

    batches: List[ComponentBatch] = []
    node_maps: List[np.ndarray] = []
    for n_bucket in sorted(buckets, reverse=True):
        comps = buckets[n_bucket]
        e_bucket = _next_pow2(
            max(int(edge_ends[c] - edge_starts[c]) for c in comps), floor=2
        )
        max_b = max(
            1,
            min(
                int(max_batch_elems // max((2 * n_bucket) ** 2, 1)),
                int(max_batch_edges // max(e_bucket, 1)),
            ),
        )
        for chunk_start in range(0, len(comps), max_b):
            chunk = comps[chunk_start : chunk_start + max_b]
            b = len(chunk)
            b_esrc = np.zeros((b, e_bucket), dtype=np.int32)
            b_edst = np.zeros((b, e_bucket), dtype=np.int32)
            b_esim = np.zeros((b, e_bucket), dtype=np.float32)
            b_eflow = np.zeros((b, e_bucket, 3, 3, 2), dtype=np.float32)
            b_eintra = np.zeros((b, e_bucket), dtype=bool)
            b_evalid = np.zeros((b, e_bucket), dtype=bool)
            b_root = np.zeros((b, n_bucket), dtype=bool)
            b_nvalid = np.zeros((b, n_bucket), dtype=bool)
            b_nodemap = np.full((b, n_bucket), -1, dtype=np.int64)

            for k, c in enumerate(chunk):
                nodes = node_order[node_starts[c] : node_ends[c]]
                nn = nodes.shape[0]
                b_nodemap[k, :nn] = nodes
                b_nvalid[k, :nn] = True
                b_root[k, :nn] = tracks.is_root[nodes]

                eidx = edge_order[edge_starts[c] : edge_ends[c]]
                ne = eidx.shape[0]
                b_esrc[k, :ne] = local_idx[esrc[eidx]]
                b_edst[k, :ne] = local_idx[edst[eidx]]
                b_esim[k, :ne] = esim[eidx]
                b_eflow[k, :ne] = eflow[eidx]
                b_eintra[k, :ne] = eintra[eidx]
                b_evalid[k, :ne] = True

            batches.append(
                ComponentBatch(
                    b_esrc, b_edst, b_esim, b_eflow, b_eintra, b_evalid, b_root, b_nvalid
                )
            )
            node_maps.append(b_nodemap)

    return PackedBuckets(batches, node_maps)
