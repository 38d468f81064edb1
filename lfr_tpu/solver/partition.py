"""Track meta-graph partitioning: the framework's "context parallelism".

Builds the meta-graph over tracks (inter-track edge weight = summed
similarity), finds connected components, and recursively bisects any
component whose node count exceeds the cap (default: number of images) by a
normalized min cut, dropping cross-cut edges — exactly the role the
reference assigns to colmap::ComputeNormalizedMinGraphCut
(reference: multi-view-refinement/solve.cc:162-373,586).

The cut here is spectral: the Fiedler vector of the weighted normalized
Laplacian, swept for the threshold minimizing the normalized-cut objective.
Irregular and host-side by design — its *output* (bounded, independent
components) is what shards the device solve across chips.
"""

from __future__ import annotations


import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from .graph import PatchGraph
from .tracks import Tracks

#: Health counters for the most recent partition_components() call.  The
#: spectral fallback replaces a failed Fiedler solve with a degree-sorted
#: balanced halving — it must never fire silently (VERDICT: a fallback that
#: can cut through dense subgraphs needs an audit trail).
partition_stats = {"spectral_fallbacks": 0, "cuts": 0}


def _normalized_cut_bisect(
    edges: np.ndarray, weights: np.ndarray, n: int, rng: np.random.Generator
) -> np.ndarray:
    """Bisect a connected weighted graph (local node ids 0..n-1).

    Returns a (n,) array of {0, 1} labels minimizing the swept normalized
    cut over the Fiedler ordering.
    """
    if n <= 1:
        return np.zeros(n, dtype=np.int64)
    w = sp.coo_matrix(
        (
            np.concatenate([weights, weights]).astype(np.float64),
            (
                np.concatenate([edges[:, 0], edges[:, 1]]),
                np.concatenate([edges[:, 1], edges[:, 0]]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    deg = np.asarray(w.sum(axis=1)).ravel()
    deg = np.maximum(deg, 1e-12)

    # Fiedler vector of the normalized Laplacian.
    d_inv_sqrt = 1.0 / np.sqrt(deg)
    lap = sp.eye(n) - sp.diags(d_inv_sqrt) @ w @ sp.diags(d_inv_sqrt)
    try:
        if n < 32:
            vals, vecs = np.linalg.eigh(lap.toarray())
            fiedler = vecs[:, 1]
        else:
            vals, vecs = sp.linalg.eigsh(
                lap, k=2, sigma=-1e-6, which="LM", v0=rng.standard_normal(n)
            )
            fiedler = vecs[:, np.argsort(vals)[1]]
    except Exception as exc:
        # Spectral failure: fall back to a balanced split over degrees.
        partition_stats["spectral_fallbacks"] += 1
        print(
            f"[partition] spectral bisection failed on a {n}-node component "
            f"({type(exc).__name__}); using degree-sorted balanced halving",
            file=sys.stderr,
        )
        order = np.argsort(-deg)
        labels = np.zeros(n, dtype=np.int64)
        labels[order[: n // 2]] = 1
        return labels

    order = np.argsort(fiedler / np.sqrt(deg))
    # Sweep: for each prefix, ncut = cut(A,B) * (1/vol(A) + 1/vol(B)).
    vol_total = deg.sum()
    in_a = np.zeros(n, dtype=bool)
    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(n)
    # Vectorized sweep: edge crosses prefix-k cut iff exactly one endpoint
    # has rank < k.
    r1 = pos[edges[:, 0]]
    r2 = pos[edges[:, 1]]
    lo = np.minimum(r1, r2)
    hi = np.maximum(r1, r2)
    # cut(k) = sum of weights with lo < k <= hi.
    cut = np.zeros(n + 1)
    np.add.at(cut, lo + 1, weights.astype(np.float64))
    np.add.at(cut, hi + 1, -weights.astype(np.float64))
    cut = np.cumsum(cut)[1:n]  # cut size for prefixes k=1..n-1
    vol_a = np.cumsum(deg[order])[: n - 1]
    vol_b = vol_total - vol_a
    ncut = cut * (1.0 / np.maximum(vol_a, 1e-12) + 1.0 / np.maximum(vol_b, 1e-12))
    k = int(np.argmin(ncut)) + 1
    labels = np.zeros(n, dtype=np.int64)
    labels[order[:k]] = 1
    return labels


def _recursive_cut(
    edges: np.ndarray,
    weights: np.ndarray,
    node_weights: np.ndarray,
    node_ids: np.ndarray,
    max_weight: int,
    rng: np.random.Generator,
    out_labels: np.ndarray,
    next_label: int,
) -> int:
    """Recursively bisect until every subset's node-weight sum <= max_weight
    (reference: solve.cc:185-250).  Returns the next free label."""
    n = node_ids.shape[0]
    # node_ids is unique-sorted (np.unique at every call site), so global->
    # local relabeling is a vectorized searchsorted, not a Python dict.
    le = np.searchsorted(node_ids, edges.reshape(-1)).reshape(-1, 2)
    partition_stats["cuts"] += 1
    labels = _normalized_cut_bisect(le, weights, n, rng)

    for side in (0, 1):
        mask = labels == side
        ids = node_ids[mask]
        if ids.size == 0:
            continue
        wsum = node_weights[ids].sum()
        if wsum <= max_weight or ids.size == 1:
            out_labels[ids] = next_label
            next_label += 1
            continue
        # Keep only intra-side edges and recurse (cross edges dropped).
        if le.shape[0]:
            side_of = labels
            e_mask = (side_of[le[:, 0]] == side) & (side_of[le[:, 1]] == side)
        else:
            e_mask = np.zeros(0, dtype=bool)
        sub_edges = edges[e_mask]
        sub_weights = weights[e_mask]
        if sub_edges.shape[0] == 0:
            # No internal edges: every node becomes its own component
            # (reference: solve.cc:355-364 re-derives components by BFS).
            out_labels[ids] = next_label + np.arange(ids.size)
            next_label += ids.size
            continue
        # Nodes in this side that still have edges recurse; isolated ones
        # get singleton labels.
        touched = np.unique(sub_edges)
        untouched = np.setdiff1d(ids, touched, assume_unique=False)
        next_label = _recursive_cut(
            sub_edges, sub_weights, node_weights, touched, max_weight, rng, out_labels, next_label
        )
        out_labels[untouched] = next_label + np.arange(untouched.size)
        next_label += untouched.size
    return next_label


def partition_components(
    graph: PatchGraph, tracks: Tracks, max_nodes_in_component: int = None
) -> np.ndarray:
    """Per-node component ids with bounded component sizes.

    The cap defaults to the number of images (reference: solve.cc:586).
    """
    partition_stats["spectral_fallbacks"] = 0
    partition_stats["cuts"] = 0
    n_nodes = graph.num_nodes
    if n_nodes == 0:
        return np.zeros(0, dtype=np.int64)
    if max_nodes_in_component is None:
        max_nodes_in_component = len(graph.image_names)

    n_tracks = tracks.num_tracks
    t_src = tracks.track_idx[graph.edge_src]
    t_dst = tracks.track_idx[graph.edge_dst]
    inter = t_src != t_dst
    nodes_per_track = np.bincount(tracks.track_idx, minlength=n_tracks)

    # Aggregate directed inter-track edges into undirected meta edges with
    # summed similarity (reference: solve.cc:267-289 sums per direction; the
    # undirected weight used for the cut is taken from meta_node < neighbor,
    # i.e. each direction contributes, solve.cc:318-329).
    a = np.minimum(t_src[inter], t_dst[inter])
    b = np.maximum(t_src[inter], t_dst[inter])
    sims = graph.edge_sim[inter].astype(np.float64)
    if a.size:
        key = a * n_tracks + b
        uniq, inv = np.unique(key, return_inverse=True)
        wsum = np.zeros(uniq.shape[0])
        np.add.at(wsum, inv, sims)
        meta_a = (uniq // n_tracks).astype(np.int64)
        meta_b = (uniq % n_tracks).astype(np.int64)
    else:
        meta_a = np.zeros(0, dtype=np.int64)
        meta_b = np.zeros(0, dtype=np.int64)
        wsum = np.zeros(0)

    # Connected components of the meta graph.
    adj = sp.coo_matrix(
        (np.ones(meta_a.shape[0]), (meta_a, meta_b)), shape=(n_tracks, n_tracks)
    )
    n_comp, comp = csgraph.connected_components(adj, directed=False)

    # Recursively cut oversized components.
    rng = np.random.default_rng(0)
    comp_node_weight = np.zeros(n_comp, dtype=np.int64)
    np.add.at(comp_node_weight, comp, nodes_per_track)

    final = np.full(n_tracks, -1, dtype=np.int64)
    next_label = 0
    # Integer weights, scaled like the reference (solve.cc:329).
    int_w = np.maximum((100.0 * wsum).astype(np.int64), 1)

    for c in range(n_comp):
        track_mask = comp == c
        if comp_node_weight[c] <= max_nodes_in_component:
            final[track_mask] = next_label
            next_label += 1
            continue
        e_mask = track_mask[meta_a]
        edges = np.stack([meta_a[e_mask], meta_b[e_mask]], axis=1)
        touched = np.unique(edges) if edges.size else np.zeros(0, dtype=np.int64)
        next_label = _recursive_cut(
            edges,
            int_w[e_mask].astype(np.float64),
            nodes_per_track,
            touched,
            max_nodes_in_component,
            rng,
            final,
            next_label,
        )
        # Tracks in the component with no meta edges become singletons.
        lonely = np.nonzero(track_mask & (final == -1))[0]
        final[lonely] = next_label + np.arange(lonely.size)
        next_label += lonely.size

    # After cutting, cross-cut meta edges are dropped; re-derive connected
    # components so labels equal connectivity (reference: solve.cc:345-364).
    keep = final[meta_a] == final[meta_b]
    adj2 = sp.coo_matrix(
        (np.ones(int(keep.sum())), (meta_a[keep], meta_b[keep])),
        shape=(n_tracks, n_tracks),
    )
    _, comp_final = csgraph.connected_components(adj2, directed=False)

    return comp_final[tracks.track_idx]
