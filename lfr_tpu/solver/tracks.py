"""Track building: maximum-spanning-forest with image-disjointness.

Union-find over match edges sorted by similarity (descending); a merge is
rejected when the two trees already observe a common image, enforcing at
most one feature per image per track
(reference: multi-view-refinement/solve.cc:67-77,488-541).  Root (anchor)
selection per track follows solve.cc:551-582.

The MSF is inherently sequential; it runs on host (NumPy + tight Python
loop, optionally replaced by the C++ native kernel when built).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .graph import PatchGraph


@dataclasses.dataclass
class Tracks:
    track_idx: np.ndarray  # (N,) track id per node
    is_root: np.ndarray    # (N,) bool anchor mask
    num_tracks: int
    max_track_size: int


def _msf_python(
    order: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    node_image: np.ndarray,
    n_nodes: int,
) -> np.ndarray:
    """Returns parent array (-1 for roots)."""
    parent = np.full(n_nodes, -1, dtype=np.int64)
    images_in_tree = [{int(node_image[i])} for i in range(n_nodes)]

    def find(i: int) -> int:
        root = i
        while parent[root] != -1:
            root = parent[root]
        # Path compression.
        while parent[i] != -1:
            parent[i], i = root, parent[i]
        return root

    for e in order:
        r1 = find(src[e])
        r2 = find(dst[e])
        if r1 == r2:
            continue
        s1 = images_in_tree[r1]
        s2 = images_in_tree[r2]
        # Reject merges that would put two features of one image in a track
        # (reference: solve.cc:507-511).
        if len(s1) + len(s2) != len(s1 | s2):
            continue
        # Smaller tree merges into larger (reference: solve.cc:512-521).
        if len(s1) < len(s2):
            r1, r2 = r2, r1
            s1, s2 = s2, s1
        parent[r2] = r1
        s1.update(s2)
        images_in_tree[r2] = set()
    return parent


def build_tracks(graph: PatchGraph, use_native: bool = True) -> Tracks:
    n = graph.num_nodes
    if n == 0:
        return Tracks(np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool), 0, 0)

    # Sort matches by similarity descending; ties broken like the C++
    # (sim, src, dst) tuple sort: larger src then dst first after reverse.
    order = None
    parent = None
    if use_native:
        try:
            from .native import msf_union_find, sort_matches_desc

            order = sort_matches_desc(
                graph.match_sim, graph.match_src, graph.match_dst
            )
            parent = msf_union_find(
                order, graph.match_src, graph.match_dst, graph.node_image, n
            )
        except ImportError:
            parent = None
    if order is None:
        order = np.lexsort((graph.match_dst, graph.match_src, graph.match_sim))[::-1]
    if parent is None:
        parent = _msf_python(order, graph.match_src, graph.match_dst, graph.node_image, n)

    # Track ids from roots, in node order (reference: solve.cc:526-541).
    roots_mask = parent == -1
    track_idx = np.full(n, -1, dtype=np.int64)
    track_idx[roots_mask] = np.arange(int(roots_mask.sum()))
    # Resolve every node to its root (vectorized pointer jumping).
    resolved = parent.copy()
    resolved[roots_mask] = np.nonzero(roots_mask)[0]
    while True:
        grand = np.where(parent[resolved] == -1, resolved, parent[resolved])
        if np.array_equal(grand, resolved):
            break
        resolved = grand
    track_idx = track_idx[resolved]

    n_tracks = int(roots_mask.sum())
    sizes = np.bincount(track_idx, minlength=n_tracks)
    max_track = int(sizes.max()) if n_tracks else 0

    # Anchor selection: per node, score = sum of intra-track out-edge sims;
    # highest-scored node of each track becomes the frozen root
    # (reference: solve.cc:551-582).
    intra = track_idx[graph.edge_src] == track_idx[graph.edge_dst]
    scores = np.bincount(
        graph.edge_src[intra],
        weights=graph.edge_sim[intra].astype(np.float64),
        minlength=n,
    )

    # Stable emulation of the C++ sort by (score, node_idx) descending; the
    # first node of each track in that order is its anchor.
    order = np.lexsort((np.arange(n), scores))[::-1]
    is_root = np.zeros(n, dtype=bool)
    _, first_idx = np.unique(track_idx[order], return_index=True)
    is_root[order[first_idx]] = True

    return Tracks(track_idx, is_root, n_tracks, max_track)
