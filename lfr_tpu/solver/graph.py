"""Patch-graph construction from two-view matches (host, vectorized).

Replaces the reference's pointer-based C++ graph
(reference: multi-view-refinement/graph.h:11-41, solve.cc:444-481) with a
struct-of-arrays layout: flat edge arrays + per-node metadata, built with
NumPy bulk operations instead of per-match allocations.  The arrays feed
directly into the device solver.

Edge convention (reference: solve.cc:453-479): for a match between
(image1, feat1) and (image2, feat2), the edge 1->2 carries the flow toward
image 2 (``disp2``, i.e. the 1->2 grids) and the edge 2->1 carries
``disp1``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from . import native
from ..io.protos import PairMatches


@dataclasses.dataclass
class PatchGraph:
    """Flat patch graph.

    Nodes are (image, feature) pairs.  ``edge_*`` arrays hold *directed*
    edges (two per match).  ``match_*`` arrays hold one entry per match
    (undirected), used by track building.
    """

    image_names: List[str]                 # image table
    image_facts: np.ndarray                # (I,) downscale factor per image
    node_image: np.ndarray                 # (N,) image idx per node
    node_feature: np.ndarray               # (N,) feature idx per node

    edge_src: np.ndarray                   # (E,) directed
    edge_dst: np.ndarray                   # (E,)
    edge_sim: np.ndarray                   # (E,)
    edge_flow: np.ndarray                  # (E, 3, 3, 2) flow toward dst

    match_src: np.ndarray                  # (M,) undirected (match) endpoints
    match_dst: np.ndarray                  # (M,)
    match_sim: np.ndarray                  # (M,)

    @property
    def num_nodes(self) -> int:
        return self.node_image.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]


def build_graph(
    pairs: Sequence[PairMatches], banned_images: Optional[Set[str]] = None
) -> PatchGraph:
    """Build the patch graph from decoded image pairs.

    ``banned_images`` drops any pair touching those images
    (reference: solve.cc:403,444-446).
    """
    banned = banned_images or set()

    image_ids: Dict[str, int] = {}
    image_facts: List[float] = []

    def image_id(name: str, fact: float) -> int:
        if name not in image_ids:
            image_ids[name] = len(image_ids)
            image_facts.append(fact)
        return image_ids[name]

    per_pair = []
    for pair in pairs:
        if pair.image_name1 in banned or pair.image_name2 in banned:
            continue
        i1 = image_id(pair.image_name1, pair.fact1)
        i2 = image_id(pair.image_name2, pair.fact2)
        if pair.num_matches:
            per_pair.append((i1, i2, pair))

    if not per_pair:
        z = np.zeros(0, dtype=np.int64)
        return PatchGraph(
            list(image_ids),
            np.asarray(image_facts, dtype=np.float32),
            z,
            z,
            z,
            z,
            np.zeros(0, dtype=np.float32),
            np.zeros((0, 3, 3, 2), dtype=np.float32),
            z,
            z,
            np.zeros(0, dtype=np.float32),
        )

    # Kick off the flow-grid scatter FIRST on worker threads: it only needs
    # the per-pair disp blocks and their edge offsets (known from counts),
    # and it is the largest single fill (~72 B/edge, ~150 MB at Madrid
    # scale).  It overlaps the node interning below on the main thread.
    counts = np.asarray([p.num_matches for _, _, p in per_pair], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(2 * counts)])
    moffsets = np.concatenate([[0], np.cumsum(counts)])
    n_match = int(counts.sum())
    n_edge = 2 * n_match

    edge_flow = np.empty((n_edge, 3, 3, 2), np.float32)
    flow_blocks: List[np.ndarray] = []
    flow_offsets: List[int] = []
    elem = 9 * 2 * 4  # (3,3,2) float32
    for k, (_, _, pair) in enumerate(per_pair):
        flow_blocks.append(np.ascontiguousarray(pair.disp2, dtype=np.float32))
        flow_offsets.append(int(offsets[k]) * elem)
        flow_blocks.append(np.ascontiguousarray(pair.disp1, dtype=np.float32))
        flow_offsets.append(int(offsets[k] + counts[k]) * elem)
    flow_async = native.copy_blocks_async(
        flow_blocks, edge_flow, np.asarray(flow_offsets)
    )

    # Gather all (image, feature) endpoints into preallocated buffers
    # (block layout per pair: [side1 x c, side2 x c]) — no per-pair
    # temporaries, no giant concatenate.
    all_img = np.empty(n_edge, dtype=np.int64)
    all_feat = np.empty(n_edge, dtype=np.int64)
    for k, (i1, i2, pair) in enumerate(per_pair):
        b, c = int(offsets[k]), int(counts[k])
        m = pair.matches
        all_img[b : b + c] = i1
        all_img[b + c : b + 2 * c] = i2
        all_feat[b : b + c] = m[:, 0]
        all_feat[b + c : b + 2 * c] = m[:, 1]

    # Node id = index of unique (image, feature) key, in first-seen order to
    # keep deterministic layout.  (A C++ hash-map interner was measured
    # slower than the numpy paths at 4M keys.)
    feat_span = int(all_feat.max()) + 1
    keys = all_img * feat_span + all_feat
    table_size = len(image_ids) * feat_span
    if table_size <= 64_000_000:
        # Dense-table interning: keys are (image, feature) with a small
        # feature span, so first-occurrence + rank are plain O(n) scatter/
        # gathers — no 2M-endpoint sort.  Reverse-order scatter leaves the
        # FIRST occurrence index in the table (later writes land first).
        first = np.full(table_size, -1, dtype=np.int64)
        # Contiguous reversed copy: fancy assignment through a negative-
        # stride view is ~2x slower than through a fresh contiguous buffer.
        rev_keys = np.ascontiguousarray(keys[::-1])
        first[rev_keys] = np.arange(keys.shape[0] - 1, -1, -1, dtype=np.int64)
        uniq_keys = np.flatnonzero(first >= 0)
        order = np.argsort(first[uniq_keys], kind="stable")  # first-seen order
        n_nodes = uniq_keys.shape[0]
        rank_table = np.full(table_size, -1, dtype=np.int64)
        rank_table[uniq_keys[order]] = np.arange(n_nodes, dtype=np.int64)
        node_of_endpoint = rank_table[keys]  # (2*M) node id per endpoint
    else:
        # Sparse feature span: fall back to the sort-based unique.
        uniq, first_pos, inverse = np.unique(
            keys, return_index=True, return_inverse=True
        )
        order = np.argsort(first_pos, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(order.shape[0])
        node_of_endpoint = rank[inverse]  # (2*M) node id per endpoint
        n_nodes = uniq.shape[0]
    node_image = np.zeros(n_nodes, dtype=np.int64)
    node_feature = np.zeros(n_nodes, dtype=np.int64)
    node_image[node_of_endpoint] = all_img
    node_feature[node_of_endpoint] = all_feat

    # Endpoints were appended as [pair0 side1, pair0 side2, pair1 side1,
    # ...] and the directed edge layout is [pair0 fwd, pair0 bwd, pair1
    # fwd, ...] — so ``edge_src`` IS the endpoint array, and every other
    # edge/match column is a pure BLOCK PERMUTATION of it (swap the two
    # halves of each pair block): multithreaded native block copies with
    # zero index arithmetic, falling back to per-pair slice assignment.
    edge_src = node_of_endpoint
    edge_dst = np.empty(n_edge, np.int64)
    edge_sim = np.empty(n_edge, np.float32)
    match_src = np.empty(n_match, np.int64)
    match_dst = np.empty(n_match, np.int64)
    match_sim = np.empty(n_match, np.float32)

    sims = [np.ascontiguousarray(p.similarities, np.float32) for _, _, p in per_pair]
    noe = node_of_endpoint
    if native.copy_blocks_available():
        dst_blocks, dst_offs = [], []
        esim_blocks, esim_offs = [], []
        msrc_blocks, mdst_blocks, msim_offs = [], [], []
        for k in range(counts.shape[0]):
            b, c, mb = int(offsets[k]), int(counts[k]), int(moffsets[k])
            s1 = noe[b : b + c]
            s2 = noe[b + c : b + 2 * c]
            dst_blocks += [s2, s1]
            dst_offs += [b * 8, (b + c) * 8]
            esim_blocks += [sims[k], sims[k]]
            esim_offs += [b * 4, (b + c) * 4]
            msrc_blocks.append(s1)
            mdst_blocks.append(s2)
            msim_offs.append(mb)
        moff8 = [o * 8 for o in msim_offs]
        native.copy_blocks(dst_blocks, edge_dst, np.asarray(dst_offs))
        native.copy_blocks(esim_blocks, edge_sim, np.asarray(esim_offs))
        native.copy_blocks(msrc_blocks, match_src, np.asarray(moff8))
        native.copy_blocks(mdst_blocks, match_dst, np.asarray(moff8))
        native.copy_blocks(sims, match_sim, np.asarray([o * 4 for o in msim_offs]))
    else:
        for k in range(counts.shape[0]):
            b, c, mb = int(offsets[k]), int(counts[k]), int(moffsets[k])
            s1 = noe[b : b + c]
            s2 = noe[b + c : b + 2 * c]
            edge_dst[b : b + c] = s2
            edge_dst[b + c : b + 2 * c] = s1
            edge_sim[b : b + c] = sims[k]
            edge_sim[b + c : b + 2 * c] = sims[k]
            match_src[mb : mb + c] = s1
            match_dst[mb : mb + c] = s2
            match_sim[mb : mb + c] = sims[k]

    # Join the async flow-grid scatter started before interning (falls back
    # to a slice-assignment loop when the native library is absent).
    if not flow_async():
        for blk, off in zip(flow_blocks, flow_offsets):
            start = off // elem
            edge_flow[start : start + blk.shape[0]] = blk

    return PatchGraph(
        image_names=list(image_ids),
        image_facts=np.asarray(image_facts, dtype=np.float32),
        node_image=node_image,
        node_feature=node_feature,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_sim=edge_sim,
        edge_flow=edge_flow,
        match_src=match_src,
        match_dst=match_dst,
        match_sim=match_sim,
    )
