"""Multi-view solve driver: matches file -> refined displacements.

The TPU-native counterpart of the reference ``solve`` binary
(reference: multi-view-refinement/solve.cc:375-682): host builds the patch
graph, tracks, and bounded components; the device solves all components as
padded LM batches; results are written as a reference-compatible
SolutionFile.  Prints the same health counters the reference does
(solve.cc:483-485,534,548-549,585-591,606,637-641,666-670).
"""

from __future__ import annotations

import argparse
import time
from typing import List, Optional, Sequence, Set

import numpy as np

from ..io import protos
from . import buckets as buckets_mod
from . import graph as graph_mod
from . import partition as partition_mod
from . import tracks as tracks_mod
from .lm import solve_batch

#: Phase-1 LM budget: covers the p90 of production convergence (median 4
#: / p90 9 iterations); lanes still running after this many iterations
#: re-dispatch as a compacted straggler batch for the remaining budget.
INITIAL_LM_ITER = 16


def solve_matches(
    pairs: Sequence[protos.PairMatches],
    banned_images: Optional[Set[str]] = None,
    max_iter: int = None,
    use_mesh: Optional[bool] = None,
    verbose: bool = True,
) -> List[protos.ImageSolution]:
    """Full multi-view optimization over decoded match pairs.

    ``use_mesh``: shard component batches over all devices (component
    parallelism); default: automatic when more than one device is visible.
    """
    import jax

    from ..config import LM_MAX_ITERATIONS

    if max_iter is None:
        max_iter = LM_MAX_ITERATIONS
    if use_mesh is None:
        use_mesh = jax.device_count() > 1
    mesh = None
    if use_mesh:
        from ..parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh()

    def log(msg):
        if verbose:
            print(msg, flush=True)

    graph = graph_mod.build_graph(pairs, banned_images)
    log(f"# graph nodes: {graph.num_nodes}")
    log(f"# graph edges: {graph.num_edges}")

    t_start = time.time()
    tracks = tracks_mod.build_tracks(graph)
    log(f"# tracks: {tracks.num_tracks}")
    log(f"max track size: {tracks.max_track_size}")

    t1 = time.time()
    component_idx = partition_mod.partition_components(graph, tracks)
    t2 = time.time()
    log(f"Graph-cut time: {int((t2 - t1) * 1000)}ms")
    n_components = int(component_idx.max()) + 1 if component_idx.size else 0
    log(f"# components: {n_components}")
    if n_components:
        log(f"max component size: {int(np.bincount(component_idx).max())}")

    positions = np.zeros((graph.num_nodes, 2), dtype=np.float32)
    t1 = time.time()
    # Streamed packing: each bucket batch is dispatched (async) as soon as
    # it is packed, so the host packs batch k+1 while the device solves
    # batch k; no result is synced until every batch is in flight.
    #
    # Two-phase budget: a vmapped while_loop iterates until its SLOWEST
    # lane converges (production profile: median 4 / p90 9 iterations,
    # sub-percent tail at the 100 cap), so every bucket first runs a
    # short budget, then only the unconverged lanes re-dispatch as a
    # compacted straggler batch for the remaining iterations (measured
    # 74 s -> ~1/6th on the 30-camera scene's (512, 32, 512) bucket).
    initial_iter = min(INITIAL_LM_ITER, max_iter)
    pending = []
    n_stragglers = 0
    for batch, node_map in buckets_mod.iter_packed(graph, tracks, component_idx):
        if mesh is not None:
            from ..parallel.sharded import sharded_solve_batch

            solved = sharded_solve_batch(batch, mesh, max_iter=max_iter)
            done = None
        else:
            from .lm import solve_component_batch_staged
            import jax.numpy as jnp

            solved, done = solve_component_batch_staged(
                jnp.asarray(batch.edge_src),
                jnp.asarray(batch.edge_dst),
                jnp.asarray(batch.edge_sim),
                jnp.asarray(batch.edge_flow),
                jnp.asarray(batch.edge_intra),
                jnp.asarray(batch.edge_valid),
                jnp.asarray(batch.is_root),
                jnp.asarray(batch.node_valid),
                max_iter=initial_iter,
            )
        pending.append((solved, done, batch, node_map))
    for solved, done, batch, node_map in pending:
        solved = np.asarray(solved)
        if done is not None and initial_iter < max_iter:
            strag = np.nonzero(
                ~np.asarray(done) & (node_map >= 0).any(axis=1)
            )[0]
            if strag.size:
                from .lm import solve_component_batch_staged
                import jax.numpy as jnp

                n_stragglers += int(strag.size)
                solved = solved.copy()  # np view of a jax array is read-only
                # Compact to a pow2 sub-batch (shape-stable programs).
                bsub = 1 << max(2, int(strag.size - 1).bit_length())
                sel = np.zeros(bsub, np.int64)
                sel[: strag.size] = strag
                sub, done2 = solve_component_batch_staged(
                    jnp.asarray(batch.edge_src[sel]),
                    jnp.asarray(batch.edge_dst[sel]),
                    jnp.asarray(batch.edge_sim[sel]),
                    jnp.asarray(batch.edge_flow[sel]),
                    jnp.asarray(batch.edge_intra[sel]),
                    jnp.asarray(batch.edge_valid[sel]),
                    jnp.asarray(batch.is_root[sel]),
                    jnp.asarray(batch.node_valid[sel]),
                    x0=jnp.asarray(solved[sel]),
                    max_iter=max_iter - initial_iter,
                )
                solved[strag] = np.asarray(sub)[: strag.size]
        valid = node_map >= 0
        positions[node_map[valid]] = solved[valid]
    t2 = time.time()
    if n_stragglers:
        log(f"# straggler re-solves past {initial_iter} iterations: {n_stragglers}")
    log(f"Solver time: {int((t2 - t1) * 1000)}ms")
    log(f"Total time: {int((t2 - t_start) * 1000)}ms")

    nb_outside = int((np.abs(positions) > 0.5).any(axis=1).sum())
    log(f"# points with at least one coordinate > 0.5: {nb_outside}")

    # Assemble per-image solutions; images ordered by first appearance in the
    # node list, features in node order (reference: solve.cc:643-671).
    solutions: List[protos.ImageSolution] = []
    n_images = len(graph.image_names)
    if graph.num_nodes:
        first_seen = np.full(n_images, graph.num_nodes, dtype=np.int64)
        np.minimum.at(first_seen, graph.node_image, np.arange(graph.num_nodes))
        node_order = np.argsort(graph.node_image, kind="stable")
        img_sorted = graph.node_image[node_order]
        starts = np.searchsorted(img_sorted, np.arange(n_images))
        ends = np.append(starts[1:], graph.num_nodes)
        for img in np.argsort(first_seen, kind="stable"):
            if first_seen[img] == graph.num_nodes:
                continue  # image present only via banned pairs
            nodes = node_order[starts[img] : ends[img]]
            solutions.append(
                protos.ImageSolution(
                    graph.image_names[img],
                    float(graph.image_facts[img]),
                    graph.node_feature[nodes].astype(np.uint32),
                    positions[nodes],
                )
            )
    return solutions


def solve_file(
    matches_file: str,
    output_file: str,
    banned_images: Optional[Set[str]] = None,
    verbose: bool = True,
) -> None:
    pairs = protos.read_matching_file(matches_file)
    solutions = solve_matches(pairs, banned_images, verbose=verbose)
    protos.write_solution_file(output_file, solutions)


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="multi-view patch-graph solver")
    parser.add_argument("--matches_file", required=True)
    parser.add_argument("--output_file", required=True)
    parser.add_argument("--banned_images", nargs="*", default=[])
    args = parser.parse_args(argv)
    solve_file(args.matches_file, args.output_file, set(args.banned_images))


if __name__ == "__main__":
    main()
