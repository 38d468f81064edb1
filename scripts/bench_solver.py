"""Benchmark the multi-view solve on a synthetic match graph.

Generates a Fountain-scale (and larger) patch graph with self-consistent
flows and measures wall-clock of each stage: graph build, tracks,
partition, batched LM — mirroring the timing breakdown the reference's C++
solver prints (reference: multi-view-refinement/solve.cc:585-641).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def synth_match_graph(rng, n_images=12, n_points=3000, visibility=0.5):
    """Pairwise matches over shared synthetic 'points' with smooth flows."""
    from lfr_tpu.io.protos import PairMatches

    offsets = rng.uniform(-0.3, 0.3, (n_images, n_points, 2)).astype(np.float32)
    visible = rng.random((n_images, n_points)) < visibility
    pairs = []
    for a in range(n_images):
        for b in range(a + 1, n_images):
            shared = np.nonzero(visible[a] & visible[b])[0]
            if shared.size == 0:
                continue
            m = np.stack([shared, shared], axis=1).astype(np.uint32)
            sims = rng.uniform(0.5, 1.0, shared.size).astype(np.float32)
            d12 = np.tile(
                (offsets[b, shared] - offsets[a, shared])[:, None, None, :], (1, 3, 3, 1)
            )
            d21 = -d12
            pairs.append(
                PairMatches(f"im{a:03d}", 1.0, f"im{b:03d}", 1.0, m, sims, d21, d12)
            )
    return pairs


def main():
    from lfr_tpu.solver import buckets, graph, lm, partition, tracks

    rng = np.random.default_rng(0)
    for n_images, n_points in [(12, 3000), (30, 10000)]:
        pairs = synth_match_graph(rng, n_images, n_points)
        t0 = time.perf_counter()
        g = graph.build_graph(pairs)
        t1 = time.perf_counter()
        tr = tracks.build_tracks(g)
        t2 = time.perf_counter()
        comp = partition.partition_components(g, tr)
        t3 = time.perf_counter()
        packed = buckets.pack_components(g, tr, comp)
        import jax
        import jax.numpy as jnp

        def solve_all():
            outs = []
            for batch in packed.batches:
                outs.append(
                    lm.solve_component_batch(
                        jnp.asarray(batch.edge_src),
                        jnp.asarray(batch.edge_dst),
                        jnp.asarray(batch.edge_sim),
                        jnp.asarray(batch.edge_flow),
                        jnp.asarray(batch.edge_intra),
                        jnp.asarray(batch.edge_valid),
                        jnp.asarray(batch.is_root),
                        jnp.asarray(batch.node_valid),
                    )
                )
            # block_until_ready does not reliably block on the axon TPU
            # tunnel; np.asarray is the only trustworthy sync.
            for o in outs:
                np.asarray(o)

        t4 = time.perf_counter()
        solve_all()
        t5 = time.perf_counter()
        # Steady state (compiled).
        t6 = time.perf_counter()
        solve_all()
        t7 = time.perf_counter()
        print(
            f"images={n_images} nodes={g.num_nodes} edges={g.num_edges} "
            f"tracks={tr.num_tracks} | build {1e3*(t1-t0):.0f}ms "
            f"msf {1e3*(t2-t1):.0f}ms cut {1e3*(t3-t2):.0f}ms "
            f"pack {1e3*(t4-t3):.0f}ms solve(first) {1e3*(t5-t4):.0f}ms "
            f"solve(steady) {1e3*(t7-t6):.0f}ms"
        )


if __name__ == "__main__":
    main()
