"""Multi-view solver tests: tracks, partitioning, batched LM, end-to-end."""

import numpy as np
import pytest

from lfr_tpu.io import protos
from lfr_tpu.solver import buckets, graph, lm, partition, solve, tracks


def _pair(name1, name2, matches, sims, disp12=None, disp21=None, fact=1.0):
    m = np.asarray(matches, dtype=np.uint32).reshape(-1, 2)
    n = m.shape[0]
    if disp12 is None:
        disp12 = np.zeros((n, 3, 3, 2), np.float32)
    if disp21 is None:
        disp21 = np.zeros((n, 3, 3, 2), np.float32)
    return protos.PairMatches(
        name1, fact, name2, fact, m,
        np.asarray(sims, np.float32), np.asarray(disp21, np.float32), np.asarray(disp12, np.float32),
    )


def _const_grid(d):
    return np.tile(np.asarray(d, np.float32), (3, 3, 1))


# ---------------------------------------------------------------------------
# Graph construction
# ---------------------------------------------------------------------------


def test_build_graph_nodes_and_edges():
    pairs = [
        _pair("a", "b", [[0, 0], [1, 2]], [0.9, 0.8]),
        _pair("b", "c", [[0, 5]], [0.7]),
    ]
    g = graph.build_graph(pairs)
    # Nodes: (a,0),(b,0),(a,1),(b,2),(c,5) -> 5; b:0 shared between pairs.
    assert g.num_nodes == 5
    assert g.num_edges == 6  # two directed per match
    assert g.image_names == ["a", "b", "c"]
    # (b,0) must be a single node referenced by both pairs.
    key = set(zip(g.node_image.tolist(), g.node_feature.tolist()))
    assert (1, 0) in key and len(key) == 5


def test_build_graph_edge_flow_convention():
    d12 = _const_grid([0.1, 0.2])[None]
    d21 = _const_grid([-0.3, 0.4])[None]
    g = graph.build_graph([_pair("a", "b", [[3, 7]], [0.5], d12, d21)])
    # Edge a->b carries the 1->2 flow (disp2), b->a carries disp1.
    src_img = g.node_image[g.edge_src]
    for e in range(2):
        if src_img[e] == 0:
            np.testing.assert_allclose(g.edge_flow[e], d12[0])
        else:
            np.testing.assert_allclose(g.edge_flow[e], d21[0])


def test_banned_images():
    pairs = [
        _pair("a", "b", [[0, 0]], [0.9]),
        _pair("a", "c", [[1, 1]], [0.9]),
    ]
    g = graph.build_graph(pairs, banned_images={"b"})
    assert set(g.image_names) == {"a", "c"}
    assert g.num_nodes == 2


# ---------------------------------------------------------------------------
# Tracks
# ---------------------------------------------------------------------------


def test_tracks_image_disjointness():
    # Two features of image b both match (a,0): only the stronger match may
    # merge; the other stays a separate track.
    pairs = [
        _pair("a", "b", [[0, 0]], [0.9]),
        _pair("a", "b", [[0, 1]], [0.8]),
    ]
    g = graph.build_graph(pairs)
    t = tracks.build_tracks(g, use_native=False)
    assert t.num_tracks == 2
    # (a,0) and (b,0) merged; (b,1) alone.
    node_of = {(int(i), int(f)): k for k, (i, f) in enumerate(zip(g.node_image, g.node_feature))}
    assert t.track_idx[node_of[(0, 0)]] == t.track_idx[node_of[(1, 0)]]
    assert t.track_idx[node_of[(0, 0)]] != t.track_idx[node_of[(1, 1)]]


def test_tracks_transitive_merge():
    pairs = [
        _pair("a", "b", [[0, 0]], [0.9]),
        _pair("b", "c", [[0, 0]], [0.85]),
        _pair("a", "c", [[0, 0]], [0.8]),
    ]
    g = graph.build_graph(pairs)
    t = tracks.build_tracks(g, use_native=False)
    assert t.num_tracks == 1
    assert t.max_track_size == 3
    assert t.is_root.sum() == 1


def test_tracks_native_matches_python():
    rng = np.random.default_rng(0)
    images = ["i%d" % k for k in range(8)]
    pairs = []
    for i in range(len(images)):
        for j in range(i + 1, len(images)):
            n = int(rng.integers(5, 30))
            m = np.stack([rng.integers(0, 40, n), rng.integers(0, 40, n)], axis=1)
            pairs.append(_pair(images[i], images[j], m, rng.random(n)))
    g = graph.build_graph(pairs)
    t_py = tracks.build_tracks(g, use_native=False)
    try:
        from lfr_tpu.solver.native import msf_union_find  # noqa: F401
        t_cc = tracks.build_tracks(g, use_native=True)
    except ImportError:
        pytest.skip("native library not built")
    np.testing.assert_array_equal(t_py.track_idx, t_cc.track_idx)
    np.testing.assert_array_equal(t_py.is_root, t_cc.is_root)


def test_root_is_highest_scoring():
    # Node (b,0) touches both matches -> highest intra-track score sum.
    pairs = [
        _pair("a", "b", [[0, 0]], [0.9]),
        _pair("b", "c", [[0, 0]], [0.8]),
    ]
    g = graph.build_graph(pairs)
    t = tracks.build_tracks(g, use_native=False)
    node_of = {(int(i), int(f)): k for k, (i, f) in enumerate(zip(g.node_image, g.node_feature))}
    assert t.is_root[node_of[(1, 0)]]


# ---------------------------------------------------------------------------
# Partitioning
# ---------------------------------------------------------------------------


def test_partition_respects_components():
    # Two independent clusters -> distinct components without any cutting.
    pairs = [
        _pair("a", "b", [[0, 0]], [0.9]),
        _pair("c", "d", [[0, 0]], [0.9]),
    ]
    g = graph.build_graph(pairs)
    t = tracks.build_tracks(g, use_native=False)
    comp = partition.partition_components(g, t)
    assert comp[0] != comp[2] or comp[0] != comp[3]
    # All nodes of one track share a component.
    for track in range(t.num_tracks):
        assert len(set(comp[t.track_idx == track])) == 1


def test_partition_cuts_oversized():
    # Chain of tracks, cap of 4 nodes -> must split into multiple components.
    rng = np.random.default_rng(1)
    pairs = []
    # 8 tracks of 2 nodes each, weakly connected in a chain by inter-track
    # edges (same images, different features -> disjointness blocks merging).
    for k in range(8):
        pairs.append(_pair("x%d" % k, "y%d" % k, [[0, 0]], [0.95]))
    g = graph.build_graph(pairs)
    t = tracks.build_tracks(g, use_native=False)
    assert t.num_tracks == 8
    comp = partition.partition_components(g, t, max_nodes_in_component=4)
    sizes = np.bincount(comp)
    assert sizes.max() <= 4


# ---------------------------------------------------------------------------
# LM solver
# ---------------------------------------------------------------------------


def _single_batch(esrc, edst, esim, eflow, eintra, n, roots):
    E = len(esrc)
    return lm.ComponentBatch(
        edge_src=np.asarray([esrc], np.int32),
        edge_dst=np.asarray([edst], np.int32),
        edge_sim=np.asarray([esim], np.float32),
        edge_flow=np.asarray([eflow], np.float32),
        edge_intra=np.asarray([eintra], bool),
        edge_valid=np.ones((1, E), bool),
        is_root=np.asarray([roots], bool),
        node_valid=np.ones((1, n), bool),
    )


def test_lm_recovers_consistent_displacements():
    # Chain 0 -> 1 -> 2 with constant flows equal to true offsets; root at 0.
    truth = np.array([[0.0, 0.0], [0.2, -0.1], [0.35, 0.15]])
    flows = [
        _const_grid(truth[1] - truth[0]),
        _const_grid(truth[2] - truth[1]),
        _const_grid(truth[0] - truth[2]),
    ]
    batch = _single_batch(
        [0, 1, 2], [1, 2, 0], [1.0, 1.0, 1.0], flows, [True] * 3, 3, [True, False, False]
    )
    out = lm.solve_batch(batch)[0]
    np.testing.assert_allclose(out, truth, atol=5e-3)


def test_lm_respects_roots_and_bounds():
    # Flow pushing node 1 far outside the box: solution must clamp to 1.
    flows = [_const_grid([5.0, 5.0])]
    batch = _single_batch([0], [1], [1.0], flows, [True], 2, [True, False])
    out = lm.solve_batch(batch)[0]
    np.testing.assert_allclose(out[0], [0, 0], atol=1e-9)
    assert np.all(out[1] <= 1.0 + 1e-6)
    assert np.all(out[1] >= 0.5)  # moved toward the flow


def test_lm_robust_to_outlier():
    # Many consistent edges + one wild inter-track edge with low similarity.
    truth = np.array([[0.0, 0.0], [0.25, 0.25]])
    flows = [_const_grid(truth[1]), _const_grid(-truth[1]), _const_grid([-0.9, 0.9])]
    batch = _single_batch(
        [0, 1, 0],
        [1, 0, 1],
        [1.0, 1.0, 0.2],
        flows,
        [True, True, False],
        2,
        [True, False],
    )
    out = lm.solve_batch(batch)[0]
    np.testing.assert_allclose(out[1], truth[1], atol=0.05)


def test_lm_interpolated_flow_fixed_point():
    # Flow varies over the grid; verify the solution satisfies
    # x1 = flow(x1) (node 0 rooted at 0, edge 0->1 only).
    rng = np.random.default_rng(2)
    grid = (0.3 * rng.standard_normal((3, 3, 2))).astype(np.float32)
    batch = _single_batch([0], [1], [1.0], [grid], [True], 2, [True, False])
    out = lm.solve_batch(batch)[0]
    import jax.numpy as jnp
    from lfr_tpu.ops.interpolate import interpolate_flow

    f = np.asarray(interpolate_flow(jnp.asarray(grid), jnp.float32(0.0), jnp.float32(0.0)))
    # Residual r = x1 - x0 - flow(x0) with x0 frozen at 0 -> x1 = flow(0).
    np.testing.assert_allclose(out[1], f, atol=1e-4)


# ---------------------------------------------------------------------------
# End-to-end solve
# ---------------------------------------------------------------------------


def test_solve_matches_end_to_end():
    # Three images, two independent physical points, self-consistent flows.
    truth = {
        ("a", 0): np.zeros(2), ("b", 0): np.array([0.2, -0.15]), ("c", 0): np.array([-0.1, 0.3]),
        ("a", 1): np.zeros(2), ("b", 1): np.array([-0.25, 0.05]),
    }

    def grid_between(k1, k2):
        return _const_grid(truth[k2] - truth[k1])[None]

    pairs = [
        _pair("a", "b", [[0, 0]], [0.95], grid_between(("a", 0), ("b", 0)), grid_between(("b", 0), ("a", 0))),
        _pair("b", "c", [[0, 0]], [0.9], grid_between(("b", 0), ("c", 0)), grid_between(("c", 0), ("b", 0))),
        _pair("a", "c", [[0, 0]], [0.85], grid_between(("a", 0), ("c", 0)), grid_between(("c", 0), ("a", 0))),
        _pair("a", "b", [[1, 1]], [0.8], grid_between(("a", 1), ("b", 1)), grid_between(("b", 1), ("a", 1))),
    ]
    sols = solve.solve_matches(pairs, verbose=False)
    by_name = {s.image_name: s for s in sols}
    assert set(by_name) == {"a", "b", "c"}

    # Recover solved displacement per (image, feature).
    solved = {}
    for s in sols:
        for fi, d in zip(s.feature_indices, s.displacements):
            solved[(s.image_name, int(fi))] = d

    # Solutions are relative to each track's root; compare differences.
    for (k1, k2) in [(("a", 0), ("b", 0)), (("b", 0), ("c", 0)), (("a", 1), ("b", 1))]:
        got = solved[k2] - solved[k1]
        want = truth[k2] - truth[k1]
        np.testing.assert_allclose(got, want, atol=1e-2)


def test_solve_file_roundtrip(tmp_path):
    pairs = [_pair("a", "b", [[0, 0]], [0.9], _const_grid([0.1, 0.1])[None], _const_grid([-0.1, -0.1])[None], fact=1.5)]
    mf = str(tmp_path / "m.pb")
    sf = str(tmp_path / "s.pb")
    protos.write_matching_file(mf, pairs)
    solve.solve_file(mf, sf, verbose=False)
    sols = protos.read_solution_file(sf)
    assert {s.image_name for s in sols} == {"a", "b"}
    for s in sols:
        assert s.fact == 1.5
        assert s.feature_indices.shape[0] == 1


def test_pack_native_matches_numpy(monkeypatch):
    """The native multithreaded gather/scatter pack must produce byte-equal
    batches to the pure-NumPy fallback on a random multi-component graph."""
    from lfr_tpu.solver import native

    if not native.gather_scatter_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    pairs = []
    for a in range(6):
        for b in range(a + 1, 6):
            n = int(rng.integers(3, 40))
            feats = rng.integers(0, 60, (n, 2))
            pairs.append(
                _pair(
                    f"im{a}", f"im{b}", feats.tolist(),
                    rng.uniform(0.2, 1.0, n).tolist(),
                    rng.normal(0, 0.2, (n, 3, 3, 2)).astype(np.float32),
                    rng.normal(0, 0.2, (n, 3, 3, 2)).astype(np.float32),
                )
            )
    g = graph.build_graph(pairs)
    tr = tracks.build_tracks(g)
    comp = partition.partition_components(g, tr)
    p_nat = buckets.pack_components(g, tr, comp)
    monkeypatch.setattr(native, "gather_scatter_available", lambda: False)
    p_np = buckets.pack_components(g, tr, comp)
    assert len(p_nat.batches) == len(p_np.batches) > 0
    fields = (
        "edge_src", "edge_dst", "edge_sim", "edge_flow",
        "edge_intra", "edge_valid", "is_root", "node_valid",
    )
    for bn, bp, mn, mp_ in zip(
        p_nat.batches, p_np.batches, p_nat.node_maps, p_np.node_maps
    ):
        for f in fields:
            assert np.array_equal(getattr(bn, f), getattr(bp, f)), f
        assert np.array_equal(mn, mp_)


def test_staged_solve_straggler_path(monkeypatch):
    """With the phase-1 budget forced to 1 iteration, every non-trivial
    lane becomes a straggler and must re-dispatch through the compacted
    straggler batch — the result must match the single-phase solve."""
    truth = {
        ("a", 0): np.zeros(2), ("b", 0): np.array([0.2, -0.15]), ("c", 0): np.array([-0.1, 0.3]),
    }

    def grid_between(k1, k2):
        return _const_grid(truth[k2] - truth[k1])[None]

    pairs = [
        _pair("a", "b", [[0, 0]], [0.95], grid_between(("a", 0), ("b", 0)), grid_between(("b", 0), ("a", 0))),
        _pair("b", "c", [[0, 0]], [0.9], grid_between(("b", 0), ("c", 0)), grid_between(("c", 0), ("b", 0))),
        _pair("a", "c", [[0, 0]], [0.85], grid_between(("a", 0), ("c", 0)), grid_between(("c", 0), ("a", 0))),
    ]
    monkeypatch.setattr(solve, "INITIAL_LM_ITER", 1)
    sols = solve.solve_matches(pairs, verbose=False)
    solved = {}
    for s in sols:
        for fi, d in zip(s.feature_indices, s.displacements):
            solved[(s.image_name, int(fi))] = d
    for (k1, k2) in [(("a", 0), ("b", 0)), (("b", 0), ("c", 0))]:
        np.testing.assert_allclose(
            solved[k2] - solved[k1], truth[k2] - truth[k1], atol=1e-2
        )
