"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfr_tpu.parallel import mesh as mesh_mod
from lfr_tpu.parallel import sharded


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mesh = mesh_mod.make_mesh(8)
    assert mesh.shape == {"dp": 8, "mp": 1}
    mesh = mesh_mod.make_mesh(8, dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}


def test_sharded_train_step_runs_and_matches_single_device():
    from lfr_tpu.models import train as train_mod

    state, tx = train_mod.create_train_state(jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ref = (rng.random((8, 33, 33, 3)) * 255).astype(np.float32)
    tgt = (rng.random((8, 33, 33, 3)) * 255).astype(np.float32)
    delta = (rng.random((8, 2)) * 0.1).astype(np.float32)

    # Single-device baseline loss.
    step0 = jax.jit(train_mod.make_train_step(tx, jnp.float32))
    _, loss_single = step0(state, jnp.asarray(ref), jnp.asarray(tgt), jnp.asarray(delta))

    # 4x2 mesh run.
    state2, tx2 = train_mod.create_train_state(jax.random.PRNGKey(0), compute_dtype=jnp.float32)
    mesh = mesh_mod.make_mesh(8, dp=4, mp=2)
    step, place = sharded.make_sharded_train_step(tx2, mesh, jnp.float32)
    state2 = place(state2)
    state2, loss_sharded = step(state2, jnp.asarray(ref), jnp.asarray(tgt), jnp.asarray(delta))
    # Collectives change the reduction order; agreement is approximate.
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=2e-3)


def test_sharded_solve_matches_local():
    from lfr_tpu.solver.lm import ComponentBatch, solve_batch

    b = 6  # deliberately not divisible by 8 -> exercises padding
    rng = np.random.default_rng(1)
    flow = (0.2 * rng.standard_normal((b, 4, 3, 3, 2))).astype(np.float32)
    cb = ComponentBatch(
        edge_src=np.zeros((b, 4), np.int32),
        edge_dst=np.tile(np.array([1, 2, 1, 2], np.int32), (b, 1)),
        edge_sim=np.ones((b, 4), np.float32),
        edge_flow=flow,
        edge_intra=np.ones((b, 4), bool),
        edge_valid=np.ones((b, 4), bool),
        is_root=np.tile(np.array([True, False, False]), (b, 1)),
        node_valid=np.ones((b, 3), bool),
    )
    local = solve_batch(cb, max_iter=25)
    mesh = mesh_mod.make_mesh(8)
    dist = sharded.sharded_solve_batch(cb, mesh, max_iter=25)
    assert dist.shape == local.shape
    np.testing.assert_allclose(dist, local, atol=1e-5)


def test_graft_entry_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (64, 2) and out[1].shape == (64, 2)
    mod.dryrun_multichip(8)


def test_sharded_ba_matches_local():
    from test_ba import _problem_from_scene

    from lfr_tpu.parallel import sharded
    from lfr_tpu.sfm import ba
    from lfr_tpu.utils import synthetic

    rng = np.random.default_rng(5)
    scene = synthetic.random_scene(rng, num_points=60, num_cameras=4)
    prob = _problem_from_scene(scene, rng, fix=(0, 1))
    R_l, t_l, fs_l, X_l, cost_l = ba.run_ba(prob, iterations=25)

    mesh = mesh_mod.make_mesh(8)
    R_s, t_s, fs_s, X_s, cost_s = sharded.run_ba_sharded(prob, mesh, iterations=25)
    # Sharded reductions change summation order; agreement is approximate
    # but the solutions must coincide.
    np.testing.assert_allclose(R_s, R_l, atol=1e-4)
    np.testing.assert_allclose(X_s, X_l, atol=1e-3)
    # Noiseless data converges to ~machine-zero cost on both paths.
    np.testing.assert_allclose(cost_s, cost_l, rtol=1e-3, atol=1e-6)
