"""Sharded training and solving over a device mesh.

``sharded_train_step`` jits the full PANet training step with dp-sharded
batches and tensor-parallel refine-head weights; ``sharded_solve_batch``
shards the LM component batch over the flattened mesh (component
parallelism: each device solves an independent slice of components —
collectives only at the result gather, exactly because the graph
partitioner made components independent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import train as train_mod
from ..solver.lm import ComponentBatch, solve_component_batch
from . import mesh as mesh_mod


def make_sharded_train_step(tx, mesh: Mesh, compute_dtype=jnp.bfloat16):
    """Returns (jitted_step, shard_state_fn).

    The step's batch inputs are dp-sharded, optimizer/model state sharded by
    the tensor-parallel rules, outputs kept sharded.
    """
    base_step = train_mod.make_train_step(tx, compute_dtype)
    batch_shard = mesh_mod.batch_sharding(mesh)

    def place_state(state: train_mod.TrainState) -> train_mod.TrainState:
        p_shard = mesh_mod.param_shardings(mesh, state.params)
        params = jax.device_put(state.params, p_shard)
        # batch_stats follow the refine-channel sharding of their conv.
        bs_shard = mesh_mod.param_shardings(mesh, state.batch_stats)
        batch_stats = jax.device_put(state.batch_stats, bs_shard)
        opt_state = jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map(
                lambda leaf: (
                    mesh_mod.param_shardings(mesh, leaf)
                    if isinstance(leaf, dict)
                    else NamedSharding(mesh, P())
                ),
                state.opt_state,
                is_leaf=lambda x: isinstance(x, dict),
            ),
        )
        return train_mod.TrainState(params, batch_stats, opt_state, state.step)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, ref, tgt, delta):
        ref = jax.lax.with_sharding_constraint(ref, batch_shard)
        tgt = jax.lax.with_sharding_constraint(tgt, batch_shard)
        return base_step(state, ref, tgt, delta)

    return step, place_state


def sharded_solve_batch(batch: ComponentBatch, mesh: Mesh, max_iter: int = 25) -> np.ndarray:
    """Solve a component bucket with the batch dim sharded over all devices."""
    n_dev = mesh.devices.size
    flat = NamedSharding(mesh, P(("dp", "mp")))

    def put(x):
        padded, orig = mesh_mod.pad_to_multiple(np.asarray(x), n_dev, axis=0)
        return jax.device_put(padded, flat), orig

    esrc, b = put(batch.edge_src)
    edst, _ = put(batch.edge_dst)
    esim, _ = put(batch.edge_sim)
    eflow, _ = put(batch.edge_flow)
    eintra, _ = put(batch.edge_intra)
    evalid, _ = put(batch.edge_valid)
    root, _ = put(batch.is_root)
    nvalid, _ = put(batch.node_valid)

    out = solve_component_batch(
        esrc, edst, esim, eflow, eintra, evalid, root, nvalid, max_iter=max_iter
    )
    return np.asarray(out)[:b]


def run_ba_sharded(problem, mesh: Mesh, iterations: int = 30):
    """Bundle adjustment with observations sharded over the mesh.

    The O-heavy work — per-observation residuals/Jacobians and their
    segment-sums into camera/point blocks — partitions along the
    observation axis; GSPMD inserts the cross-device reductions
    (psum-style collectives) when assembling the reduced camera system.
    Cameras/points stay replicated (they are tiny next to observations).
    """
    import jax

    from ..sfm import ba as ba_mod

    n_cameras = problem.R.shape[0]
    n_points = problem.points.shape[0]
    pt_idx, pt_valid = ba_mod._group_by_point(problem.obs_pt, n_points)
    fscale0 = problem.fscale if problem.fscale is not None else np.zeros(n_cameras)

    n_dev = mesh.devices.size
    obs_shard = NamedSharding(mesh, P(("dp", "mp")))
    rep = NamedSharding(mesh, P())

    def put_obs(x):
        # Padded rows point at camera/point 0 but carry zero focal below,
        # which zeroes their residuals and Jacobians.
        padded, orig = mesh_mod.pad_to_multiple(np.asarray(x), n_dev, axis=0)
        return jax.device_put(padded, obs_shard), orig

    obs_cam, n_obs = put_obs(problem.obs_cam)
    obs_pt, _ = put_obs(problem.obs_pt)
    obs_uv, _ = put_obs(problem.obs_uv)
    # Zero focal on padding rows nullifies their contribution.
    focal_padded, _ = mesh_mod.pad_to_multiple(np.asarray(problem.obs_focal), n_dev, axis=0)
    obs_focal = jax.device_put(focal_padded, obs_shard)

    R, t, fscale, X, cost = ba_mod.ba_iterate(
        jax.device_put(jnp.asarray(problem.R), rep),
        jax.device_put(jnp.asarray(problem.t), rep),
        jax.device_put(jnp.asarray(fscale0, dtype=jnp.float32), rep),
        jax.device_put(jnp.asarray(problem.points), rep),
        obs_cam,
        obs_pt,
        obs_uv,
        obs_focal,
        jax.device_put(jnp.asarray(ba_mod._free_mask(problem)), rep),
        jax.device_put(jnp.asarray(pt_idx), rep),
        jax.device_put(jnp.asarray(pt_valid), rep),
        n_cameras=n_cameras,
        iterations=iterations,
    )
    return (
        np.asarray(R),
        np.asarray(t),
        np.asarray(fscale),
        np.asarray(X),
        float(cost),
    )
