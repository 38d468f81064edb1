"""Multi-process (multi-host-shaped) execution of the sharded solver + BA.

The reference is strictly single-machine (SURVEY §5: no distributed
backend); the TPU-native framework scales across hosts with
``jax.distributed`` + a global mesh.  This module provides:

  * ``put_global`` — build a globally-sharded array from process-LOCAL
    data (each host feeds only the rows its devices own; nothing is
    replicated over DCN that doesn't need to be);
  * ``worker_main`` — the per-process entry: initialize the distributed
    runtime, build the global mesh, run a deterministic sharded component
    solve + bundle adjustment with process-local data feeding, and report
    wall-clock for scaling-efficiency measurement;
  * ``launch`` — spawn N worker processes on this machine (CPU backend,
    ``--xla_force_host_platform_device_count`` per process) and collect the
    timing report.  This is how 2-host semantics (process-local shards,
    cross-process collectives over the "DCN" boundary) are exercised
    without a second machine.

Bucket assignment is host-aware: every process computes the same global
batch shapes (SPMD requires identical programs), but materializes only the
row-slice its own devices address — see ``_local_rows``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from typing import List, Optional

import numpy as np


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def put_global(x: np.ndarray, mesh, spec):
    """Globally-sharded array from process-local data.

    Single-process: plain device_put.  Multi-process: ``x`` must be this
    process's shard (for a sharded spec) or the full array (replicated
    spec); the global shape is inferred from the process count.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def _local_rows(global_rows: int, axis_len_per_process: Optional[int] = None):
    """Row range [lo, hi) of the batch axis owned by this process.

    Host-aware bucket assignment: the leading (batch/component) axis is
    sharded evenly across processes in process-id order.
    """
    import jax

    p = jax.process_count()
    pid = jax.process_index()
    per = global_rows // p
    return pid * per, (pid + 1) * per


def _demo_component_batch(global_b: int, n: int = 8, e: int = 24):
    """Deterministic solvable component bucket (global shapes):
    ``global_b`` components of ``n`` nodes / ``e`` directed edges."""
    from ..solver.lm import ComponentBatch

    rng = np.random.default_rng(7)
    flow = rng.uniform(-0.2, 0.2, (global_b, e, 3, 3, 2)).astype(np.float32)
    esrc = rng.integers(0, n, (global_b, e)).astype(np.int32)
    edst = (esrc + 1 + rng.integers(0, n - 1, (global_b, e))).astype(np.int32) % n
    batch = ComponentBatch(
        edge_src=esrc,
        edge_dst=edst,
        edge_sim=rng.uniform(0.5, 1.0, (global_b, e)).astype(np.float32),
        edge_flow=flow,
        edge_intra=rng.random((global_b, e)) < 0.7,
        edge_valid=np.ones((global_b, e), bool),
        is_root=np.tile(np.eye(1, n, dtype=bool), (global_b, 1)),
        node_valid=np.ones((global_b, n), bool),
    )
    return batch


def _demo_ba_problem(n_cam: int = 6, n_pts: int = 60, noise_px: float = 0.25):
    """Deterministic dense BA problem: every camera sees every point.

    ``noise_px`` perturbs the observations (pixel units) so the converged
    cost is NONZERO: a perfect synthetic problem times the code but cannot
    catch numerical errors in the sharded Schur assembly or Gloo
    reductions — a wrong sign in a collective still converges to cost 0.
    The dryruns additionally assert sharded == single-device parameter
    parity on this noisy problem."""
    from ..sfm import ba as ba_mod

    rng = np.random.default_rng(11)
    f = 500.0
    pts = rng.uniform(-1, 1, (n_pts, 3))
    pts[:, 2] += 6.0
    R = np.tile(np.eye(3), (n_cam, 1, 1))
    t = np.zeros((n_cam, 3))
    t[:, 0] = np.linspace(-0.5, 0.5, n_cam)
    obs_cam = np.repeat(np.arange(n_cam), n_pts)
    obs_pt = np.tile(np.arange(n_pts), n_cam)
    cam_pts = np.einsum("cij,pj->cpi", R, pts) + t[:, None]
    obs_uv = (cam_pts[..., :2] / cam_pts[..., 2:]).reshape(-1, 2)
    obs_uv = obs_uv + rng.normal(0.0, noise_px / f, obs_uv.shape)
    order = np.argsort(obs_pt, kind="stable")
    fixed = np.zeros(n_cam, bool)
    fixed[:2] = True
    return ba_mod.BAProblem(
        R,
        t,
        pts + rng.normal(0, 0.01, pts.shape),
        obs_cam[order],
        obs_pt[order],
        obs_uv[order],
        np.full(n_cam * n_pts, f),
        fixed,
    )


def solve_batch_distributed(batch, mesh, max_iter: int = 25) -> np.ndarray:
    """Sharded component solve with process-local data feeding.

    ``batch`` holds GLOBAL shapes; each process slices out and uploads only
    its own rows.  Returns the full solved array on every process.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..solver.lm import solve_component_batch
    from . import mesh as mesh_mod

    n_dev = mesh.devices.size
    spec = P(tuple(mesh.axis_names))
    lo, hi = _local_rows(batch.batch)

    def put(x):
        padded, orig = mesh_mod.pad_to_multiple(np.asarray(x), n_dev, axis=0)
        if jax.process_count() > 1:
            per = padded.shape[0] // jax.process_count()
            local = padded[jax.process_index() * per : (jax.process_index() + 1) * per]
        else:
            local = padded
        return put_global(local, mesh, spec), orig

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
    if jax.process_count() > 1:
        out = multihost_utils.process_allgather(out, tiled=True)
    return np.asarray(out)[:b]


def worker_main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num_processes", type=int, required=True)
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--global_batch", type=int, default=64)
    parser.add_argument("--iterations", type=int, default=10)
    parser.add_argument("--ba_cams", type=int, default=6)
    parser.add_argument("--ba_pts", type=int, default=60)
    parser.add_argument("--ba_iters", type=int, default=8)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    # Emulate per-host CPU ownership: each worker gets a disjoint core
    # slice (a real second host brings its own cores).  Without this the
    # N workers each spawn an all-cores XLA thread pool and the measured
    # "multi-process overhead" is just N-fold thread oversubscription.
    if args.num_processes > 1:
        try:
            cores = sorted(os.sched_getaffinity(0))
            per = max(1, len(cores) // args.num_processes)
            mine = cores[args.process_id * per : (args.process_id + 1) * per]
            if mine:
                os.sched_setaffinity(0, mine)
        except (AttributeError, OSError):
            pass

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from . import mesh as mesh_mod

    n_dev = jax.device_count()
    mesh = mesh_mod.make_mesh(n_dev, dp=n_dev, mp=1)

    # --- Sharded component solve, process-local feeding. ------------------
    batch = _demo_component_batch(args.global_batch)
    t0 = time.perf_counter()
    out = solve_batch_distributed(batch, mesh, max_iter=args.iterations)
    warm_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    out = solve_batch_distributed(batch, mesh, max_iter=args.iterations)
    solve_ms = (time.perf_counter() - t0) * 1e3
    assert out.shape[0] == args.global_batch and np.isfinite(out).all()

    # --- Sharded BA with observation-axis process-local feeding. ----------
    from ..sfm import ba as ba_mod

    n_cam, n_pts = args.ba_cams, args.ba_pts
    prob = _demo_ba_problem(n_cam, n_pts)

    pt_idx, pt_valid = ba_mod._group_by_point(prob.obs_pt, n_pts)
    from . import mesh as mesh_mod2

    obs_spec = P(tuple(mesh.axis_names))
    rep = P()

    def put_obs(x):
        padded, orig = mesh_mod2.pad_to_multiple(np.asarray(x), n_dev, axis=0)
        per = padded.shape[0] // args.num_processes
        local = padded[args.process_id * per : (args.process_id + 1) * per]
        return put_global(local, mesh, obs_spec), orig

    import jax.numpy as jnp

    def run_ba_once():
        oc, _ = put_obs(prob.obs_cam)
        op, _ = put_obs(prob.obs_pt)
        ouv, _ = put_obs(prob.obs_uv)
        focal_padded, _ = mesh_mod2.pad_to_multiple(prob.obs_focal, n_dev, axis=0)
        per = focal_padded.shape[0] // args.num_processes
        ofo = put_global(
            focal_padded[args.process_id * per : (args.process_id + 1) * per],
            mesh,
            obs_spec,
        )
        Rj, tj, fs, X, cost = ba_mod.ba_iterate(
            put_global(prob.R, mesh, rep),
            put_global(prob.t, mesh, rep),
            put_global(np.zeros(n_cam, np.float32), mesh, rep),
            put_global(prob.points, mesh, rep),
            oc, op, ouv, ofo,
            put_global(ba_mod._free_mask(prob), mesh, rep),
            put_global(pt_idx, mesh, rep),
            put_global(pt_valid, mesh, rep),
            n_cameras=n_cam,
            iterations=args.ba_iters,
        )
        cost = float(
            np.asarray(
                multihost_utils.process_allgather(jnp.reshape(cost, (1,)), tiled=True)
            )[0]
        )
        # process_allgather reshards the global array to fully-replicated
        # and hands back the logical value (same pattern as cost above).
        return cost, np.asarray(multihost_utils.process_allgather(tj, tiled=True))

    t0 = time.perf_counter()
    cost, t_solved = run_ba_once()
    ba_warm_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    cost, t_solved = run_ba_once()
    ba_ms = (time.perf_counter() - t0) * 1e3
    rms = float(np.sqrt(2 * cost / prob.obs_cam.shape[0]))
    assert np.isfinite(cost), "distributed BA diverged"

    report = {
        "num_processes": args.num_processes,
        "process_id": args.process_id,
        "global_devices": int(n_dev),
        "solve_ms": round(solve_ms, 2),
        "solve_warm_ms": round(warm_ms, 2),
        "ba_ms": round(ba_ms, 2),
        "ba_warm_ms": round(ba_warm_ms, 2),
        "ba_obs": int(prob.obs_cam.shape[0]),
        "ba_rms_px": round(rms, 4),
        # Solved-parameter fingerprints so the launcher can assert
        # numeric parity between the 1-process and N-process runs (a
        # wrong Gloo reduction would still converge — to different
        # numbers).  Camera translations + the first solved component's
        # positions are small enough to ship in the JSON report.
        "ba_t": np.asarray(t_solved, np.float64).ravel().tolist(),
        "solve_c0": np.asarray(out[0], np.float64).ravel().tolist(),
    }
    print(json.dumps(report), flush=True)
    if args.out and args.process_id == 0:
        with open(args.out, "w") as fh:
            json.dump(report, fh)
    jax.distributed.shutdown()


def launch(
    num_processes: int,
    devices_per_process: int,
    global_batch: int = 64,
    iterations: int = 10,
    ba_cams: int = 6,
    ba_pts: int = 60,
    ba_iters: int = 8,
    timeout: float = 600.0,
    out: Optional[str] = None,
) -> dict:
    """Spawn N local worker processes (CPU backend) and return process 0's
    timing report.  Raises on any nonzero worker exit."""
    port = free_port()
    coordinator = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = out or os.path.join("/tmp", f"lfr_mp_{port}.json")
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_process}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("LFR_PLATFORM", None)
        cmd = [
            sys.executable,
            "-m",
            "lfr_tpu.parallel.multiprocess",
            "--coordinator", coordinator,
            "--num_processes", str(num_processes),
            "--process_id", str(pid),
            "--global_batch", str(global_batch),
            "--iterations", str(iterations),
            "--ba_cams", str(ba_cams),
            "--ba_pts", str(ba_pts),
            "--ba_iters", str(ba_iters),
            "--out", out,
        ]
        procs.append(
            subprocess.Popen(
                cmd,
                cwd=repo_root,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    deadline = time.time() + timeout
    outputs = []
    for p in procs:
        remaining = max(1.0, deadline - time.time())
        try:
            stdout, _ = p.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multiprocess worker timed out")
        outputs.append(stdout)
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"worker rc={p.returncode}:\n{stdout[-2000:]}"
            )
    with open(out) as fh:
        return json.load(fh)


if __name__ == "__main__":
    worker_main()
