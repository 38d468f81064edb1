"""Bundle adjustment: batched Schur-complement LM on device.

Replaces the BA that the reference gets implicitly from ``colmap mapper`` /
``point_triangulator`` (reference: colmap_utils.py:226-319).  Design:

  * observations are flat arrays (cam_idx, pt_idx, uv) — residuals and
    Jacobians evaluate as one vmapped program;
  * the point block C of the normal equations is block-diagonal 3x3 and
    inverts in closed form, batched;
  * the reduced camera system S = B - E C^-1 E^T assembles from per-point
    padded observation groups (pairs of cameras observing the same point)
    with scatter-adds, then solves by dense Cholesky;
  * points back-substitute in parallel.

Camera parameters per view: SO(3) increment (exp retraction), translation,
and a log-focal scale (frozen unless ``refine_focal`` — the COLMAP-mapper
behavior of refining intrinsics).  Gauge freedom is handled by per-parameter
freezing + LM damping.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HUBER_DELTA_PX = 4.0

#: Camera parameters per view: rotation (3) + translation (3) + log-focal (1).
CAM_DOF = 7


@dataclasses.dataclass
class BAProblem:
    """Flat bundle-adjustment problem in *normalized* camera coordinates.

    Observations must be grouped by point (``obs_pt`` non-decreasing).
    uv are undistorted normalized coords; residual scaling to pixels happens
    via ``focal`` per observation.
    """

    R: np.ndarray            # (C, 3, 3) world->cam
    t: np.ndarray            # (C, 3)
    points: np.ndarray       # (P, 3)
    obs_cam: np.ndarray      # (O,)
    obs_pt: np.ndarray       # (O,)
    obs_uv: np.ndarray       # (O, 2) normalized
    obs_focal: np.ndarray    # (O,) pixels-per-normalized-unit (for weighting)
    #: (C,) bool (fix whole pose) or (C, 6) bool per-parameter [w, dt] mask
    #: (per-parameter masks implement gauge fixing: freeze camera 0 fully
    #: plus one translation axis of camera 1, COLMAP-style).
    fixed_cameras: np.ndarray
    #: Refine per-view log-focal scales (COLMAP mapper's intrinsics
    #: refinement; keep False for fixed-intrinsics triangulation parity).
    refine_focal: bool = False
    #: (C,) initial log-focal scales (default zeros).
    fscale: Optional[np.ndarray] = None
    #: Optional (C,) int group ids: views in the same group SHARE one
    #: focal-scale parameter (views of the same physical camera — the
    #: shared-intrinsics coupling colmap applies).  None = per-view.
    focal_group: Optional[np.ndarray] = None


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3).

    Differentiable at w = 0: uses unnormalized skew(w) with
    sin(t)/t and (1-cos t)/t^2 coefficients, Taylor-switched via the
    double-where trick so autodiff sees no 0/0 (BA linearizes exactly at
    w = 0 every iteration).
    """
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, t2)
    safe_t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def _residual_one(w, dt, ds, dX, R0, t0, fs0, X0, uv, focal):
    """Reprojection residual (px) for one observation as a function of the
    camera increment (w, dt, ds = log-focal) and point increment dX."""
    R = so3_exp(w) @ R0
    t = t0 + dt
    X = X0 + dX
    c = R @ X + t
    z = jnp.where(jnp.abs(c[2]) < 1e-9, 1e-9, c[2])
    proj = c[:2] / z * jnp.exp(fs0 + ds)
    return (proj - uv) * focal


def _obs_jacobians(R, t, fscale, points, obs_cam, obs_pt, obs_uv, obs_focal):
    """Residuals + Jacobians for all observations.

    Returns r (O, 2), Jc (O, 2, CAM_DOF), Jp (O, 2, 3), robust weights.
    """

    def per_obs(ci, pi, uv, f):
        def res_params(params):
            w, dt, ds, dX = params[:3], params[3:6], params[6], params[7:10]
            return _residual_one(
                w, dt, ds, dX, R[ci], t[ci], fscale[ci], points[pi], uv, f
            )

        params0 = jnp.zeros(10)
        r = res_params(params0)
        J = jax.jacfwd(res_params)(params0)  # (2, 10)
        return r, J[:, :CAM_DOF], J[:, CAM_DOF:]

    r, Jc, Jp = jax.vmap(per_obs)(obs_cam, obs_pt, obs_uv, obs_focal)
    # Huber weights on the residual norm (px).
    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= HUBER_DELTA_PX, 1.0, HUBER_DELTA_PX / jnp.maximum(norm, 1e-12))
    return r, Jc, Jp, w


def _cost(R, t, fscale, points, obs_cam, obs_pt, obs_uv, obs_focal):
    def per_obs(ci, pi, uv, f):
        return _residual_one(
            jnp.zeros(3), jnp.zeros(3), 0.0, jnp.zeros(3),
            R[ci], t[ci], fscale[ci], points[pi], uv, f,
        )

    r = jax.vmap(per_obs)(obs_cam, obs_pt, obs_uv, obs_focal)
    s = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(s, 1e-20))
    huber = jnp.where(
        n <= HUBER_DELTA_PX, 0.5 * s, HUBER_DELTA_PX * (n - 0.5 * HUBER_DELTA_PX)
    )
    return jnp.sum(huber)


#: Point-axis chunk for the Schur aggregation scan (see ``schur_step``).
POINT_CHUNK = 2048


def schur_step(
    Rc,
    tc,
    fsc,
    Xc,
    lam,
    obs_cam,
    obs_pt,
    obs_uv,
    obs_focal,
    free,
    pt_obs_idx,
    pt_obs_valid,
    n_cameras: int,
    tie=None,
):
    """One damped Gauss-Newton step via the Schur-reduced camera system.

    Returns (dc (C, CAM_DOF), dX (P, 3)).  With ``lam = 0`` this is an
    undamped GN step — exposed at module level so tests can validate the
    grouped Schur assembly against a dense reference solve.

    ``tie``: optional (CAM_DOF*C, P) parameter-tying matrix: the solve
    runs in the reduced space z with dc = tie @ z (normal equations
    tie^T H tie z = -tie^T g) — used to SHARE focal scales across views
    of the same physical camera (COLMAP's shared-intrinsics behavior).

    Memory: the point axis streams through a ``lax.scan`` in chunks of
    ``POINT_CHUNK``, so the per-camera aggregation blocks G/H occupy
    (chunk, C, d, 3) instead of (P, C, d, 3) — the full buffers reach
    tens of GB at 1,000 cameras x 100k points — and the per-point group
    gathers (chunk, V, ...) never materialize for all P at once.  Only
    the accumulated S (C, C, d, d), the per-point 3x3 inverses, and the
    O-sized Jacobians persist.
    """
    d = CAM_DOF
    r, Jc, Jp, w = _obs_jacobians(
        Rc, tc, fsc, Xc, obs_cam, obs_pt, obs_uv, obs_focal
    )
    # Mask Jacobians of frozen parameters.
    Jc = Jc * free[obs_cam][:, None, :]
    sw = jnp.sqrt(w)[:, None, None]
    Jc = Jc * sw
    Jp = Jp * sw
    rw = r * jnp.sqrt(w)[:, None]

    # Camera block B (block-diagonal d x d per camera) and gradient.
    JcT_Jc = jnp.einsum("oia,oib->oab", Jc, Jc)
    JcT_r = jnp.einsum("oia,oi->oa", Jc, rw)
    B = jax.ops.segment_sum(JcT_Jc, obs_cam, n_cameras)
    g_c = jax.ops.segment_sum(JcT_r, obs_cam, n_cameras)
    B = B + lam * jnp.eye(d)[None] * jnp.maximum(
        jnp.diagonal(B, axis1=1, axis2=2), 1e-6
    )[:, :, None]

    n_p, v = pt_obs_idx.shape
    pc = min(POINT_CHUNK, n_p)
    if n_p % pc:
        pc = n_p  # callers that skip run_ba's pow2 padding get one chunk
    n_chunks = n_p // pc
    idx_chunks = pt_obs_idx.reshape(n_chunks, pc, v)
    val_chunks = pt_obs_valid.reshape(n_chunks, pc, v)

    def _chunk_E(idxc, validc):
        """Per-chunk group gathers + E blocks (shared by both scans)."""
        o_idx = jnp.maximum(idxc, 0)
        Jp_g = Jp[o_idx] * validc[..., None, None]    # (pc, V, 2, 3)
        Jc_g = Jc[o_idx] * validc[..., None, None]    # (pc, V, 2, d)
        cam_g = obs_cam[o_idx]                        # (pc, V)
        E = jnp.einsum("pvia,pvib->pvab", Jc_g, Jp_g)
        return Jp_g, cam_g, E

    def fwd(carry, inp):
        S_acc, rhs_acc = carry
        idxc, validc = inp
        Jp_g, cam_g, E = _chunk_E(idxc, validc)
        r_g = rw[jnp.maximum(idxc, 0)] * validc[..., None]
        Cp = jnp.einsum("pvia,pvib->pab", Jp_g, Jp_g)   # (pc, 3, 3)
        g_p = jnp.einsum("pvia,pvi->pa", Jp_g, r_g)     # (pc, 3)
        # Damp the point blocks (Marquardt scaling).
        Cp = Cp + lam * jnp.eye(3)[None] * jnp.maximum(
            jnp.diagonal(Cp, axis1=1, axis2=2), 1e-6
        )[:, :, None]
        Cp_inv = jnp.linalg.inv(Cp + 1e-9 * jnp.eye(3)[None])
        ECi = jnp.einsum("pvab,pbc->pvac", E, Cp_inv)
        rhs_contrib = jnp.einsum("pvac,pc->pva", ECi, g_p)  # (pc, V, d)

        # Schur pairing E C^-1 E^T over all (v, w) observation pairs of
        # each point: aggregate each point's blocks PER CAMERA (G = sum_v
        # ECi, H = sum_w E grouped by observing camera) and contract once
        # — exact for arbitrary track lengths (every (v, w) pair lands in
        # exactly one (ca, cb) cell).
        vmask = validc[..., None, None]
        flat_ids = (
            jnp.arange(pc, dtype=jnp.int32)[:, None] * n_cameras
            + jnp.where(validc, cam_g, 0).astype(jnp.int32)
        ).reshape(-1)
        G = jax.ops.segment_sum(
            (ECi * vmask).reshape(-1, d, 3), flat_ids, pc * n_cameras
        ).reshape(pc, n_cameras, d, 3)
        H = jax.ops.segment_sum(
            (E * vmask).reshape(-1, d, 3), flat_ids, pc * n_cameras
        ).reshape(pc, n_cameras, d, 3)
        S_acc = S_acc - jnp.einsum("pxac,pybc->xyab", G, H)
        rhs_acc = rhs_acc + jax.ops.segment_sum(
            (rhs_contrib * validc[..., None]).reshape(-1, d),
            cam_g.reshape(-1),
            n_cameras,
        )
        return (S_acc, rhs_acc), (Cp_inv, g_p)

    S0 = jnp.zeros((n_cameras, n_cameras, d, d))
    rhs0 = jnp.zeros((n_cameras, d))
    (S, rhs_pt), (Cp_inv_all, g_p_all) = jax.lax.scan(
        fwd, (S0, rhs0), (idx_chunks, val_chunks)
    )
    S = S.at[jnp.arange(n_cameras), jnp.arange(n_cameras)].add(B)
    rhs = g_c - rhs_pt

    # Dense solve of the reduced camera system.
    Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape(d * n_cameras, d * n_cameras)
    fmask = free.reshape(-1)
    Sd = Sd * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
    rhs_flat = (-rhs.reshape(-1)) * fmask
    if tie is None:
        L, low = jax.scipy.linalg.cho_factor(Sd, lower=True)
        dc = jax.scipy.linalg.cho_solve((L, low), rhs_flat).reshape(n_cameras, d)
    else:
        A = tie.T @ Sd @ tie
        A = A + 1e-12 * jnp.eye(A.shape[0])
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        z = jax.scipy.linalg.cho_solve((L, low), tie.T @ rhs_flat)
        dc = (tie @ z).reshape(n_cameras, d)

    # Back-substitute points: dX = C^-1 (-g_p - E^T dc), re-streaming the
    # chunks (E is recomputed rather than stored — storing it would
    # resurrect the (P, V, d, 3) buffer the scan exists to avoid).
    def back(_, inp):
        idxc, validc, Cp_inv, g_p = inp
        _, cam_g, E = _chunk_E(idxc, validc)
        ET_dc = jnp.einsum(
            "pvab,pva->pb", E, dc[cam_g] * validc[..., None]
        )
        dX = jnp.einsum("pab,pb->pa", Cp_inv, -g_p - ET_dc)
        return None, dX

    _, dX_chunks = jax.lax.scan(
        back, None, (idx_chunks, val_chunks, Cp_inv_all, g_p_all)
    )
    return dc, dX_chunks.reshape(n_p, 3)


@functools.partial(jax.jit, static_argnames=("n_cameras", "iterations"))
def ba_iterate(
    R,
    t,
    fscale,
    points,
    obs_cam,
    obs_pt,
    obs_uv,
    obs_focal,
    free,            # (C, CAM_DOF) float mask
    pt_obs_idx,      # (P, V) indices into obs arrays, padded with -1
    pt_obs_valid,    # (P, V)
    n_cameras: int,
    iterations: int = 20,
    tie=None,
    tol=1e-6,
):
    """LM loop.  Returns (R, t, fscale, points, final_cost).

    ``tol``: relative cost-decrease stop (traced, so intermediate mapper
    rounds can run loose (1e-4) and the final polish tight (1e-6)
    without extra compiled programs)."""

    def body(state):
        Rc, tc, fsc, Xc, lam, cost, done, it = state
        dc, dX = schur_step(
            Rc, tc, fsc, Xc, lam,
            obs_cam, obs_pt, obs_uv, obs_focal,
            free, pt_obs_idx, pt_obs_valid, n_cameras,
            tie=tie,
        )
        dc = dc * free
        R_new = so3_exp(dc[:, :3]) @ Rc
        t_new = tc + dc[:, 3:6]
        fs_new = fsc + dc[:, 6]
        X_new = Xc + dX
        new_cost = _cost(R_new, t_new, fs_new, X_new, obs_cam, obs_pt, obs_uv, obs_focal)
        finite = jnp.isfinite(new_cost)
        accept = finite & (new_cost < cost)
        Rc = jnp.where(accept, R_new, Rc)
        tc = jnp.where(accept, t_new, tc)
        fsc = jnp.where(accept, fs_new, fsc)
        Xc = jnp.where(accept, X_new, Xc)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10), jnp.minimum(lam * 5.0, 1e8))
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = done | (accept & (rel < tol)) | (~finite & (lam >= 1e8))
        cost = jnp.where(accept, new_cost, cost)
        return Rc, tc, fsc, Xc, lam, cost, done, it + 1

    def cond(state):
        return (~state[6]) & (state[7] < iterations)

    cost0 = _cost(R, t, fscale, points, obs_cam, obs_pt, obs_uv, obs_focal)
    init = (
        R, t, fscale, points, jnp.asarray(1e-3), cost0, jnp.asarray(False), jnp.asarray(0),
    )
    R, t, fscale, points, _, cost, _, _ = jax.lax.while_loop(cond, body, init)
    return R, t, fscale, points, cost


def _group_by_point(obs_pt: np.ndarray, n_points: int):
    """(P, V) padded observation-index groups per point.

    V is the TRUE maximum track length — every observation appears in
    exactly one group row, so the Schur-reduced system is consistent with
    the camera block for arbitrarily long tracks (a former 32-observation
    cap silently dropped the tail from the point blocks while the camera
    block kept it, producing an inconsistent normal-equation system).
    """
    n_obs = obs_pt.shape[0]
    order = np.argsort(obs_pt, kind="stable")
    counts = np.bincount(obs_pt, minlength=n_points)
    v = int(max(counts.max() if n_obs else 0, 2))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(n_obs) - starts[obs_pt[order]]
    idx = np.full((n_points, v), -1, np.int64)
    idx[obs_pt[order], rank] = order
    valid = idx >= 0
    return idx, valid


def _free_mask(problem: BAProblem) -> np.ndarray:
    fixed = problem.fixed_cameras
    c = problem.R.shape[0]
    if fixed.ndim == 1:
        pose_free = np.repeat((~fixed)[:, None], 6, axis=1)
    else:
        pose_free = ~fixed[:, :6]
    focal_free = np.full(
        (c, 1), problem.refine_focal, bool
    ) & pose_free.any(axis=1, keepdims=True)
    return np.concatenate([pose_free, focal_free], axis=1).astype(np.float32)


def _tie_matrix(focal_group: np.ndarray, free: np.ndarray) -> np.ndarray:
    """(CAM_DOF*C, 6C + G) map from (per-view poses, per-GROUP focals) to
    the flat per-view parameter vector."""
    c = focal_group.shape[0]
    d = CAM_DOF
    groups = np.unique(focal_group)
    n_red = 6 * c + groups.shape[0]
    T = np.zeros((d * c, n_red), np.float32)
    for v in range(c):
        T[d * v : d * v + 6, 6 * v : 6 * v + 6] = np.eye(6)
        gi = int(np.searchsorted(groups, focal_group[v]))
        # Frozen focals stay out of the shared parameter (their row of the
        # masked system is identity anyway).
        if free[v, 6] > 0:
            T[d * v + 6, 6 * c + gi] = 1.0
    return T


def _pow2(n: int, lo: int = 2) -> int:
    return max(lo, 1 << max(0, int(n - 1).bit_length()))


def run_ba(
    problem: BAProblem, iterations: int = 30, tol: float = 1e-6
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]:
    """Solve; returns (R, t, log_focal_scales, points, final_cost).

    Every shape (cameras, points, observations, max track length) pads to
    a power of two so the incremental mapper's many BA calls — whose raw
    shapes are all distinct — reuse a handful of compiled programs
    instead of recompiling per registration (each compile costs seconds
    through the remote TPU compiler).  Padded cameras are frozen
    identity poses, padded points never appear in observation groups,
    and padded observations carry zero focal, which nullifies their
    residuals and Jacobians exactly.  (With ``refine_focal`` +
    ``focal_group`` the tie matrix's group count still varies — that
    path may recompile per distinct group count.)
    """
    n_c = problem.R.shape[0]
    n_p = problem.points.shape[0]
    n_o = problem.obs_cam.shape[0]
    cp, pp, op = _pow2(n_c), _pow2(n_p), _pow2(n_o)

    free = _free_mask(problem)
    fscale0 = np.asarray(
        problem.fscale if problem.fscale is not None else np.zeros(n_c),
        np.float32,
    )
    R, t, points = problem.R, problem.t, problem.points
    focal_group = problem.focal_group
    if cp > n_c:
        R = np.concatenate([R, np.tile(np.eye(3), (cp - n_c, 1, 1))])
        t = np.concatenate([t, np.zeros((cp - n_c, 3))])
        fscale0 = np.concatenate([fscale0, np.zeros(cp - n_c, np.float32)])
        free = np.concatenate([free, np.zeros((cp - n_c, CAM_DOF), np.float32)])
        if focal_group is not None:
            pad_ids = int(np.max(focal_group)) + 1 + np.arange(cp - n_c)
            focal_group = np.concatenate([np.asarray(focal_group), pad_ids])
    if pp > n_p:
        points = np.concatenate([points, np.zeros((pp - n_p, 3))])

    # Groups over REAL observations only (padded observations contribute
    # zero to the camera block and are absent from the point blocks).
    pt_idx, pt_valid = _group_by_point(problem.obs_pt, pp)
    vp = _pow2(pt_idx.shape[1])
    if vp > pt_idx.shape[1]:
        pad = np.full((pp, vp - pt_idx.shape[1]), -1, np.int64)
        pt_idx = np.concatenate([pt_idx, pad], axis=1)
        pt_valid = np.concatenate([pt_valid, pad >= 0], axis=1)

    obs_cam, obs_pt = problem.obs_cam, problem.obs_pt
    obs_uv, obs_focal = problem.obs_uv, problem.obs_focal
    if op > n_o:
        k = op - n_o
        obs_cam = np.concatenate([obs_cam, np.full(k, cp - 1, obs_cam.dtype)])
        obs_pt = np.concatenate([obs_pt, np.full(k, pp - 1, obs_pt.dtype)])
        obs_uv = np.concatenate([obs_uv, np.zeros((k, 2))])
        obs_focal = np.concatenate([obs_focal, np.zeros(k)])

    R, t, fscale, X, cost = ba_iterate(
        jnp.asarray(R),
        jnp.asarray(t),
        jnp.asarray(fscale0, dtype=jnp.float32),
        jnp.asarray(points),
        jnp.asarray(obs_cam),
        jnp.asarray(obs_pt),
        jnp.asarray(obs_uv),
        jnp.asarray(obs_focal),
        jnp.asarray(free),
        jnp.asarray(pt_idx),
        jnp.asarray(pt_valid),
        n_cameras=cp,
        iterations=iterations,
        tol=tol,
        tie=(
            jnp.asarray(_tie_matrix(focal_group, free))
            if focal_group is not None and problem.refine_focal
            else None
        ),
    )
    return (
        np.asarray(R)[:n_c],
        np.asarray(t)[:n_c],
        np.asarray(fscale)[:n_c],
        np.asarray(X)[:n_p],
        float(cost),
    )
