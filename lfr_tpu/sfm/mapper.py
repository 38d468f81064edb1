"""Incremental structure-from-motion mapper.

In-framework replacement for ``colmap mapper``
(reference: reconstruction-scripts/colmap_utils.py:226-294): initialize
from the strongest verified pair, then alternate PnP registration,
batched triangulation, and Schur-complement bundle adjustment — with the
dense linear algebra on device and the irregular bookkeeping on host.

Scope notes vs COLMAP: intrinsics stay fixed at their priors (the
reference's triangulation benchmark also fixes them, colmap_utils.py:
302-311); a single camera model per image is assumed.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io import colmap_db as db_mod
from ..io import colmap_model as model_mod
from . import ba as ba_mod
from . import cameras as cam_mod
from . import geometry, pnp
from .triangulate import analyze_model

import jax.numpy as jnp


@dataclasses.dataclass
class MapperOptions:
    init_min_tri_angle_deg: float = 6.0
    init_min_num_inliers: int = 50
    abs_pose_min_num_inliers: int = 15
    max_reproj_error_px: float = 4.0
    min_tri_angle_deg: float = 1.5
    ba_global_every: int = 5
    ba_iterations: int = 25
    min_track_len: int = 2
    #: Refine per-view focal scales in BA (sensible when each image has its
    #: own camera, e.g. EXIF-bootstrapped databases).
    refine_focal: bool = False


class IncrementalMapper:
    def __init__(self, database: db_mod.ColmapDatabase, options: MapperOptions = None):
        self.opt = options or MapperOptions()
        self.db = database
        self.cameras = database.cameras()
        self.image_info = {}  # image_id -> (name, camera_id)
        for name, iid in database.image_ids().items():
            self.image_info[iid] = name
        self.image_cam = database.image_cameras()

        # Per-image data.
        self.kp: Dict[int, np.ndarray] = {}
        self.norm_uv: Dict[int, np.ndarray] = {}
        self.focal: Dict[int, float] = {}
        for iid in self.image_info:
            kp = database.keypoints(iid)
            self.kp[iid] = kp
            cam_row = self.cameras[self.image_cam[iid]]
            cam = model_mod.Camera(
                cam_row["camera_id"],
                db_mod.CAMERA_MODEL_NAMES[cam_row["model"]],
                cam_row["width"],
                cam_row["height"],
                cam_row["params"],
            )
            self._cam_obj = cam
            if kp.shape[0]:
                self.norm_uv[iid] = cam_mod.pixel_to_normalized(cam, kp[:, :2].astype(np.float64))
            else:
                self.norm_uv[iid] = np.zeros((0, 2))
            self.focal[iid] = float(cam_mod.calibration_matrix(cam)[0, 0])

        # Verified matches per pair + per-image correspondence index.
        self.pair_matches: Dict[Tuple[int, int], np.ndarray] = {}
        self.corr: Dict[int, Dict[int, List[Tuple[int, int]]]] = {
            iid: {} for iid in self.image_info
        }
        for id1, id2, m, _ in database.all_two_view_geometries():
            if m.shape[0] == 0:
                continue
            self.pair_matches[(id1, id2)] = m
            for f1, f2 in m:
                self.corr[id1].setdefault(int(f1), []).append((id2, int(f2)))
                self.corr[id2].setdefault(int(f2), []).append((id1, int(f1)))

        # Reconstruction state.
        self.registered: List[int] = []
        self.R: Dict[int, np.ndarray] = {}
        self.t: Dict[int, np.ndarray] = {}
        self.points: Dict[int, np.ndarray] = {}       # pid -> xyz
        self.track: Dict[int, List[Tuple[int, int]]] = {}  # pid -> [(iid, feat)]
        self.pid_of: Dict[int, Dict[int, int]] = {iid: {} for iid in self.image_info}
        self.next_pid = 1

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def _try_initialize(self, id1: int, id2: int) -> bool:
        m = self.pair_matches[(id1, id2)]
        if m.shape[0] < self.opt.init_min_num_inliers:
            return False
        x1 = self.norm_uv[id1][m[:, 0]]
        x2 = self.norm_uv[id2][m[:, 1]]
        # Essential from normalized coords: 8-point on normalized = E.
        E = geometry.fundamental_8point(jnp.asarray(x1), jnp.asarray(x2))
        E = np.asarray(
            geometry.essential_from_fundamental(E, jnp.eye(3), jnp.eye(3))
        )

        best = None
        for R, t in geometry.decompose_essential(jnp.asarray(E)):
            R = np.asarray(R)
            t = np.asarray(t)
            P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
            P2 = np.concatenate([R, t[:, None]], axis=1)
            T = m.shape[0]
            P = np.stack([np.tile(P1, (T, 1, 1)), np.tile(P2, (T, 1, 1))], axis=1)
            uv = np.stack([x1, x2], axis=1)
            X = np.asarray(
                geometry.triangulate_dlt_batch(
                    jnp.asarray(P), jnp.asarray(uv), jnp.ones((T, 2), bool)
                )
            )
            z1 = X[:, 2]
            z2 = (X @ R.T + t)[:, 2]
            good = (z1 > 0) & (z2 > 0)
            if best is None or good.sum() > best[3].sum():
                best = (R, t, X, good)
        R, t, X, good = best
        if good.sum() < self.opt.init_min_num_inliers:
            return False
        # Triangulation angle check.
        c2 = -R.T @ t
        ang = np.asarray(
            geometry.triangulation_angles(
                jnp.asarray(X[good]), jnp.zeros(3), jnp.asarray(c2)
            )
        )
        if np.median(ang) < np.deg2rad(self.opt.init_min_tri_angle_deg):
            return False

        self.R[id1] = np.eye(3)
        self.t[id1] = np.zeros(3)
        self.R[id2] = R
        self.t[id2] = t
        self.registered = [id1, id2]
        for k in np.nonzero(good)[0]:
            f1, f2 = int(m[k, 0]), int(m[k, 1])
            err1 = self._reproj_err(id1, X[k], f1)
            err2 = self._reproj_err(id2, X[k], f2)
            if max(err1, err2) > self.opt.max_reproj_error_px:
                continue
            pid = self.next_pid
            self.next_pid += 1
            self.points[pid] = X[k]
            self.track[pid] = [(id1, f1), (id2, f2)]
            self.pid_of[id1][f1] = pid
            self.pid_of[id2][f2] = pid
        return len(self.points) >= self.opt.init_min_num_inliers // 2

    def _reproj_err(self, iid: int, X: np.ndarray, feat: int) -> float:
        c = self.R[iid] @ X + self.t[iid]
        if c[2] <= 0:
            return np.inf
        proj = c[:2] / c[2]
        return float(np.linalg.norm(proj - self.norm_uv[iid][feat]) * self.focal[iid])

    # ------------------------------------------------------------------
    # Registration
    # ------------------------------------------------------------------

    def _visible_points(self, iid: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """2D-3D correspondences for an unregistered image."""
        feats, pids = [], []
        for feat, others in self.corr[iid].items():
            counts: Dict[int, int] = {}
            for oid, ofeat in others:
                pid = self.pid_of.get(oid, {}).get(ofeat)
                if pid is not None:
                    counts[pid] = counts.get(pid, 0) + 1
            if counts:
                pid = max(counts, key=counts.get)
                feats.append(feat)
                pids.append(pid)
        if not feats:
            return np.zeros((0, 3)), np.zeros((0, 2)), np.zeros(0, np.int64)
        X = np.stack([self.points[p] for p in pids])
        uv = self.norm_uv[iid][np.asarray(feats)]
        return X, uv, np.stack([np.asarray(feats), np.asarray(pids)], axis=1)

    def _register_next(self) -> Optional[int]:
        candidates = []
        for iid in self.image_info:
            if iid in self.R:
                continue
            X, uv, fp = self._visible_points(iid)
            if X.shape[0] >= self.opt.abs_pose_min_num_inliers:
                candidates.append((X.shape[0], iid, X, uv, fp))
        candidates.sort(key=lambda c: -c[0])
        for _, iid, X, uv, fp in candidates:
            result = pnp.estimate_pose(
                X, uv, self.focal[iid], min_inliers=self.opt.abs_pose_min_num_inliers
            )
            if result is None:
                continue
            R, t, inliers = result
            self.R[iid] = R
            self.t[iid] = t
            self.registered.append(iid)
            # Attach inlier observations to their tracks.
            for k in np.nonzero(inliers)[0]:
                feat, pid = int(fp[k, 0]), int(fp[k, 1])
                if feat in self.pid_of[iid] or pid not in self.points:
                    continue
                if self._reproj_err(iid, self.points[pid], feat) <= self.opt.max_reproj_error_px:
                    self.pid_of[iid][feat] = pid
                    self.track[pid].append((iid, feat))
            return iid
        return None

    # ------------------------------------------------------------------
    # Triangulation of new tracks
    # ------------------------------------------------------------------

    def _triangulate_new(self, iid: int) -> int:
        """Create points from matches between iid and registered images.

        All candidate pairs triangulate in ONE batched DLT call; gating
        (finiteness, reprojection, angle) is vectorized, and only the
        final feature-assignment conflict resolution is sequential.
        """
        cands: List[Tuple[int, int, int]] = []  # (feat, oid, ofeat)
        for feat, others in self.corr[iid].items():
            if feat in self.pid_of[iid]:
                continue
            for oid, ofeat in others:
                if oid in self.R and ofeat not in self.pid_of[oid]:
                    cands.append((feat, oid, ofeat))
        if not cands:
            return 0

        feats = np.array([c[0] for c in cands])
        oids = np.array([c[1] for c in cands])
        ofeats = np.array([c[2] for c in cands])
        n = len(cands)

        P1 = np.concatenate([self.R[iid], self.t[iid][:, None]], axis=1)
        P2 = np.stack(
            [np.concatenate([self.R[o], self.t[o][:, None]], axis=1) for o in oids]
        )
        P = np.stack([np.tile(P1, (n, 1, 1)), P2], axis=1)
        uv = np.stack(
            [
                self.norm_uv[iid][feats],
                np.stack([self.norm_uv[o][f] for o, f in zip(oids, ofeats)]),
            ],
            axis=1,
        )
        X = np.asarray(
            geometry.triangulate_dlt_batch(
                jnp.asarray(P), jnp.asarray(uv), jnp.ones((n, 2), bool)
            )
        )

        # Vectorized gating.
        ok = np.isfinite(X).all(axis=1)
        c1 = (X @ self.R[iid].T + self.t[iid])
        z1 = c1[:, 2]
        proj1 = c1[:, :2] / np.where(np.abs(z1[:, None]) < 1e-12, 1e-12, z1[:, None])
        e1 = np.linalg.norm(proj1 - self.norm_uv[iid][feats], axis=1) * self.focal[iid]
        Ro = np.stack([self.R[o] for o in oids])
        to = np.stack([self.t[o] for o in oids])
        c2 = np.einsum("nab,nb->na", Ro, X) + to
        z2 = c2[:, 2]
        proj2 = c2[:, :2] / np.where(np.abs(z2[:, None]) < 1e-12, 1e-12, z2[:, None])
        uv2 = np.stack([self.norm_uv[o][f] for o, f in zip(oids, ofeats)])
        f2 = np.array([self.focal[o] for o in oids])
        e2 = np.linalg.norm(proj2 - uv2, axis=1) * f2
        ok &= (z1 > 0) & (z2 > 0)
        ok &= np.maximum(e1, e2) <= self.opt.max_reproj_error_px

        center1 = -self.R[iid].T @ self.t[iid]
        centers2 = -np.einsum("nba,nb->na", Ro, to)
        d1 = X - center1
        d2 = X - centers2
        cosang = np.sum(d1 * d2, axis=1) / np.maximum(
            np.linalg.norm(d1, axis=1) * np.linalg.norm(d2, axis=1), 1e-12
        )
        ang = np.arccos(np.clip(cosang, -1, 1))
        ok &= ang >= np.deg2rad(self.opt.min_tri_angle_deg)

        # Sequential conflict resolution (one point per feature).
        new = 0
        for k in np.nonzero(ok)[0]:
            feat, oid, ofeat = int(feats[k]), int(oids[k]), int(ofeats[k])
            if feat in self.pid_of[iid] or ofeat in self.pid_of[oid]:
                continue
            pid = self.next_pid
            self.next_pid += 1
            self.points[pid] = X[k]
            self.track[pid] = [(iid, feat), (oid, ofeat)]
            self.pid_of[iid][feat] = pid
            self.pid_of[oid][ofeat] = pid
            new += 1
        return new

    # ------------------------------------------------------------------
    # Bundle adjustment + filtering
    # ------------------------------------------------------------------

    def _run_ba(self, fix_first_two: bool = True) -> None:
        if len(self.registered) < 2 or not self.points:
            return
        cam_index = {iid: k for k, iid in enumerate(self.registered)}
        pids = sorted(self.points)
        pt_index = {pid: k for k, pid in enumerate(pids)}

        obs_cam, obs_pt, obs_uv, obs_f = [], [], [], []
        for pid in pids:
            for iid, feat in self.track[pid]:
                if iid not in cam_index:
                    continue
                obs_cam.append(cam_index[iid])
                obs_pt.append(pt_index[pid])
                obs_uv.append(self.norm_uv[iid][feat])
                obs_f.append(self.focal[iid])
        obs_pt = np.asarray(obs_pt)
        order = np.argsort(obs_pt, kind="stable")

        # Gauge fixing: camera 0's full pose + one translation axis of
        # camera 1 (7 similarity dofs); everything else moves freely.
        fixed = np.zeros((len(self.registered), 6), bool)
        fixed[0, :] = True
        if len(self.registered) > 1:
            axis = int(np.argmax(np.abs(self.t[self.registered[1]])))
            fixed[1, 3 + axis] = True

        problem = ba_mod.BAProblem(
            np.stack([self.R[i] for i in self.registered]),
            np.stack([self.t[i] for i in self.registered]),
            np.stack([self.points[p] for p in pids]),
            np.asarray(obs_cam)[order],
            obs_pt[order],
            np.asarray(obs_uv)[order],
            np.asarray(obs_f)[order],
            fixed,
            refine_focal=self.opt.refine_focal,
        )
        R, t, fscale, X, _ = ba_mod.run_ba(problem, iterations=self.opt.ba_iterations)
        for iid, k in cam_index.items():
            self.R[iid] = R[k]
            self.t[iid] = t[k]
            if self.opt.refine_focal and fscale[k] != 0.0:
                # Fold the refined focal into this view's observations so
                # later rounds (and _reproj_err) stay consistent: with
                # f1 = f0*exp(s), norm_uv_new = norm_uv * f0/f1.
                ratio = float(np.exp(fscale[k]))
                self.focal[iid] *= ratio
                self.norm_uv[iid] = self.norm_uv[iid] / ratio
        for pid, k in pt_index.items():
            self.points[pid] = X[k]

    def _complete_tracks(self) -> int:
        """Attach unassigned features of registered images to existing
        points they match (COLMAP's track-completion role)."""
        added = 0
        for iid in self.registered:
            for feat, others in self.corr[iid].items():
                if feat in self.pid_of[iid]:
                    continue
                counts: Dict[int, int] = {}
                for oid, ofeat in others:
                    pid = self.pid_of.get(oid, {}).get(ofeat)
                    if pid is not None and pid in self.points:
                        counts[pid] = counts.get(pid, 0) + 1
                if not counts:
                    continue
                pid = max(counts, key=counts.get)
                if self._reproj_err(iid, self.points[pid], feat) <= self.opt.max_reproj_error_px:
                    self.pid_of[iid][feat] = pid
                    self.track[pid].append((iid, feat))
                    added += 1
        return added

    def _filter_points(self) -> int:
        removed = 0
        for pid in list(self.points):
            track = [
                (iid, f)
                for iid, f in self.track[pid]
                if iid in self.R
                and self._reproj_err(iid, self.points[pid], f) <= self.opt.max_reproj_error_px
            ]
            dropped = [obs for obs in self.track[pid] if obs not in track]
            for iid, f in dropped:
                self.pid_of[iid].pop(f, None)
            self.track[pid] = track
            if len(track) < self.opt.min_track_len:
                for iid, f in track:
                    self.pid_of[iid].pop(f, None)
                del self.points[pid]
                del self.track[pid]
                removed += 1
        return removed

    # ------------------------------------------------------------------

    def reconstruct(self, verbose: bool = True) -> Optional[model_mod.Model]:
        # Initialization: try pairs by decreasing inlier count.
        ranked = sorted(self.pair_matches.items(), key=lambda kv: -kv[1].shape[0])
        initialized = False
        for (id1, id2), _ in ranked[:20]:
            if self._try_initialize(id1, id2):
                initialized = True
                if verbose:
                    print(f"[mapper] initialized with ({self.image_info[id1]}, {self.image_info[id2]}), {len(self.points)} points")
                break
        if not initialized:
            return None

        self._run_ba(fix_first_two=True)
        self._filter_points()

        since_global = 0
        while True:
            iid = self._register_next()
            if iid is None:
                break
            n_new = self._triangulate_new(iid)
            since_global += 1
            if since_global >= self.opt.ba_global_every:
                self._run_ba(fix_first_two=True)
                self._filter_points()
                since_global = 0
            if verbose:
                print(
                    f"[mapper] registered {self.image_info[iid]} "
                    f"({len(self.registered)}/{len(self.image_info)}), +{n_new} points"
                )
        self._complete_tracks()
        self._run_ba(fix_first_two=True)
        self._filter_points()

        return self._to_model()

    def _to_model(self) -> model_mod.Model:
        model = model_mod.Model()
        for cid, cam in self.cameras.items():
            model.cameras[cid] = model_mod.Camera(
                cid,
                db_mod.CAMERA_MODEL_NAMES[cam["model"]],
                cam["width"],
                cam["height"],
                cam["params"],
            )
        for iid in self.registered:
            kp = self.kp[iid]
            xys = kp[:, :2].astype(np.float64) if kp.shape[0] else np.zeros((0, 2))
            pids = np.full(xys.shape[0], -1, np.int64)
            for feat, pid in self.pid_of[iid].items():
                if pid in self.points:
                    pids[feat] = pid
            model.images[iid] = model_mod.Image(
                iid,
                model_mod.rotmat_to_qvec(self.R[iid]),
                self.t[iid],
                self.image_cam[iid],
                self.image_info[iid],
                xys,
                pids,
            )
        for pid, X in self.points.items():
            track = self.track[pid]
            errs = [self._reproj_err(iid, X, f) for iid, f in track]
            model.points3D[pid] = model_mod.Point3D(
                pid,
                X,
                np.full(3, 128, np.uint8),
                float(np.mean(errs)) if errs else 0.0,
                np.asarray([iid for iid, _ in track]),
                np.asarray([f for _, f in track]),
            )
        return model


def reconstruct(
    database: db_mod.ColmapDatabase,
    options: MapperOptions = None,
    verbose: bool = True,
) -> Tuple[Optional[model_mod.Model], dict]:
    """Run incremental SfM; returns (model, analyzer stats)."""
    mapper = IncrementalMapper(database, options)
    model = mapper.reconstruct(verbose=verbose)
    if model is None:
        return None, {}
    return model, analyze_model(model)
