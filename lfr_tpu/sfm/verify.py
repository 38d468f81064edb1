"""Geometric verification: batched RANSAC on device.

Replaces the reference's ``colmap matches_importer`` round-trip
(reference: colmap_utils.py:196-201).  For each image pair, S fundamental
(or homography) hypotheses are estimated and scored *simultaneously* as one
vmapped program — hypothesis parallelism on the MXU instead of COLMAP's
sequential CPU RANSAC — followed by a weighted refit on the best inlier
set.  Pairs are padded to match-count buckets so consecutive pairs share
compiled programs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: COLMAP two-view-geometry configurations (public COLMAP convention).
CONFIG_DEGENERATE = 1
CONFIG_CALIBRATED = 2
CONFIG_UNCALIBRATED = 3
CONFIG_PLANAR_OR_PANORAMIC = 6

#: Defaults mirroring COLMAP's TwoViewGeometryOptions.
MAX_ERROR_PX = 4.0
MIN_NUM_INLIERS = 15
NUM_HYPOTHESES = 256
MATCH_BUCKET = 512

from . import geometry


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_fundamental(
    x1, x2, valid, key, num_hypotheses: int = NUM_HYPOTHESES, max_error=MAX_ERROR_PX
):
    """Batched-hypothesis RANSAC for F.

    x1, x2: (N, 2) padded correspondences; valid: (N,) mask.
    ``max_error``: Sampson threshold in the coordinate units of x1/x2
    (pixels by default; scale by 1/focal for normalized coordinates).
    Returns (F_best, inlier_mask, num_inliers).
    """
    n = x1.shape[0]
    n_valid = jnp.sum(valid)

    # Sample 8-point minimal sets from valid indices (with replacement across
    # hypotheses; within a hypothesis indices are distinct w.h.p.).
    probs = valid.astype(jnp.float32) / jnp.maximum(n_valid, 1)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 8), replace=True, p=probs)

    def one_hypothesis(sample_idx):
        # fast=True: inverse-power null vector, no rank-2 — the
        # hypothesis only selects an inlier set; the refits below
        # rebuild F exactly (13x cheaper per hypothesis on TPU,
        # scripts/bench_nullvec.py).
        F = geometry.fundamental_8point(x1[sample_idx], x2[sample_idx], fast=True)
        err = geometry.sampson_error(F, x1, x2)
        inl = (err <= max_error**2) & valid
        return F, jnp.sum(inl)

    Fs, scores = jax.vmap(one_hypothesis)(idx)
    best = jnp.argmax(scores)
    F = Fs[best]

    # Local optimization: weighted refits on the inlier set, GUARDED —
    # a refit is only accepted if it does not lose inliers.  The plain
    # L2 refit is fragile: a handful of gross outliers inside the
    # hypothesis's inlier set can collapse the fit to a degenerate
    # near-rank-1 F (measured: 100-clean+5-gross set refit to 9
    # inliers), and an unguarded refit chain then returns that
    # degenerate model (LO-RANSAC keeps the best-scoring model for the
    # same reason).
    def refit(state, _):
        F, n_best = state
        err = geometry.sampson_error(F, x1, x2)
        w = ((err <= max_error**2) & valid).astype(jnp.float32)
        F2 = geometry.fundamental_8point(x1, x2, w)
        err2 = geometry.sampson_error(F2, x1, x2)
        n2 = jnp.sum((err2 <= max_error**2) & valid)
        take = n2 >= n_best
        return (jnp.where(take, F2, F), jnp.maximum(n2, n_best)), None

    # 4 rounds: from a partially-contaminated hypothesis, guarded refits
    # GROW the inlier set monotonically (measured on a 30%-inlier-ratio
    # pair: recall 0.37 at 2 rounds -> 1.00 at 4, leak 0.023).
    (F, _), _ = jax.lax.scan(refit, (F, scores[best]), None, length=4)
    err = geometry.sampson_error(F, x1, x2)
    inliers = (err <= max_error**2) & valid
    return F, inliers, jnp.sum(inliers)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_homography(
    x1, x2, valid, key, num_hypotheses: int = NUM_HYPOTHESES, max_error=MAX_ERROR_PX
):
    n = x1.shape[0]
    n_valid = jnp.sum(valid)
    probs = valid.astype(jnp.float32) / jnp.maximum(n_valid, 1)
    idx = jax.random.choice(key, n, shape=(num_hypotheses, 4), replace=True, p=probs)

    def one_hypothesis(sample_idx):
        # fast=True: see _ransac_fundamental — the winning sample is
        # re-solved exactly below.
        H = geometry.homography_dlt(x1[sample_idx], x2[sample_idx], fast=True)
        err = geometry.homography_error(H, x1, x2)
        inl = (err <= max_error**2) & valid
        return H, jnp.sum(inl)

    Hs, scores = jax.vmap(one_hypothesis)(idx)
    best = jnp.argmax(scores)
    H = Hs[best]

    # Guarded weighted refits (see _ransac_fundamental): each round only
    # replaces H if the exact-path weighted DLT does not lose inliers.
    def refit(state, _):
        H, n_best = state
        err = geometry.homography_error(H, x1, x2)
        w = ((err <= max_error**2) & valid).astype(jnp.float32)
        H2 = geometry.homography_dlt(x1, x2, w=w)
        err2 = geometry.homography_error(H2, x1, x2)
        n2 = jnp.sum((err2 <= max_error**2) & valid)
        take = n2 >= n_best
        return (jnp.where(take, H2, H), jnp.maximum(n2, n_best)), None

    (H, _), _ = jax.lax.scan(refit, (H, scores[best]), None, length=4)
    err = geometry.homography_error(H, x1, x2)
    inliers = (err <= max_error**2) & valid
    return H, inliers, jnp.sum(inliers)


@dataclasses.dataclass
class TwoViewGeometry:
    inlier_matches: np.ndarray  # (K, 2) feature index pairs
    config: int
    F: np.ndarray
    H: Optional[np.ndarray] = None


def _pad_points(x: np.ndarray, bucket: int) -> Tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    target = max(bucket, -(-n // bucket) * bucket)
    out = np.zeros((target, 2), np.float32)
    out[:n] = x
    valid = np.zeros(target, bool)
    valid[:n] = True
    return out, valid


@jax.jit
def _verify_program(x1, x2, valid, key):
    """F-RANSAC + H-RANSAC for one pair as a single program, packed into
    one flat vector [n_F, n_H, F (9), H (9), inl_F (N), inl_H (N)] so the
    result costs one host transfer (~50 ms link latency per transfer)."""
    kF, kH = jax.random.split(key)
    F, inl_F, n_F = _ransac_fundamental(x1, x2, valid, kF)
    H, inl_H, n_H = _ransac_homography(x1, x2, valid, kH)
    return jnp.concatenate(
        [
            jnp.stack([n_F, n_H]).astype(jnp.float32),
            F.ravel().astype(jnp.float32),
            H.ravel().astype(jnp.float32),
            inl_F.astype(jnp.float32),
            inl_H.astype(jnp.float32),
        ]
    )


@jax.jit
def _verify_program_batch(x1, x2, valid, keys):
    """vmapped :func:`_verify_program` over a batch of pairs.

    x1, x2: (B, N, 2); valid: (B, N); keys: (B, 2) PRNG keys.
    Returns (B, 20 + 2N) packed rows — one host transfer serves the whole
    batch (the per-transfer link latency, ~50-90 ms here, made per-pair
    collection the dominant cost of DB import at 435 pairs/scene).
    """

    def one(x1i, x2i, vi, ki):
        kF, kH = jax.random.split(ki)
        F, inl_F, n_F = _ransac_fundamental(x1i, x2i, vi, kF)
        H, inl_H, n_H = _ransac_homography(x1i, x2i, vi, kH)
        return jnp.concatenate(
            [
                jnp.stack([n_F, n_H]).astype(jnp.float32),
                F.ravel().astype(jnp.float32),
                H.ravel().astype(jnp.float32),
                inl_F.astype(jnp.float32),
                inl_H.astype(jnp.float32),
            ]
        )

    return jax.vmap(one)(x1, x2, valid, keys)


def _batch_rows_for(n_padded: int) -> int:
    """Pairs per batched verify program: one fixed batch shape per match
    bucket keeps the program count identical to the per-pair path."""
    return max(8, 65536 // max(n_padded, 1))


class BatchedVerifier:
    """Accumulate pairs and verify them in bucket-grouped device batches.

    ``add()`` queues a pair (pairs with <8 matches resolve immediately as
    degenerate); results surface from ``ready()``/``flush()`` as
    (token, TwoViewGeometry), unordered across buckets.  At most one batch
    per bucket stays in flight so device RANSAC overlaps host DB writes.
    """

    def __init__(self, seed: int = 0, min_num_inliers: int = MIN_NUM_INLIERS):
        self._key = jax.random.PRNGKey(seed)
        self._n_added = 0
        self._min_inliers = min_num_inliers
        #: bucket n -> list of (token, matches, x1p, x2p, valid)
        self._acc = {}
        #: in-flight: list of (handle, [(token, matches), ...])
        self._inflight = []
        self._done = []

    def add(self, token, keypoints1, keypoints2, matches) -> None:
        i = self._n_added
        self._n_added += 1
        if matches.shape[0] < 8:
            self._done.append(
                (
                    token,
                    TwoViewGeometry(
                        np.zeros((0, 2), np.uint32), CONFIG_DEGENERATE, np.eye(3)
                    ),
                )
            )
            return
        x1 = keypoints1[matches[:, 0], :2].astype(np.float32)
        x2 = keypoints2[matches[:, 1], :2].astype(np.float32)
        x1p, valid = _pad_points(x1, MATCH_BUCKET)
        x2p, _ = _pad_points(x2, MATCH_BUCKET)
        n = x1p.shape[0]
        group = self._acc.setdefault(n, [])
        group.append((token, matches, x1p, x2p, valid, i))
        if len(group) >= _batch_rows_for(n):
            self._dispatch(n)

    def _dispatch(self, n: int) -> None:
        group = self._acc.pop(n, [])
        if not group:
            return
        rows = _batch_rows_for(n)
        pad = rows - len(group)
        x1 = np.stack([g[2] for g in group] + [np.zeros((n, 2), np.float32)] * pad)
        x2 = np.stack([g[3] for g in group] + [np.zeros((n, 2), np.float32)] * pad)
        valid = np.stack([g[4] for g in group] + [np.zeros(n, bool)] * pad)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            self._key,
            jnp.asarray([g[5] for g in group] + [0] * pad, jnp.uint32),
        )
        handle = _verify_program_batch(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid), keys
        )
        self._inflight.append((handle, [(g[0], g[1]) for g in group]))
        while len(self._inflight) > 1:
            self._collect_one()

    def _collect_one(self) -> None:
        handle, metas = self._inflight.pop(0)
        packed = np.asarray(handle)  # ONE transfer for the whole batch
        for row, (token, matches) in zip(packed, metas):
            self._done.append(
                (token, _classify_packed(row, matches, self._min_inliers))
            )

    def ready(self):
        out, self._done = self._done, []
        return out

    def flush(self):
        for n in list(self._acc):
            self._dispatch(n)
        while self._inflight:
            self._collect_one()
        return self.ready()


def _classify_packed(
    packed: np.ndarray, matches: np.ndarray, min_num_inliers: int
) -> TwoViewGeometry:
    """Classify one packed verify row (shared by the per-pair and batched
    paths; COLMAP-style planarity test)."""
    n_F = int(packed[0])
    n_H = int(packed[1])
    F = packed[2:11].reshape(3, 3).astype(np.float64)
    H = packed[11:20].reshape(3, 3).astype(np.float64)
    n = (packed.shape[0] - 20) // 2
    inl_F = packed[20 : 20 + n] > 0
    inl_H = packed[20 + n :] > 0

    if n_F < min_num_inliers:
        return TwoViewGeometry(np.zeros((0, 2), np.uint32), CONFIG_DEGENERATE, F)
    if n_H >= 0.8 * n_F:
        mask = inl_H[: matches.shape[0]]
        config = CONFIG_PLANAR_OR_PANORAMIC
    else:
        mask = inl_F[: matches.shape[0]]
        config = CONFIG_UNCALIBRATED
    return TwoViewGeometry(matches[mask].astype(np.uint32), config, F, H)


def dispatch_verify(
    keypoints1: np.ndarray,
    keypoints2: np.ndarray,
    matches: np.ndarray,
    seed: int = 0,
):
    """Asynchronously dispatch one pair's verification; pair with
    :func:`collect_verify`.  Callers can keep a few pairs in flight to
    overlap device RANSAC with host DB writes (see
    pipelines.import_features)."""
    if matches.shape[0] < 8:
        return None
    x1 = keypoints1[matches[:, 0], :2].astype(np.float32)
    x2 = keypoints2[matches[:, 1], :2].astype(np.float32)
    x1p, valid = _pad_points(x1, MATCH_BUCKET)
    x2p, _ = _pad_points(x2, MATCH_BUCKET)
    key = jax.random.PRNGKey(seed)
    return _verify_program(jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(valid), key)


def collect_verify(
    handle,
    matches: np.ndarray,
    min_num_inliers: int = MIN_NUM_INLIERS,
) -> TwoViewGeometry:
    """Block on a :func:`dispatch_verify` handle and classify the pair.

    Emulates COLMAP's classification: estimate F and H; report degenerate /
    planar when H explains (almost) as many inliers as F.
    """
    if handle is None:
        return TwoViewGeometry(np.zeros((0, 2), np.uint32), CONFIG_DEGENERATE, np.eye(3))
    packed = np.asarray(handle)  # one transfer per pair
    return _classify_packed(packed, matches, min_num_inliers)


def verify_pair(
    keypoints1: np.ndarray,
    keypoints2: np.ndarray,
    matches: np.ndarray,
    seed: int = 0,
    min_num_inliers: int = MIN_NUM_INLIERS,
) -> TwoViewGeometry:
    """Epipolar verification of one pair's putative matches (synchronous
    form of dispatch_verify + collect_verify)."""
    return collect_verify(
        dispatch_verify(keypoints1, keypoints2, matches, seed=seed),
        matches,
        min_num_inliers=min_num_inliers,
    )
