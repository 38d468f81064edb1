"""Descriptor matchers as jitted TPU matmul + top-k.

Semantics follow the reference matchers exactly — mutual nearest neighbour
with either a similarity threshold or a symmetric Lowe ratio test on
L2-normalized descriptors (reference: two-view-refinement/
feature_matchers.py:6-63, incl. the 1e-8 ratio epsilon) — but run as one
fused XLA program on the MXU over padded shapes, so consecutive pairs reuse
the compiled executable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Pad descriptor counts to multiples of this so jit recompiles rarely and
#: matmul shapes stay MXU-aligned.
BUCKET = 256

#: Sentinel similarity for padded rows/columns; real similarities of
#: L2-normalized descriptors lie in [-1, 1].
_PAD_SIM = -2.0


def _pad_descriptors(d: np.ndarray, dim_bucket: int = 8) -> Tuple[np.ndarray, int]:
    n, dim = d.shape
    n_pad = -(-max(n, 1) // BUCKET) * BUCKET
    dim_pad = -(-dim // dim_bucket) * dim_bucket
    out = np.zeros((n_pad, dim_pad), dtype=np.float32)
    out[:n, :dim] = d
    return out, n


@functools.partial(jax.jit, static_argnames=())
def _mnn_similarity_padded(d1, d2, n1, n2, threshold):
    sim = d1 @ d2.T
    valid1 = jnp.arange(sim.shape[0]) < n1
    valid2 = jnp.arange(sim.shape[1]) < n2
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, _PAD_SIM)

    nn12 = jnp.argmax(sim, axis=1)
    match_sim = jnp.max(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)

    ids1 = jnp.arange(sim.shape[0])
    mutual = ids1 == nn21[nn12]
    keep = mutual & (match_sim >= threshold) & valid1
    return nn12, match_sim, keep


def _top2(sim, axis):
    """(best, second-best, argbest) along ``axis`` as three masked max
    passes — measured faster than ``lax.top_k(sim, 2)`` on TPU (top_k
    lowers to a sort network, and the axis-0 form avoids materializing a
    transposed copy of the similarity matrix)."""
    a1 = jnp.argmax(sim, axis=axis)
    m1 = jnp.max(sim, axis=axis)
    pos = jnp.arange(sim.shape[axis])
    pos = pos[:, None] if axis == 0 else pos[None, :]
    hit = pos == jnp.expand_dims(a1, axis)
    m2 = jnp.max(jnp.where(hit, _PAD_SIM, sim), axis=axis)
    return m1, m2, a1


@functools.partial(jax.jit, static_argnames=())
def _mnn_ratio_padded(d1, d2, n1, n2, ratio):
    sim = d1 @ d2.T
    valid1 = jnp.arange(sim.shape[0]) < n1
    valid2 = jnp.arange(sim.shape[1]) < n2
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, _PAD_SIM)

    sim12_1, sim12_2, nn12 = _top2(sim, axis=1)
    dist12 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.stack([sim12_1, sim12_2], 1), 0.0))
    ratios12 = dist12[:, 0] / (dist12[:, 1] + 1e-8)
    match_sim = sim12_1

    sim21_1, sim21_2, nn21 = _top2(sim, axis=0)
    dist21 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.stack([sim21_1, sim21_2], 1), 0.0))
    ratios21 = dist21[:, 0] / (dist21[:, 1] + 1e-8)

    ids1 = jnp.arange(sim.shape[0])
    mutual = ids1 == nn21[nn12]
    keep = mutual & (ratios12 <= ratio) & (ratios21[nn12] <= ratio) & valid1
    return nn12, match_sim, keep


def _finalize(nn12, match_sim, keep, n1) -> Tuple[np.ndarray, np.ndarray]:
    nn12 = np.asarray(nn12)[:n1]
    match_sim = np.asarray(match_sim)[:n1]
    keep = np.asarray(keep)[:n1]
    ids1 = np.nonzero(keep)[0]
    matches = np.stack([ids1, nn12[ids1]], axis=-1).astype(np.int64)
    return matches, match_sim[ids1]


def mnn_similarity_matcher(
    descriptors1: np.ndarray, descriptors2: np.ndarray, threshold: float = 0.8
) -> Tuple[np.ndarray, np.ndarray]:
    """Mutual-NN + similarity threshold. Returns (matches (N,2), sims (N,))."""
    if descriptors1.shape[0] == 0 or descriptors2.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.int64), np.zeros(0, dtype=np.float32)
    d1, n1 = _pad_descriptors(np.asarray(descriptors1, dtype=np.float32))
    d2, n2 = _pad_descriptors(np.asarray(descriptors2, dtype=np.float32))
    nn12, match_sim, keep = _mnn_similarity_padded(
        d1, d2, jnp.int32(n1), jnp.int32(n2), jnp.float32(threshold)
    )
    return _finalize(nn12, match_sim, keep, n1)


def mnn_ratio_matcher(
    descriptors1: np.ndarray, descriptors2: np.ndarray, ratio: float = 0.8
) -> Tuple[np.ndarray, np.ndarray]:
    """Mutual-NN + symmetric Lowe ratio test. Returns (matches (N,2), sims (N,))."""
    if descriptors1.shape[0] == 0 or descriptors2.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.int64), np.zeros(0, dtype=np.float32)
    d1, n1 = _pad_descriptors(np.asarray(descriptors1, dtype=np.float32))
    d2, n2 = _pad_descriptors(np.asarray(descriptors2, dtype=np.float32))
    nn12, match_sim, keep = _mnn_ratio_padded(
        d1, d2, jnp.int32(n1), jnp.int32(n2), jnp.float32(ratio)
    )
    return _finalize(nn12, match_sim, keep, n1)


def match(
    descriptors1: np.ndarray,
    descriptors2: np.ndarray,
    matcher: str,
    threshold: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch by matcher kind (reference: compute_match_graph.py:134-147)."""
    if matcher == "similarity":
        return mnn_similarity_matcher(descriptors1, descriptors2, threshold)
    if matcher == "ratio":
        return mnn_ratio_matcher(descriptors1, descriptors2, threshold)
    raise NotImplementedError(f"unknown matcher {matcher!r}")
