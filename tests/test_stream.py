"""Cross-pair streaming refinement: equivalence with the per-pair path.

The streamed path (pipelines.stream.MatchRefineStream) must produce the
same matches and flow grids as the per-pair fused path
(TwoViewRefiner.process_pair/finalize_pair) — it only changes batching.
"""

import numpy as np
import pytest

from lfr_tpu.pipelines.refinement import TwoViewRefiner, prepare_image
from lfr_tpu.pipelines.stream import MatchRefineStream
from lfr_tpu.utils import synthetic


def _make_pairs(num_images=4, w=240, h=200, seed=5):
    rng = np.random.default_rng(seed)
    scene, imgs = synthetic.planar_scene(
        rng, num_points=120, num_cameras=num_images, width=w, height=h
    )
    from lfr_tpu.ops.sift import extract_sift

    feats = []
    for im in imgs:
        kp, sc, de = extract_sift(np.asarray(im), max_features=512)
        feats.append((kp[:, :2].astype(np.float32), de))
    preps = [prepare_image(np.asarray(im).astype(np.uint8)) for im in imgs]
    pair_ids = [(i, j) for i in range(num_images) for j in range(i + 1, num_images)]
    return preps, feats, pair_ids


@pytest.mark.parametrize("fine_mode", ["crop", "grid"])
def test_stream_matches_per_pair(fine_mode):
    preps, feats, pair_ids = _make_pairs()
    refiner = TwoViewRefiner(batch_size=512, fine_mode=fine_mode, rng_seed=0)

    # Per-pair fused path.
    per_pair = []
    for i, j in pair_ids:
        pending = refiner.process_pair(
            preps[i], feats[i][0], feats[i][1],
            preps[j], feats[j][0], feats[j][1],
            "ratio", 0.9,
        )
        per_pair.append(refiner.finalize_pair(pending))

    # Streamed path (small batch to force multi-batch splits).
    stream = MatchRefineStream(refiner, refine_batch=64)
    for idx, (i, j) in enumerate(pair_ids):
        stream.add_pair(
            idx,
            f"im{i}", preps[i], feats[i][0], feats[i][1],
            f"im{j}", preps[j], feats[j][0], feats[j][1],
            "ratio", 0.9,
        )
    streamed = {}
    for meta, payload in stream.flush():
        streamed[meta] = payload
    assert len(streamed) == len(pair_ids)

    total = 0
    for idx in range(len(pair_ids)):
        m_ref, s_ref, g12_ref, g21_ref = per_pair[idx]
        m_st, s_st, g12_st, g21_st = streamed[idx]
        assert np.array_equal(np.sort(m_ref[:, 0]), np.sort(m_st[:, 0]))
        # Align rows by idx1 (orders may differ).
        o_ref = np.argsort(m_ref[:, 0])
        o_st = np.argsort(m_st[:, 0])
        assert np.array_equal(m_ref[o_ref], m_st[o_st])
        np.testing.assert_allclose(s_ref[o_ref], s_st[o_st], atol=1e-5)
        np.testing.assert_allclose(g12_ref[o_ref], g12_st[o_st], atol=2e-3)
        np.testing.assert_allclose(g21_ref[o_ref], g21_st[o_st], atol=2e-3)
        total += m_ref.shape[0]
    assert total > 100


def test_stream_preserves_pair_order():
    preps, feats, pair_ids = _make_pairs(num_images=3)
    refiner = TwoViewRefiner(batch_size=256, fine_mode="crop", rng_seed=0)
    stream = MatchRefineStream(refiner, refine_batch=128)
    metas = []
    for idx, (i, j) in enumerate(pair_ids):
        if idx == 1:
            stream.add_empty_pair(("empty", idx))
            metas.append(("empty", idx))
        stream.add_pair(
            ("pair", idx),
            f"im{i}", preps[i], feats[i][0], feats[i][1],
            f"im{j}", preps[j], feats[j][0], feats[j][1],
            "ratio", 0.9,
        )
        metas.append(("pair", idx))
    out = [meta for meta, _ in stream.flush()]
    assert out == metas


def test_stacked_extractors_match_single():
    """img_idx mode of the patch extractors equals per-image extraction."""
    import jax.numpy as jnp

    from lfr_tpu.ops.patches import (
        extract_crops_unit,
        extract_patch_grid_separable,
        extract_patches_separable,
    )

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (3, 96, 112, 3)).astype(np.float32))
    ij = jnp.asarray(rng.uniform(40, 56, (10, 2)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 3, 10).astype(np.int32))

    for fn, kw in (
        (extract_patches_separable, {"patch_size": 33}),
        (lambda im, c, img_idx=None, **k: extract_patch_grid_separable(
            im, c, 8, 33, img_idx=img_idx), {}),
        (lambda im, c, img_idx=None, **k: extract_crops_unit(
            im, c, 49, img_idx=img_idx), {}),
    ):
        stacked = np.asarray(fn(imgs, ij, img_idx=idx, **kw))
        for n in range(10):
            single = np.asarray(fn(imgs[int(idx[n])], ij[n : n + 1], **kw))
            np.testing.assert_allclose(stacked[n], single[0], atol=1e-5)


def test_stream_eviction_and_growth_keep_results_correct(monkeypatch):
    """Slot eviction / stack growth mid-stream must not corrupt results.

    Regression: add_pair captured image/descriptor slot indices before
    ensuring the SECOND image of a pair; an LRU eviction or stack grow
    triggered by that second ensure invalidated the first index.
    Tiny budgets force evictions and reallocation on every few pairs.
    """
    from lfr_tpu.pipelines import stream as stream_mod

    preps, feats, pair_ids = _make_pairs(num_images=5)
    refiner = TwoViewRefiner(batch_size=512, fine_mode="crop", rng_seed=0)

    per_pair = []
    for i, j in pair_ids:
        pending = refiner.process_pair(
            preps[i], feats[i][0], feats[i][1],
            preps[j], feats[j][0], feats[j][1],
            "ratio", 0.9,
        )
        per_pair.append(refiner.finalize_pair(pending))

    # Budgets sized for ~4 image slots / 4 descriptor slots: every pair
    # of the 5-image exhaustive list evicts something.
    one_img = preps[0].base.array.nbytes + preps[0].up.array.nbytes
    monkeypatch.setattr(stream_mod, "DESC_BUDGET_BYTES", 4 * 512 * 136 * 4)
    stream = MatchRefineStream(
        refiner, refine_batch=64, stack_budget_bytes=4 * one_img
    )
    for idx, (i, j) in enumerate(pair_ids):
        stream.add_pair(
            idx,
            f"im{i}", preps[i], feats[i][0], feats[i][1],
            f"im{j}", preps[j], feats[j][0], feats[j][1],
            "ratio", 0.9,
        )
    streamed = {meta: payload for meta, payload in stream.flush()}
    assert len(streamed) == len(pair_ids)
    for idx in range(len(pair_ids)):
        m_ref, s_ref, g12_ref, g21_ref = per_pair[idx]
        m_st, s_st, g12_st, g21_st = streamed[idx]
        o_ref = np.argsort(m_ref[:, 0])
        o_st = np.argsort(m_st[:, 0])
        assert np.array_equal(m_ref[o_ref], m_st[o_st])
        np.testing.assert_allclose(g12_ref[o_ref], g12_st[o_st], atol=2e-3)
        np.testing.assert_allclose(g21_ref[o_ref], g21_st[o_st], atol=2e-3)
