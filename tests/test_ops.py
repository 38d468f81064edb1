"""Golden tests for device ops against torch / OpenCV / closed forms."""

import numpy as np
import jax.numpy as jnp
import pytest

from lfr_tpu.ops import image_ops, interpolate, matchers, patches


# ---------------------------------------------------------------------------
# Matchers: brute-force numpy oracle.
# ---------------------------------------------------------------------------


def _normalize(d):
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _oracle_similarity(d1, d2, threshold):
    sim = d1 @ d2.T
    nn12 = sim.argmax(1)
    nn21 = sim.argmax(0)
    out = []
    for i in range(d1.shape[0]):
        j = nn12[i]
        if nn21[j] == i and sim[i, j] >= threshold:
            out.append((i, j, sim[i, j]))
    return out


def _oracle_ratio(d1, d2, ratio):
    sim = d1 @ d2.T
    dist = np.sqrt(np.maximum(2 - 2 * sim, 0))

    def ratios(dm):
        part = np.sort(dm, axis=1)
        return part[:, 0] / (part[:, 1] + 1e-8)

    r12 = ratios(dist)
    r21 = ratios(dist.T)
    nn12 = sim.argmax(1)
    nn21 = sim.argmax(0)
    out = []
    for i in range(d1.shape[0]):
        j = nn12[i]
        if nn21[j] == i and r12[i] <= ratio and r21[j] <= ratio:
            out.append((i, j, sim[i, j]))
    return out


def test_similarity_matcher_matches_oracle():
    rng = np.random.default_rng(0)
    d1 = _normalize(rng.standard_normal((300, 128)).astype(np.float32))
    d2 = _normalize(rng.standard_normal((211, 128)).astype(np.float32))
    # Plant some strong correspondences.
    d2[:50] = _normalize(d1[:50] + 0.05 * rng.standard_normal((50, 128)).astype(np.float32))
    m, s = matchers.mnn_similarity_matcher(d1, d2, threshold=0.8)
    oracle = _oracle_similarity(d1, d2, 0.8)
    assert m.shape[0] == len(oracle) > 10
    for (i, j, sim), (mi, mj) in zip(oracle, m):
        assert (i, j) == (mi, mj)
    np.testing.assert_allclose(s, [o[2] for o in oracle], rtol=1e-5)


def test_ratio_matcher_matches_oracle():
    rng = np.random.default_rng(1)
    d1 = _normalize(rng.standard_normal((150, 64)).astype(np.float32))
    d2 = _normalize(rng.standard_normal((190, 64)).astype(np.float32))
    d2[:40] = _normalize(d1[:40] + 0.02 * rng.standard_normal((40, 64)).astype(np.float32))
    m, s = matchers.mnn_ratio_matcher(d1, d2, ratio=0.8)
    oracle = _oracle_ratio(d1, d2, 0.8)
    assert m.shape[0] == len(oracle) > 10
    for (i, j, sim), (mi, mj) in zip(oracle, m):
        assert (i, j) == (mi, mj)


def test_matchers_empty_inputs():
    d = _normalize(np.random.default_rng(2).standard_normal((5, 32)).astype(np.float32))
    for fn in (matchers.mnn_similarity_matcher, matchers.mnn_ratio_matcher):
        m, s = fn(np.zeros((0, 32), np.float32), d)
        assert m.shape == (0, 2) and s.shape == (0,)


# ---------------------------------------------------------------------------
# Patch sampling: golden against torch grid_sample (the reference's sampler).
# ---------------------------------------------------------------------------


def _torch_reference_patches(image, ij, ps=33):
    import torch
    import torch.nn.functional as F

    img = torch.tensor(image).float().permute(2, 0, 1)
    c, h, w = img.shape
    rows = torch.linspace(-1, 1, ps).view(ps, 1).repeat(1, ps) * ps / (h - 1)
    cols = torch.linspace(-1, 1, ps).view(1, ps).repeat(ps, 1) * ps / (w - 1)
    grid = torch.stack([rows, cols], dim=-1)
    nij = torch.tensor(ij).float()
    nij = nij / torch.tensor([h - 1, w - 1]).float() * 2 - 1
    full = nij.view(-1, 1, 1, 2) + grid
    out = F.grid_sample(
        img.unsqueeze(0),
        full[:, :, :, [1, 0]].reshape(1, -1, ps, 2),
        padding_mode="reflection",
        align_corners=True,
    ).squeeze(0)
    return out.view(c, -1, ps, ps).permute(1, 2, 3, 0).numpy()


def test_extract_patches_matches_torch_grid_sample():
    rng = np.random.default_rng(3)
    image = rng.random((48, 64, 3)).astype(np.float32) * 255
    # Interior, borderline, and far-outside centers (reflection stress).
    ij = np.array(
        [[20.0, 30.0], [0.5, 0.5], [47.0, 63.0], [-5.0, 70.0], [16.25, 40.75], [3.0, -8.0]]
    )
    ours = np.asarray(patches.extract_patches(jnp.asarray(image), jnp.asarray(ij)))
    theirs = _torch_reference_patches(image, ij)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-5)


def test_reflect_coord():
    x = jnp.array([-1.0, 0.0, 3.0, 9.0, 10.5, 17.0, -10.0])
    out = np.asarray(patches.reflect_coord(x, 10))  # span 9, period 18
    np.testing.assert_allclose(out, [1.0, 0.0, 3.0, 9.0, 7.5, 1.0, 8.0])


# ---------------------------------------------------------------------------
# Biquadratic interpolation: node reproduction, quadratic exactness, clamping.
# ---------------------------------------------------------------------------


def test_interpolator_reproduces_nodes():
    rng = np.random.default_rng(4)
    grid = rng.standard_normal((3, 3, 2)).astype(np.float32)
    for i, r in enumerate([-0.5, 0.0, 0.5]):
        for j, c in enumerate([-0.5, 0.0, 0.5]):
            val = interpolate.interpolate_flow(jnp.asarray(grid), jnp.float32(r), jnp.float32(c))
            np.testing.assert_allclose(np.asarray(val), grid[i, j], rtol=1e-5, atol=1e-6)


def test_interpolator_exact_for_quadratics():
    # f(r, c) = 1 + 2r + 3c + 4r^2 + 5rc + 6c^2 is reproduced exactly.
    def f(r, c):
        return 1 + 2 * r + 3 * c + 4 * r * r + 5 * r * c + 6 * c * c

    nodes = [-0.5, 0.0, 0.5]
    grid = np.array([[[f(r, c)] for c in nodes] for r in nodes], dtype=np.float64)
    for r, c in [(0.1, -0.3), (0.49, 0.49), (-0.25, 0.0)]:
        val = interpolate.interpolate_flow(jnp.asarray(grid), jnp.asarray(r), jnp.asarray(c))
        np.testing.assert_allclose(float(val[0]), f(r, c), rtol=1e-6)


def test_interpolator_clamps_with_zero_gradient():
    import jax

    rng = np.random.default_rng(5)
    grid = jnp.asarray(rng.standard_normal((3, 3, 2)).astype(np.float32))

    def f_r(r):
        return interpolate.interpolate_flow(grid, r, jnp.float32(0.2))[0]

    inside = interpolate.interpolate_flow(grid, jnp.float32(0.5), jnp.float32(0.2))
    outside = interpolate.interpolate_flow(grid, jnp.float32(3.0), jnp.float32(0.2))
    np.testing.assert_allclose(np.asarray(inside), np.asarray(outside), rtol=1e-6)
    g = jax.grad(f_r)(jnp.float32(2.0))
    assert float(g) == 0.0
    g_in = jax.grad(f_r)(jnp.float32(0.2))
    assert abs(float(g_in)) > 0.0


# ---------------------------------------------------------------------------
# Image ops: golden against OpenCV.
# ---------------------------------------------------------------------------


def test_area_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(6)
    image = (rng.random((97, 131, 3)) * 255).astype(np.uint8)
    fact = 1.7
    ref = cv2.resize(image, None, fx=1 / fact, fy=1 / fact, interpolation=cv2.INTER_AREA)
    ours = np.asarray(image_ops.area_resize_by_factor(jnp.asarray(image), fact))
    assert ours.shape == ref.shape
    # cv2 rounds to uint8; allow 1 LSB.
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_pyr_up_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    image = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    ref = cv2.pyrUp(image)
    ours = np.asarray(image_ops.pyr_up(jnp.asarray(image)))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_separable_patches_match_reference_sampler():
    rng = np.random.default_rng(8)
    image = rng.random((120, 160, 3)).astype(np.float32) * 255
    ij = np.array([[30.0, 40.0], [60.25, 80.75], [100.6, 120.1], [25.0, 130.9]])

    ref = np.asarray(patches.extract_patches(jnp.asarray(image), jnp.asarray(ij)))

    margin = patches.REFLECT_MARGIN
    padded = patches.reflect_pad_image(image)
    fast = np.asarray(
        patches.extract_patches_separable(jnp.asarray(padded), jnp.asarray(ij + margin))
    )
    np.testing.assert_allclose(fast, ref, atol=5e-3, rtol=1e-4)


def test_separable_patches_reflection_border():
    rng = np.random.default_rng(9)
    image = rng.random((96, 96, 3)).astype(np.float32)
    # Centers close to / beyond the border exercise the reflect margin.
    ij = np.array([[2.0, 3.0], [95.0, 1.0], [-6.0, 50.0], [50.0, 101.5]])
    ref = np.asarray(patches.extract_patches(jnp.asarray(image), jnp.asarray(ij)))
    margin = patches.effective_margin(image)
    padded = patches.reflect_pad_image(image)
    fast = np.asarray(
        patches.extract_patches_separable(jnp.asarray(padded), jnp.asarray(ij + margin))
    )
    np.testing.assert_allclose(fast, ref, atol=5e-3, rtol=1e-4)


def test_fused_correlation_pallas_interpret_matches_reference():
    import jax

    from lfr_tpu.ops import correlation

    rng = np.random.default_rng(10)
    f_ref = jnp.asarray(rng.standard_normal((2, 384, 128)).astype(np.float32))
    f_tgt = jnp.asarray(rng.standard_normal((2, 384, 128)).astype(np.float32))
    c12_ref, c21_ref = correlation.correlation_reference(f_ref, f_tgt)
    c12_p, c21_p = correlation.correlation_pallas(
        f_ref, f_tgt, interpret=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(c12_p), np.asarray(c12_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c21_p), np.asarray(c21_ref), atol=1e-5)
    # Production dtype (bf16) stays within quantization error.
    c12_b, c21_b = correlation.correlation_pallas(f_ref, f_tgt, interpret=True)
    np.testing.assert_allclose(
        np.asarray(c12_b, np.float32), np.asarray(c12_ref), atol=4e-3
    )
    # Asym variant returns only the 1->2 view.
    c12_a = correlation.correlation_pallas(
        f_ref, f_tgt, sym=False, interpret=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(c12_a), np.asarray(c12_ref), atol=1e-5)
    # Multi-pair program path (batch divisible by PAIRS_PER_PROGRAM).
    fr4 = jnp.concatenate([f_ref, f_ref], axis=0)
    ft4 = jnp.concatenate([f_tgt, f_tgt], axis=0)
    c12_4, _ = correlation.correlation_pallas(
        fr4, ft4, interpret=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(c12_4[:2]), np.asarray(c12_ref), atol=1e-5)
    # corr_views feeds the natural 289-position layout straight through
    # (Mosaic pads full-dim blocks internally); norms run over positions.
    c12_289 = correlation.correlation_reference(f_ref[:, :289], f_tgt[:, :289])[0]
    c12_v = correlation.corr_views(
        f_ref[:, :289], f_tgt[:, :289], sym=False, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(c12_v, np.float32), np.asarray(c12_289), atol=4e-3
    )


def test_extract_patch_grid_matches_nine_single_extractions():
    """The one-crop 3x3-grid extractor equals nine offset extractions."""
    import jax.numpy as jnp

    from lfr_tpu.ops.patches import (
        extract_patch_grid_separable,
        extract_patches_separable,
    )

    rng = np.random.default_rng(21)
    img = jnp.asarray(rng.random((200, 220, 3)), jnp.float32)
    centers = np.stack(
        [rng.uniform(60, 140, 7), rng.uniform(60, 160, 7)], axis=1
    ).astype(np.float32)
    g = 16
    grid = np.asarray(extract_patch_grid_separable(img, jnp.asarray(centers), g))
    assert grid.shape == (7, 9, 33, 33, 3)

    offs = np.stack(
        np.meshgrid([-g, 0, g], [-g, 0, g], indexing="ij"), axis=-1
    ).reshape(-1, 2)
    for k in range(9):
        single = np.asarray(
            extract_patches_separable(img, jnp.asarray(centers + offs[k]), 33)
        )
        np.testing.assert_allclose(grid[:, k], single, atol=1e-4, rtol=1e-5)
