"""Two-view refinement driver tests: unit conventions + pipeline mechanics."""

import numpy as np
import jax.numpy as jnp
import pytest

from lfr_tpu.config import DISPLACEMENT_UNIT_PX
from lfr_tpu.pipelines import refinement
from lfr_tpu.utils import synthetic


class _ConstantCNN:
    """Stands in for the jitted patch CNN: returns a constant displacement."""

    def __init__(self, value12, value21):
        self.v12 = np.asarray(value12, dtype=np.float32)
        self.v21 = np.asarray(value21, dtype=np.float32)

    def __call__(self, variables, img1, img2, ij1, ij2, sym):
        n = ij1.shape[0]
        if sym:
            return (
                jnp.tile(jnp.asarray(self.v12), (n, 1)),
                jnp.tile(jnp.asarray(self.v21), (n, 1)),
            )
        return jnp.tile(jnp.asarray(self.v12), (n, 1))


def _make_refiner(batch_size=64):
    # Construction compiles nothing; variables stay tiny.
    return refinement.TwoViewRefiner(batch_size=batch_size, rng_seed=0)


def test_constant_model_coarse_plus_half_fine():
    """grid = coarse + 0.5 * fine (reference: refinement.py:145-161)."""
    rng = np.random.default_rng(0)
    img1, img2 = synthetic.shifted_pair(rng, 96, 128, (0, 0))
    ref = _make_refiner()
    ref._patch_cnn = _ConstantCNN([0.25, -0.125], [0.0625, 0.5])

    kps = np.array([[40.0, 30.0], [70.0, 50.0]])
    matches = np.array([[0, 0], [1, 1]])
    g12, g21 = ref.refine_matches(img1, kps, img2, kps, matches)
    assert g12.shape == (2, 3, 3, 2)
    # coarse12 = (.25, -.125); fine (asym) returns v12 constant too.
    np.testing.assert_allclose(g12[..., 0], 0.25 + 0.5 * 0.25, rtol=1e-6)
    np.testing.assert_allclose(g12[..., 1], -0.125 + 0.5 * -0.125, rtol=1e-6)
    # Direction 2->1: coarse21 = (.0625, .5), fine pass reuses v12 constant.
    np.testing.assert_allclose(g21[..., 0], 0.0625 + 0.5 * 0.25, rtol=1e-6)
    np.testing.assert_allclose(g21[..., 1], 0.5 + 0.5 * -0.125, rtol=1e-6)


def test_fine_recentering_math():
    """The fine pass must sample targets at 2*(ij2 + coarse12*16)."""
    rng = np.random.default_rng(1)
    img1, img2 = synthetic.shifted_pair(rng, 96, 128, (0, 0))
    ref = _make_refiner()

    captured = {}

    class Capture(_ConstantCNN):
        def __call__(self, variables, img1, img2, ij1, ij2, sym):
            if not sym and "fine_ij2" not in captured:
                # Centers arrive shifted by the reflect margin.
                captured["fine_ij1"] = np.asarray(ij1)
                captured["fine_ij2"] = np.asarray(ij2)
            return super().__call__(variables, img1, img2, ij1, ij2, sym)

    coarse = np.array([0.5, -0.25])
    ref._patch_cnn = Capture(coarse, [0.0, 0.0])
    kps1 = np.array([[40.0, 30.0]])  # x, y -> ij (30, 40)
    kps2 = np.array([[60.0, 20.0]])  # ij (20, 60)
    ref.refine_matches(img1, kps1, img2, kps2, np.array([[0, 0]]))

    grid = refinement._grid_offsets(octave=-1.0)
    # Fine pass runs on the 2x image (192x256), whose reflect margin is 96.
    margin = 96.0
    expect_center1 = 2.0 * np.array([30.0, 40.0]) + margin
    expect_center2 = 2.0 * (np.array([20.0, 60.0]) + coarse * DISPLACEMENT_UNIT_PX) + margin
    got1 = captured["fine_ij1"][:9]
    got2 = captured["fine_ij2"][:9]
    np.testing.assert_allclose(got1, expect_center1[None] + grid, rtol=1e-6)
    np.testing.assert_allclose(got2, expect_center2[None] + grid, rtol=1e-6)


def test_grid_offsets_scaling():
    g0 = refinement._grid_offsets(0.0)
    gm1 = refinement._grid_offsets(-1.0)
    np.testing.assert_allclose(g0.reshape(3, 3, 2)[0, 0], [-8.0, -8.0])
    np.testing.assert_allclose(gm1, 2 * g0)
    assert g0.shape == (9, 2)


def test_empty_matches():
    rng = np.random.default_rng(2)
    img1, img2 = synthetic.shifted_pair(rng, 64, 64, (0, 0))
    ref = _make_refiner()
    g12, g21 = ref.refine_matches(img1, np.zeros((0, 2)), img2, np.zeros((0, 2)), np.zeros((0, 2), int))
    assert g12.shape == (0, 3, 3, 2) and g21.shape == (0, 3, 3, 2)


def test_real_cnn_smoke_chunking():
    """Random-weights CNN end-to-end with a batch smaller than the match count."""
    rng = np.random.default_rng(3)
    img1, img2 = synthetic.shifted_pair(rng, 96, 128, (2, -1))
    ref = refinement.TwoViewRefiner(batch_size=8, rng_seed=0)
    kps = np.stack([rng.uniform(30, 90, 13), rng.uniform(30, 60, 13)], axis=1)
    matches = np.stack([np.arange(13), np.arange(13)], axis=1)
    g12, g21 = ref.refine_matches(img1, kps, img2, kps, matches)
    assert g12.shape == (13, 3, 3, 2)
    assert np.isfinite(g12).all() and np.isfinite(g21).all()


def test_pad_image_buckets():
    img = np.ones((100, 300, 3), np.uint8)
    padded, size = refinement.pad_image(img)
    assert padded.shape == (256, 512, 3)
    np.testing.assert_array_equal(size, [100, 300])
    assert padded[:100, :300].min() == 1
    assert padded[100:].max() == 0


class _NCCOracleCNN:
    """A 'perfect' patch aligner: brute-force SSD search over integer shifts.

    Pins the displacement-sign convention of the whole refinement chain: for
    (reference, target) patches it returns the shift (in 16px units) that
    the pipeline should ADD to the target keypoint to land on the content
    matching the reference center.
    """

    def __init__(self, max_shift=8):
        self.max_shift = max_shift

    def _align(self, ref_patches, tgt_patches):
        import itertools

        n = ref_patches.shape[0]
        out = np.zeros((n, 2), np.float32)
        r = self.max_shift
        for k in range(n):
            ref = ref_patches[k].mean(-1)
            tgt = tgt_patches[k].mean(-1)
            best = (1e18, 0, 0)
            for di, dj in itertools.product(range(-r, r + 1), repeat=2):
                a = ref[max(0, -di) : 33 - max(0, di), max(0, -dj) : 33 - max(0, dj)]
                b = tgt[max(0, di) : 33 + min(0, di), max(0, dj) : 33 + min(0, dj)]
                ssd = float(((a - b) ** 2).mean())
                if ssd < best[0]:
                    best = (ssd, di, dj)
            # tgt[x + s] ~ ref[x] at s = best shift; the correction for the
            # target keypoint is s (content sits at +s inside the target).
            out[k] = (best[1] / 16.0, best[2] / 16.0)
        return out

    def __call__(self, variables, img1, img2, ij1, ij2, sym):
        from lfr_tpu.ops.patches import extract_patches_separable

        p1 = np.asarray(extract_patches_separable(img1, jnp.asarray(ij1)))
        p2 = np.asarray(extract_patches_separable(img2, jnp.asarray(ij2)))
        d12 = self._align(p1, p2)
        if not sym:
            return jnp.asarray(d12)
        d21 = self._align(p2, p1)
        return jnp.asarray(d12), jnp.asarray(d21)


def test_oracle_refinement_corrects_keypoint_noise():
    """End-to-end sign/unit convention check with a perfect patch aligner."""
    rng = np.random.default_rng(11)
    img1, img2 = synthetic.shifted_pair(rng, 160, 200, (0, 0))  # identical images
    ref = _make_refiner(batch_size=32)
    ref._patch_cnn = _NCCOracleCNN()

    kp_true = np.stack([rng.uniform(40, 160, 8), rng.uniform(40, 120, 8)], axis=1)
    noise = rng.uniform(-3, 3, (8, 2)).round()  # integer noise, oracle is integer
    kp2_noisy = kp_true + noise
    matches = np.stack([np.arange(8), np.arange(8)], axis=1)

    g12, _ = ref.refine_matches(img1, kp_true, img2, kp2_noisy, matches)
    # Applying the center displacement to the noisy keypoint (x += dj*16,
    # y += di*16; reference: colmap_utils.py:126-137) must cancel the noise.
    corr = g12[:, 1, 1][:, ::-1] * 16.0  # (dj, di) -> (dx, dy)
    recovered = kp2_noisy + corr
    err_before = np.linalg.norm(kp2_noisy - kp_true, axis=1)
    err_after = np.linalg.norm(recovered - kp_true, axis=1)
    assert np.median(err_after) <= 1.0
    assert err_after.mean() < err_before.mean() * 0.5


def test_fused_fine_matches_chunked_path():
    """The scanned fused fine program must equal the per-direction path."""
    rng = np.random.default_rng(12)
    img1, img2 = synthetic.shifted_pair(rng, 96, 128, (1, -2))
    ref = refinement.TwoViewRefiner(batch_size=16, rng_seed=0)
    kps = np.stack([rng.uniform(30, 90, 11), rng.uniform(30, 60, 11)], axis=1)
    matches = np.stack([np.arange(11), np.arange(11)], axis=1)
    g12_fused, g21_fused = ref.refine_matches(img1, kps, img2, kps, matches)

    # Force the chunked fallback by "replacing" the CNN with itself via a
    # wrapper (identity behavior, different object).
    orig = ref._patch_cnn

    def wrapper(*args, **kwargs):
        return orig(*args, **kwargs)

    ref._patch_cnn = wrapper
    g12_chunk, g21_chunk = ref.refine_matches(img1, kps, img2, kps, matches)
    np.testing.assert_allclose(g12_fused, g12_chunk, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(g21_fused, g21_chunk, atol=2e-4, rtol=1e-3)


def test_refinement_with_mismatched_image_sizes():
    """The fused program's device-image harmonization must handle pairs
    whose images have different shapes (and so different pad buckets)."""
    rng = np.random.default_rng(13)
    img1 = synthetic.textured_image(rng, 200, 320)
    img2 = synthetic.textured_image(rng, 120, 180)
    ref = refinement.TwoViewRefiner(batch_size=8, rng_seed=0)
    kp1 = np.stack([rng.uniform(30, 290, 9), rng.uniform(30, 170, 9)], axis=1)
    kp2 = np.stack([rng.uniform(30, 150, 9), rng.uniform(30, 90, 9)], axis=1)
    matches = np.stack([np.arange(9), np.arange(9)], axis=1)
    g12, g21 = ref.refine_matches(img1, kp1, img2, kp2, matches)
    assert g12.shape == (9, 3, 3, 2) and np.isfinite(g12).all()
    assert g21.shape == (9, 3, 3, 2) and np.isfinite(g21).all()


def test_fused_match_and_refine_parity():
    """The one-dispatch match+refine program equals matcher + refine_matches."""
    from lfr_tpu.ops import matchers

    rng = np.random.default_rng(14)
    img1, img2 = synthetic.shifted_pair(rng, 120, 160, (2, -1))
    n = 60
    kp1 = np.stack([rng.uniform(30, 130, n), rng.uniform(30, 90, n)], axis=1)
    kp2 = kp1 + rng.uniform(-1, 1, (n, 2))
    d1 = rng.standard_normal((n, 64)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = (d1 + 0.05 * rng.standard_normal((n, 64)).astype(np.float32))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    ref = refinement.TwoViewRefiner(batch_size=256, rng_seed=0)
    pending = ref.process_pair(img1, kp1, d1, img2, kp2, d2, "ratio", 0.9)
    f_matches, f_sims, f_g12, f_g21 = ref.finalize_pair(pending)

    m, s = matchers.match(d1, d2, "ratio", 0.9)
    np.testing.assert_array_equal(f_matches, m)
    np.testing.assert_allclose(f_sims, s, rtol=1e-5)
    g12, g21 = ref.refine_matches(img1, kp1, img2, kp2, m)
    np.testing.assert_allclose(f_g12, g12, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(f_g21, g21, atol=2e-4, rtol=1e-3)


def test_unit_crop_extractor_slicing_property():
    """A 33x33 sub-window of a 65x65 unit crop equals the 33x33 unit crop
    at the shifted center — the property the crop fine mode relies on to
    serve all nine grid patches from one crop."""
    from lfr_tpu.ops.patches import extract_crops_unit

    rng = np.random.default_rng(20)
    img = jnp.asarray(rng.uniform(0, 255, (120, 140, 3)).astype(np.float32))
    centers = jnp.asarray(np.array([[60.3, 70.8], [55.0, 64.25]], np.float32))
    big = np.asarray(extract_crops_unit(img, centers, 65))
    for a in (0, 16, 32):
        for b in (0, 16, 32):
            off = np.array([a - 16.0, b - 16.0], np.float32)
            small = np.asarray(extract_crops_unit(img, centers + off, 33))
            np.testing.assert_allclose(
                big[:, a : a + 33, b : b + 33], small, atol=1e-3
            )


def test_crop_fine_mode_close_to_grid():
    """fine_mode='crop' (backbone once per 65px crop, sliced features) must
    track the reference-parity 'grid' mode closely with trained weights."""
    import pathlib

    from lfr_tpu.models.checkpoint import load_variables

    ckpt = pathlib.Path(__file__).resolve().parents[1] / "weights" / "panet_cpu.msgpack"
    v = load_variables(str(ckpt))
    rng = np.random.default_rng(21)
    img1, img2 = synthetic.shifted_pair(rng, 96, 128, (2, -1))
    n = 6
    kps = np.stack([rng.uniform(35, 90, n), rng.uniform(35, 60, n)], axis=1)
    matches = np.stack([np.arange(n), np.arange(n)], axis=1)
    rg = refinement.TwoViewRefiner(variables=v, batch_size=8, fine_mode="grid")
    rc = refinement.TwoViewRefiner(variables=v, batch_size=8, fine_mode="crop")
    g12g, g21g = rg.refine_matches(img1, kps, img2, kps, matches)
    g12c, g21c = rc.refine_matches(img1, kps, img2, kps, matches)
    # Identical coarse pass; fine passes differ only by sampling lattice
    # (calibrated) and crop-border context. 0.05 units = 0.8 px.
    assert np.abs(g12g - g12c).max() < 0.05
    assert np.abs(g21g - g21c).max() < 0.05


def test_fused_pair_capacity_regrows_on_overflow():
    """max_matches is a capacity, not a cap: overflow re-dispatches larger
    and returns ALL matches (regression: a silent 2048 truncation)."""
    rng = np.random.default_rng(15)
    img1, img2 = synthetic.shifted_pair(rng, 120, 160, (2, -1))
    n = 40
    kp1 = np.stack([rng.uniform(30, 130, n), rng.uniform(30, 90, n)], axis=1)
    kp2 = kp1 + rng.uniform(-1, 1, (n, 2))
    d1 = rng.standard_normal((n, 64)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = (d1 + 0.02 * rng.standard_normal((n, 64)).astype(np.float32))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    ref = refinement.TwoViewRefiner(batch_size=64, rng_seed=0)
    from lfr_tpu.ops import matchers

    m, _ = matchers.match(d1, d2, "ratio", 0.95)
    assert m.shape[0] > 8  # premise: more matches than the tiny capacity

    pending = ref.process_pair(
        img1, kp1, d1, img2, kp2, d2, "ratio", 0.95, max_matches=8
    )
    f_matches, f_sims, _, _ = ref.finalize_pair(pending)
    assert ref.regrown_pairs == 1
    np.testing.assert_array_equal(f_matches, m)
