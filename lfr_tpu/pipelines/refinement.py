"""Coarse-to-fine two-view match refinement on TPU.

Mirrors the reference driver's semantics exactly
(reference: two-view-refinement/refinement.py:76-185): a symmetric
single-center pass at octave 0, then an asymmetric 3x3-grid pass per
direction on 2x-upsampled images re-centered by the coarse estimate
(displacement unit = 16 px, grid = +-8 px at octave 0, fine result halved).

TPU-first differences from the reference:
  * patches are extracted and consumed on device — no GPU->CPU->GPU bounce
    (reference: refinement.py:43,57-58 round-trips through host);
  * patch sampling is the separable crop+matmul formulation
    (ops.patches.extract_patches_separable) over reflect-padded images in
    shape buckets, so every pair reuses a handful of compiled programs;
  * CNN chunks are dispatched asynchronously and synced once per stage.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_BATCH_SIZE, DISPLACEMENT_UNIT_PX, GRID_OFFSET_PX, PATCH_SIZE
from ..models import panet
from ..ops.patches import (
    REFLECT_MARGIN,
    extract_crops_unit,
    extract_patch_grid_separable,
    extract_patches_separable,
)

#: Image dims are padded up to multiples of this (keeps the jit cache small).
IMAGE_BUCKET = 256


def _cnn_asym(model, variables, ps, pt):
    """Asymmetric CNN forward.  The correlation stage inside runs the
    fused Pallas kernel on TPU (ops/correlation.py); the conv head stays
    in XLA — a fully VMEM-fused corr+head kernel was built and measured
    6x SLOWER than XLA's conv lowering (73 ms vs ~12 ms at batch 2048 on
    v5e; XLA's im2col convs reach ~46% of bf16 peak), so it was removed
    rather than shipped dead."""
    return model.apply(variables, ps, pt)


def _cnn_sym(model, variables, ps, pt):
    return model.apply(variables, ps, pt, method=panet.PANet.forward_sym)


def _grid_offsets(octave: float) -> np.ndarray:
    """(9, 2) grid of (di, dj) offsets: +-8 px scaled by 2^-octave
    (reference: refinement.py:83-87)."""
    g = np.stack(
        np.meshgrid([-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0], indexing="ij"), axis=-1
    ).reshape(-1, 2)
    return g * GRID_OFFSET_PX / (2.0 ** octave)


def pad_image(image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (H, W, C) to the next shape bucket; returns (padded, valid_hw)."""
    h, w = image.shape[:2]
    ph = -(-h // IMAGE_BUCKET) * IMAGE_BUCKET
    pw = -(-w // IMAGE_BUCKET) * IMAGE_BUCKET
    out = np.zeros((ph, pw) + image.shape[2:], dtype=image.dtype)
    out[:h, :w] = image
    return out, np.array([h, w], dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("margin", "bucket_h", "bucket_w"))
def _prep_image(raw, margin: int, bucket_h: int, bucket_w: int):
    """Reflect-pad + bucket-pad on device (raw uint8 in, float32 out)."""
    reflected = jnp.pad(
        raw.astype(jnp.float32),
        ((margin, margin), (margin, margin), (0, 0)),
        mode="reflect",
    )
    out = jnp.zeros((bucket_h, bucket_w, 3), jnp.float32)
    return out.at[: reflected.shape[0], : reflected.shape[1]].set(reflected)


@functools.partial(jax.jit, static_argnames=("margin", "bucket_h", "bucket_w"))
def _prep_image_up(raw, margin: int, bucket_h: int, bucket_w: int):
    """2x Gaussian upsample + reflect/bucket pad, all on device."""
    from ..ops.image_ops import pyr_up

    up = pyr_up(raw.astype(jnp.float32))
    reflected = jnp.pad(
        up, ((margin, margin), (margin, margin), (0, 0)), mode="reflect"
    )
    out = jnp.zeros((bucket_h, bucket_w, 3), jnp.float32)
    return out.at[: reflected.shape[0], : reflected.shape[1]].set(reflected)


def _bucket_dims(h: int, w: int, margin: int):
    ph = -(-(h + 2 * margin) // IMAGE_BUCKET) * IMAGE_BUCKET
    pw = -(-(w + 2 * margin) // IMAGE_BUCKET) * IMAGE_BUCKET
    return ph, pw


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _extend(arr, h: int, w: int):
    out = jnp.zeros((h, w, arr.shape[2]), arr.dtype)
    return out.at[: arr.shape[0], : arr.shape[1]].set(arr)


def _harmonize(a: "_DeviceImage", b: "_DeviceImage"):
    """Zero-extend two device images to a shared bucket shape (the fused
    fine program selects between them with jnp.where, which needs equal
    shapes; the extension region is never sampled thanks to window clamps)."""
    h = max(a.array.shape[0], b.array.shape[0])
    w = max(a.array.shape[1], b.array.shape[1])
    arr_a = a.array if a.array.shape[:2] == (h, w) else _extend(a.array, h, w)
    arr_b = b.array if b.array.shape[:2] == (h, w) else _extend(b.array, h, w)
    return arr_a, arr_b


class _DeviceImage:
    """An image reflect-padded + bucket-padded on device, with the margin
    offset translating image coordinates into padded coordinates.

    Only the raw uint8 image crosses the host-device link; padding (and the
    2x pyramid level for the fine pass) computes on device.
    """

    def __init__(self, image: np.ndarray, upsample: bool = False):
        h, w = image.shape[:2]
        if upsample:
            h, w = 2 * h, 2 * w
        margin = int(min(REFLECT_MARGIN, h - 1, w - 1))
        ph, pw = _bucket_dims(h, w, margin)
        raw = jnp.asarray(np.ascontiguousarray(image))
        if upsample:
            self.array = _prep_image_up(raw, margin, ph, pw)
        else:
            self.array = _prep_image(raw, margin, ph, pw)
        self.offset = float(margin)


class PreparedImage:
    """Device-resident form of one image: the padded base level plus the 2x
    pyramid level for the fine pass.

    Preparing an image costs one host->device transfer and two device
    programs; an image typically participates in many pairs, so callers
    (match_graph, bench) prepare each image once and reuse it — the
    reference reloads + re-uploads per pair (compute_match_graph.py:104-117).
    """

    def __init__(self, image: np.ndarray):
        self.base = _DeviceImage(image)
        self.up = _DeviceImage(image, upsample=True)


def prepare_image(image) -> PreparedImage:
    """Coerce an (H, W, 3) uint8 array to its device-resident form (no-op
    when already prepared)."""
    if isinstance(image, PreparedImage):
        return image
    return PreparedImage(image)


class TwoViewRefiner:
    """Runs the patch-alignment CNN coarse-to-fine over matched keypoints."""

    def __init__(
        self,
        variables=None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        compute_dtype=jnp.bfloat16,
        rng_seed: int = 0,
        fine_mode: str = "grid",
    ):
        """``fine_mode`` selects the fine-pass formulation:

        * ``"grid"`` (default): reference-parity — 9 independent 33x33
          patches per direction on the ps/(ps-1)-spaced sampling grid,
          each through the full CNN (reference: refinement.py:83-97).
        * ``"crop"``: TPU-fast — one unit-lattice 65x65 crop per direction
          runs the backbone ONCE; the nine 17x17 feature windows are
          integer slices of the crop's feature map (~2.3x less backbone
          compute).  Deviations from grid mode, both measured in the A/B
          harness: fine patches sample at 1 px spacing instead of
          ps/(ps-1) (flow rescaled by (ps-1)/ps to compensate), and patch
          borders see real crop neighborhoods instead of conv zero-padding.
        """
        if fine_mode not in ("grid", "crop"):
            raise ValueError(f"fine_mode must be 'grid' or 'crop', got {fine_mode!r}")
        self.fine_mode = fine_mode
        if variables is None:
            import sys

            print(
                "[refinement] no checkpoint provided - using randomly "
                "initialized flow-CNN weights (refinement output will be "
                "near-zero noise; train with `python -m lfr_tpu.models.train` "
                "or pass --checkpoint)",
                file=sys.stderr,
            )
            variables = panet.init_params(jax.random.PRNGKey(rng_seed), compute_dtype)
        # Inference-only: fold the head's eval-mode BatchNorm into the conv
        # weights (measured 56.5% -> 68.5% of bf16 peak on the refine head,
        # scripts/bench_head_variants.py), then fold the ImageNet input
        # normalization into conv1_1: the CNN entry points below feed RAW
        # [0,255] patches (``_norm`` is identity), dropping one full-tensor
        # elementwise pass per patch batch.  A tree without batch_stats is
        # taken to be already FULLY folded (BN + normalize, e.g. reloaded
        # folded weights) — the normalize fold is gated on the BN fold so it
        # is never applied twice (double-scaling conv1_1 would silently
        # corrupt every refinement).
        if "batch_stats" in variables:
            variables = panet.fold_bn_variables(variables)
            variables = panet.fold_normalize_variables(variables)
        self.variables = variables
        _norm = lambda p: p  # noqa: E731 — see fold_normalize_variables
        self.batch_size = int(batch_size)
        self.model = panet.PANet(compute_dtype, folded=True)

        @functools.partial(jax.jit, static_argnames=("sym",))
        def _patch_cnn(variables, img1, img2, ij1, ij2, sym):
            p1 = extract_patches_separable(img1, ij1, PATCH_SIZE)
            p2 = extract_patches_separable(img2, ij2, PATCH_SIZE)
            p1 = _norm(p1)
            p2 = _norm(p2)
            if sym:
                return _cnn_sym(self.model, variables, p1, p2)
            return _cnn_asym(self.model, variables, p1, p2)

        self._patch_cnn = _patch_cnn
        self._patch_cnn_original = _patch_cnn

        @jax.jit
        def _fine_both(variables, up1, up2, ij1, ij2, c12, c21, off1, off2):
            """Both fine directions as one program.

            All 4 x 9 patch grids are extracted up front with the one-crop
            3x3-grid extractor (9x fewer HBM gathers than per-offset
            extraction), then a lax.scan over the 9 grid offsets runs the
            asym CNN on both directions at once (batch 2N — larger MXU
            batches, 9 steps instead of 18).

            ij*: (N, 2) original-scale centers; off*: per-image margin
            offsets of the upsampled device images.
            """
            g = int(2.0 * GRID_OFFSET_PX)  # +-16 px on the 2x image
            src12 = 2.0 * ij1 + off1
            tgt12 = 2.0 * (ij2 + c12 * DISPLACEMENT_UNIT_PX) + off2
            src21 = 2.0 * ij2 + off2
            tgt21 = 2.0 * (ij1 + c21 * DISPLACEMENT_UNIT_PX) + off1

            # NOTE on layout: keeping the (2N, 9, ...) buffers and slicing
            # [:, k] inside the scan lets XLA sink the per-offset slice of
            # the grid extraction into the loop body; materializing
            # offset-major buffers and feeding them as scan xs measured
            # ~25% SLOWER end-to-end (extra ~1 GB of transpose+read
            # traffic), so don't "fix" this into xs form.
            srcs = jnp.concatenate(
                [
                    extract_patch_grid_separable(up1, src12, g, PATCH_SIZE),
                    extract_patch_grid_separable(up2, src21, g, PATCH_SIZE),
                ],
                axis=0,
            )  # (2N, 9, ps, ps, 3)
            tgts = jnp.concatenate(
                [
                    extract_patch_grid_separable(up2, tgt12, g, PATCH_SIZE),
                    extract_patch_grid_separable(up1, tgt21, g, PATCH_SIZE),
                ],
                axis=0,
            )

            def step(_, k):
                ps = _norm(srcs[:, k])
                pt = _norm(tgts[:, k])
                return None, _cnn_asym(self.model, variables, ps, pt)

            _, disp = jax.lax.scan(step, None, jnp.arange(9))  # (9, 2N, 2)
            n = ij1.shape[0]
            fine12 = jnp.transpose(disp[:, :n], (1, 0, 2)).reshape(-1, 3, 3, 2)
            fine21 = jnp.transpose(disp[:, n:], (1, 0, 2)).reshape(-1, 3, 3, 2)
            return fine12, fine21

        @jax.jit
        def _fine_both_crop(variables, up1, up2, ij1, ij2, c12, c21, off1, off2):
            """Crop-feature fine pass: backbone once per 65 px crop.

            Each direction needs 9 (src, tgt) patch pairs on a +-16 px grid
            (2x image).  On a unit sampling lattice the 9 patches are
            integer-offset 33x33 windows of one 65x65 crop, and because the
            backbone's stride-2 reduction aligns with the even (16 px)
            offsets, their 17x17 feature maps are integer slices (stride 8)
            of the crop's 33x33 feature map.  So: extract 4N crops, run the
            backbone ONCE (4N x 3.9 patch-equivalents instead of 9 x 4N
            patches), and scan the 9 offsets over correlation + head only.
            """
            g = int(2.0 * GRID_OFFSET_PX)  # +-16 px on the 2x image
            crop = PATCH_SIZE + 2 * g  # 65
            src12 = 2.0 * ij1 + off1
            tgt12 = 2.0 * (ij2 + c12 * DISPLACEMENT_UNIT_PX) + off2
            src21 = 2.0 * ij2 + off2
            tgt21 = 2.0 * (ij1 + c21 * DISPLACEMENT_UNIT_PX) + off1

            crops = jnp.concatenate(
                [
                    extract_crops_unit(up1, src12, crop),
                    extract_crops_unit(up2, src21, crop),
                    extract_crops_unit(up2, tgt12, crop),
                    extract_crops_unit(up1, tgt21, crop),
                ],
                axis=0,
            )  # (4N, 65, 65, 3)
            fmaps = self.model.apply(
                variables,
                _norm(crops),
                method=lambda m, x: m.features(x),
            )  # (4N, 33, 33, C) — per-position L2 norm commutes with slicing
            n = ij1.shape[0]
            fsrc, ftgt = fmaps[: 2 * n], fmaps[2 * n :]
            fdim = panet.FMAP
            step_px = g // 2  # 16 px grid -> 8 feature rows (stride 2)

            def step(_, k):
                a = (k // 3) * step_px
                b = (k % 3) * step_px
                fs = jax.lax.dynamic_slice(
                    fsrc, (0, a, b, 0), (2 * n, fdim, fdim, fsrc.shape[3])
                )
                ft = jax.lax.dynamic_slice(
                    ftgt, (0, a, b, 0), (2 * n, fdim, fdim, ftgt.shape[3])
                )
                d = self.model.apply(
                    variables, fs, ft, method=panet.PANet.flow_from_features
                )
                return None, d

            _, disp = jax.lax.scan(step, None, jnp.arange(9))  # (9, 2N, 2)
            # Unit-lattice calibration: the CNN is trained on ps/(ps-1)-
            # spaced patches, where a delta-px shift appears as
            # delta*(ps-1)/ps lattice steps; unit-spaced crops show delta
            # full steps, so predictions run (ps/(ps-1))x hot.
            disp = disp * ((PATCH_SIZE - 1.0) / PATCH_SIZE)
            fine12 = jnp.transpose(disp[:, :n], (1, 0, 2)).reshape(-1, 3, 3, 2)
            fine21 = jnp.transpose(disp[:, n:], (1, 0, 2)).reshape(-1, 3, 3, 2)
            return fine12, fine21

        self._fine_both = _fine_both if fine_mode == "grid" else _fine_both_crop
        _fine_both = self._fine_both

        @jax.jit
        def _refine_full(
            variables, im1, im2, up1, up2, ij1, ij2, o1, o2, ou1, ou2
        ):
            """The whole coarse-to-fine refinement as ONE device program:
            symmetric coarse pass feeds the scanned fine stage without any
            host round-trip."""
            p1 = _norm(
                extract_patches_separable(im1, ij1 + o1, PATCH_SIZE)
            )
            p2 = _norm(
                extract_patches_separable(im2, ij2 + o2, PATCH_SIZE)
            )
            c12, c21 = _cnn_sym(self.model, variables, p1, p2)
            fine12, fine21 = _fine_both(
                variables, up1, up2, ij1, ij2, c12, c21, ou1, ou2
            )
            grid12 = c12[:, None, None] + 0.5 * fine12
            grid21 = c21[:, None, None] + 0.5 * fine21
            return grid12, grid21

        self._refine_full = _refine_full

        @functools.partial(jax.jit, static_argnames=("matcher", "max_matches"))
        def _match_and_refine(
            variables,
            d1, d2, n1, n2, threshold,
            kp1, kp2,
            im1, im2, up1, up2,
            o1, o2, ou1, ou2,
            matcher: str,
            max_matches: int,
        ):
            """Hot loop #1 as ONE program: MNN matching, match compaction,
            coarse+fine refinement — a single dispatch per image pair.

            d1/d2: (B1, D)/(B2, D) padded descriptors; kp1/kp2 padded (x, y)
            keypoints at matching resolution.  Returns padded match arrays
            (idx (K, 2), sim (K,), valid (K,)) and flow grids (K, 3, 3, 2).
            """
            from ..ops import matchers as matchers_mod

            if matcher == "similarity":
                nn12, msim, keep = matchers_mod._mnn_similarity_padded(
                    d1, d2, n1, n2, threshold
                )
            else:
                nn12, msim, keep = matchers_mod._mnn_ratio_padded(
                    d1, d2, n1, n2, threshold
                )

            # Compact matches to the first max_matches keeps (index order,
            # like the host matcher's nonzero()).  n_keep reports the TRUE
            # match count so the host can detect overflow and re-dispatch
            # with a larger capacity — no silent truncation (the reference
            # keeps all matches, compute_match_graph.py:134-147).
            n_keep = jnp.sum(keep)
            big = d1.shape[0] + 1
            order = jnp.where(keep, jnp.arange(d1.shape[0]), big)
            order = jnp.sort(order)[:max_matches]
            valid = order < big
            idx1 = jnp.where(valid, order, 0)
            idx2 = nn12[idx1]
            sim_out = msim[idx1]

            ij1 = kp1[idx1][:, ::-1]  # (x, y) -> (i, j)
            ij2 = kp2[idx2][:, ::-1]

            p1 = _norm(
                extract_patches_separable(im1, ij1 + o1, PATCH_SIZE)
            )
            p2 = _norm(
                extract_patches_separable(im2, ij2 + o2, PATCH_SIZE)
            )
            c12, c21 = _cnn_sym(self.model, variables, p1, p2)
            fine12, fine21 = _fine_both(
                variables, up1, up2, ij1, ij2, c12, c21, ou1, ou2
            )
            grid12 = c12[:, None, None] + 0.5 * fine12
            grid21 = c21[:, None, None] + 0.5 * fine21
            # Pack everything into ONE (K, 41) row block — the host link
            # has ~50 ms per-transfer latency, so six separate result
            # arrays per pair would cost more than the CNN itself.
            # Layout: [idx1, idx2, sim, valid, grid12 (18), grid21 (18),
            # n_keep (broadcast)].
            return jnp.concatenate(
                [
                    idx1[:, None].astype(jnp.float32),
                    idx2[:, None].astype(jnp.float32),
                    sim_out[:, None],
                    valid[:, None].astype(jnp.float32),
                    grid12.reshape(-1, 18),
                    grid21.reshape(-1, 18),
                    jnp.full((idx1.shape[0], 1), n_keep, jnp.float32),
                ],
                axis=1,
            )

        self._match_and_refine = _match_and_refine
        #: Pairs whose match count overflowed the default capacity and were
        #: transparently re-dispatched at a larger one (health counter).
        self.regrown_pairs = 0

        @functools.partial(jax.jit, static_argnames=("matcher",))
        def _match_only(d1, d2, n1, n2, threshold, matcher: str):
            """Matching alone, packed as (B1, 3) [nn12, sim, keep] — the
            cross-pair streaming path matches per pair (cheap) and batches
            the CNN across pairs (see pipelines.stream)."""
            from ..ops import matchers as matchers_mod

            if matcher == "similarity":
                nn12, msim, keep = matchers_mod._mnn_similarity_padded(
                    d1, d2, n1, n2, threshold
                )
            else:
                nn12, msim, keep = matchers_mod._mnn_ratio_padded(
                    d1, d2, n1, n2, threshold
                )
            return jnp.stack(
                [nn12.astype(jnp.float32), msim, keep.astype(jnp.float32)], axis=1
            )

        self._match_only = _match_only

        @functools.partial(jax.jit, static_argnames=("matcher",))
        def _match_stack(dstack, s1, s2, n1, n2, thr, matcher: str):
            """Batched matching against a device descriptor stack: P pairs
            of stack slots match in one program and return one packed
            (P, B, 3) array — one host transfer per P pairs instead of one
            per pair (the ~50-90 ms per-transfer link latency dominated the
            match stage once the CNN was batched; see pipelines.stream)."""
            from ..ops import matchers as matchers_mod

            def one(i1, i2, m1, m2, t):
                d1 = dstack[i1]
                d2 = dstack[i2]
                if matcher == "similarity":
                    nn12, msim, keep = matchers_mod._mnn_similarity_padded(
                        d1, d2, m1, m2, t
                    )
                else:
                    nn12, msim, keep = matchers_mod._mnn_ratio_padded(
                        d1, d2, m1, m2, t
                    )
                return jnp.stack(
                    [nn12.astype(jnp.float32), msim, keep.astype(jnp.float32)],
                    axis=1,
                )

            return jax.vmap(one)(s1, s2, n1, n2, thr)

        self._match_stack = _match_stack

        def _fine_both_stack(variables, up, k1, k2, ij1, ij2, c12, c21, ou1, ou2):
            """Stacked-image form of the fine pass: identical math to
            ``_fine_both``/``_fine_both_crop`` but each match reads its own
            images from an (S, H, W, 3) stack via per-match indices."""
            g = int(2.0 * GRID_OFFSET_PX)
            src12 = 2.0 * ij1 + ou1[:, None]
            tgt12 = 2.0 * (ij2 + c12 * DISPLACEMENT_UNIT_PX) + ou2[:, None]
            src21 = 2.0 * ij2 + ou2[:, None]
            tgt21 = 2.0 * (ij1 + c21 * DISPLACEMENT_UNIT_PX) + ou1[:, None]
            n = ij1.shape[0]

            if fine_mode == "grid":
                srcs = jnp.concatenate(
                    [
                        extract_patch_grid_separable(up, src12, g, PATCH_SIZE, img_idx=k1),
                        extract_patch_grid_separable(up, src21, g, PATCH_SIZE, img_idx=k2),
                    ],
                    axis=0,
                )
                tgts = jnp.concatenate(
                    [
                        extract_patch_grid_separable(up, tgt12, g, PATCH_SIZE, img_idx=k2),
                        extract_patch_grid_separable(up, tgt21, g, PATCH_SIZE, img_idx=k1),
                    ],
                    axis=0,
                )

                def step(_, k):
                    ps = _norm(srcs[:, k])
                    pt = _norm(tgts[:, k])
                    return None, _cnn_asym(self.model, variables, ps, pt)

                _, disp = jax.lax.scan(step, None, jnp.arange(9))
            else:
                crop = PATCH_SIZE + 2 * g  # 65
                crops = jnp.concatenate(
                    [
                        extract_crops_unit(up, src12, crop, img_idx=k1),
                        extract_crops_unit(up, src21, crop, img_idx=k2),
                        extract_crops_unit(up, tgt12, crop, img_idx=k2),
                        extract_crops_unit(up, tgt21, crop, img_idx=k1),
                    ],
                    axis=0,
                )
                fmaps = self.model.apply(
                    variables,
                    _norm(crops),
                    method=lambda m, x: m.features(x),
                )
                fsrc, ftgt = fmaps[: 2 * n], fmaps[2 * n :]
                fdim = panet.FMAP
                step_px = g // 2

                def step(_, k):
                    a = (k // 3) * step_px
                    b = (k % 3) * step_px
                    fs = jax.lax.dynamic_slice(
                        fsrc, (0, a, b, 0), (2 * n, fdim, fdim, fsrc.shape[3])
                    )
                    ft = jax.lax.dynamic_slice(
                        ftgt, (0, a, b, 0), (2 * n, fdim, fdim, ftgt.shape[3])
                    )
                    d = self.model.apply(
                        variables, fs, ft, method=panet.PANet.flow_from_features
                    )
                    return None, d

                _, disp = jax.lax.scan(step, None, jnp.arange(9))
                disp = disp * ((PATCH_SIZE - 1.0) / PATCH_SIZE)

            fine12 = jnp.transpose(disp[:, :n], (1, 0, 2)).reshape(-1, 3, 3, 2)
            fine21 = jnp.transpose(disp[:, n:], (1, 0, 2)).reshape(-1, 3, 3, 2)
            return fine12, fine21

        @jax.jit
        def _refine_batch(variables, base, up, k1, k2, ij1, ij2, ob1, ob2, ou1, ou2):
            """Cross-pair batched coarse-to-fine refinement over image
            stacks: one program refines a fixed-size batch of matches drawn
            from MANY pairs, so per-pair match counts never pad the CNN.
            Returns (B, 36) packed [grid12 (18), grid21 (18)]."""
            p1 = _norm(
                extract_patches_separable(base, ij1 + ob1[:, None], PATCH_SIZE, img_idx=k1)
            )
            p2 = _norm(
                extract_patches_separable(base, ij2 + ob2[:, None], PATCH_SIZE, img_idx=k2)
            )
            c12, c21 = _cnn_sym(self.model, variables, p1, p2)
            fine12, fine21 = _fine_both_stack(
                variables, up, k1, k2, ij1, ij2, c12, c21, ou1, ou2
            )
            grid12 = c12[:, None, None] + 0.5 * fine12
            grid21 = c21[:, None, None] + 0.5 * fine21
            return jnp.concatenate(
                [grid12.reshape(-1, 18), grid21.reshape(-1, 18)], axis=1
            )

        self._refine_batch = _refine_batch

    # ------------------------------------------------------------------
    # Fused per-pair pipeline (matching + refinement, one dispatch).
    # ------------------------------------------------------------------

    def process_pair(
        self,
        image1: np.ndarray,
        keypoints1: np.ndarray,
        descriptors1: np.ndarray,
        image2: np.ndarray,
        keypoints2: np.ndarray,
        descriptors2: np.ndarray,
        matcher: str,
        threshold: float,
        max_matches: int = 2048,
    ):
        """Dispatch matching + coarse-to-fine refinement for one pair.

        Returns an opaque pending handle; resolve with
        :meth:`finalize_pair`.  Dispatches do not synchronize, so
        consecutive pairs pipeline through the device.

        ``max_matches`` is a *capacity*, not a cap: finalize_pair detects
        overflow via the returned true match count and re-dispatches the
        pair at a larger capacity, so no match is ever silently dropped.

        ``image1``/``image2`` may be raw (H, W, 3) arrays or
        :class:`PreparedImage` handles (prepare once, reuse across pairs).
        """
        from ..ops.matchers import _pad_descriptors

        d1, n1 = _pad_descriptors(np.asarray(descriptors1, np.float32))
        d2, n2 = _pad_descriptors(np.asarray(descriptors2, np.float32))
        kp1 = np.zeros((d1.shape[0], 2), np.float32)
        kp1[:n1] = keypoints1[:, :2]
        kp2 = np.zeros((d2.shape[0], 2), np.float32)
        kp2[:n2] = keypoints2[:, :2]

        prep1 = prepare_image(image1)
        prep2 = prepare_image(image2)
        d_img1, d_up1 = prep1.base, prep1.up
        d_img2, d_up2 = prep2.base, prep2.up
        up1_arr, up2_arr = _harmonize(d_up1, d_up2)
        im1_arr, im2_arr = _harmonize(d_img1, d_img2)

        capacity = min(max_matches, d1.shape[0])
        out = self._match_and_refine(
            self.variables,
            jnp.asarray(d1),
            jnp.asarray(d2),
            jnp.int32(n1),
            jnp.int32(n2),
            jnp.float32(threshold),
            jnp.asarray(kp1),
            jnp.asarray(kp2),
            im1_arr,
            im2_arr,
            up1_arr,
            up2_arr,
            jnp.float32(d_img1.offset),
            jnp.float32(d_img2.offset),
            jnp.float32(d_up1.offset),
            jnp.float32(d_up2.offset),
            matcher="similarity" if matcher == "similarity" else "ratio",
            max_matches=capacity,
        )
        retry_args = (
            prep1, keypoints1, descriptors1,
            prep2, keypoints2, descriptors2,
            matcher, threshold,
        )
        return (out, capacity, d1.shape[0], retry_args)

    def finalize_pair(self, pending):
        """Resolve a :meth:`process_pair` handle ->
        (matches (N, 2) int64, sims (N,), grid12, grid21).

        If the pair's true match count exceeded the dispatch capacity, the
        pair is re-dispatched synchronously at a larger capacity (rounded
        to 1024 to bound the number of compiled programs) and the counter
        ``regrown_pairs`` is bumped — matches are never silently dropped.
        """
        import sys

        out, capacity, max_capacity, retry_args = pending
        packed = np.asarray(out)  # one transfer for the whole pair
        n_keep = int(packed[0, 40])
        if n_keep > capacity and capacity < max_capacity:
            new_cap = min(-(-n_keep // 1024) * 1024, max_capacity)
            self.regrown_pairs += 1
            print(
                f"[refinement] pair exceeded match capacity "
                f"({n_keep} > {capacity}); re-dispatching at {new_cap}",
                file=sys.stderr,
            )
            return self.finalize_pair(
                self.process_pair(*retry_args, max_matches=new_cap)
            )
        rows = packed[packed[:, 3] > 0]
        return (
            rows[:, 0:2].astype(np.int64),
            rows[:, 2].astype(np.float32),
            rows[:, 4:22].reshape(-1, 3, 3, 2).astype(np.float32),
            rows[:, 22:40].reshape(-1, 3, 3, 2).astype(np.float32),
        )

    # ------------------------------------------------------------------

    def _run_chunked(self, img1: _DeviceImage, img2: _DeviceImage, ij1, ij2, sym: bool):
        """Chunk (N, 2) center lists to the fixed batch size and run the CNN.

        All chunks are dispatched before any host sync, so device execution
        pipelines across chunks.
        """
        n = ij1.shape[0]
        bs = self.batch_size
        pending = []
        for start in range(0, n, bs):
            c1 = ij1[start : start + bs] + img1.offset
            c2 = ij2[start : start + bs] + img2.offset
            pad = bs - c1.shape[0]
            if pad:
                c1 = np.concatenate([c1, np.full((pad, 2), img1.offset, c1.dtype)])
                c2 = np.concatenate([c2, np.full((pad, 2), img2.offset, c2.dtype)])
            out = self._patch_cnn(
                self.variables,
                img1.array,
                img2.array,
                jnp.asarray(c1, jnp.float32),
                jnp.asarray(c2, jnp.float32),
                sym,
            )
            pending.append((out, bs - pad))

        if sym:
            d12 = np.concatenate([np.asarray(o[0][:k]) for o, k in pending])
            d21 = np.concatenate([np.asarray(o[1][:k]) for o, k in pending])
            return d12, d21
        return np.concatenate([np.asarray(o[:k]) for o, k in pending])

    def _fine_direction(self, up_src, up_tgt, ij_src, ij_tgt):
        """Asymmetric 3x3-grid pass at octave -1 (reference: refinement.py:145-156).
        Returns (N, 3, 3, 2)."""
        offsets = _grid_offsets(octave=-1.0)  # +-16 px on the 2x image
        n = ij_src.shape[0]
        all_src = (ij_src[:, None] + offsets[None]).reshape(-1, 2)
        all_tgt = (ij_tgt[:, None] + offsets[None]).reshape(-1, 2)
        disp = self._run_chunked(up_src, up_tgt, all_src, all_tgt, sym=False)
        return disp.reshape(n, 3, 3, 2)

    def refine_matches_async(
        self,
        image1,
        keypoints1: np.ndarray,
        image2,
        keypoints2: np.ndarray,
        matches: np.ndarray,
    ):
        """Dispatch coarse-to-fine refinement without synchronizing.

        Returns an opaque handle; resolve with :meth:`resolve_refined`.
        Dispatches from consecutive calls pipeline through the device, so a
        caller walking many pairs keeps the chip busy (match_graph's
        3-deep pipeline; the reference synchronizes per batch,
        refinement.py:57-58).  ``image1``/``image2`` may be raw arrays or
        :class:`PreparedImage` handles.
        """
        if matches.shape[0] == 0:
            z = np.zeros((0, 3, 3, 2), dtype=np.float32)
            return ("ready", (z, z))

        ij1 = keypoints1[matches[:, 0]][:, [1, 0]].astype(np.float64)
        ij2 = keypoints2[matches[:, 1]][:, [1, 0]].astype(np.float64)

        prep1 = prepare_image(image1)
        prep2 = prepare_image(image2)
        d_img1, d_up1 = prep1.base, prep1.up
        d_img2, d_up2 = prep2.base, prep2.up

        # When a test injects a custom patch CNN, keep the chunked path so
        # the injected model drives both stages (synchronous).
        if self._patch_cnn is not self._patch_cnn_original:
            coarse12, coarse21 = self._run_chunked(d_img1, d_img2, ij1, ij2, sym=True)
            fine12 = self._fine_direction(
                d_up1, d_up2, 2.0 * ij1, 2.0 * (ij2 + coarse12 * DISPLACEMENT_UNIT_PX)
            )
            fine21 = self._fine_direction(
                d_up2, d_up1, 2.0 * ij2, 2.0 * (ij1 + coarse21 * DISPLACEMENT_UNIT_PX)
            )
            grid12 = coarse12[:, None, None] + 0.5 * fine12
            grid21 = coarse21[:, None, None] + 0.5 * fine21
            return ("ready", (grid12.astype(np.float32), grid21.astype(np.float32)))

        # Fully fused path: one device program per match chunk runs the
        # coarse pass and both 9-offset fine directions.
        up1_arr, up2_arr = _harmonize(d_up1, d_up2)
        n = ij1.shape[0]
        bs = self.batch_size
        parts = []
        for start in range(0, n, bs):

            def _pad(x):
                chunk = x[start : start + bs]
                pad = bs - chunk.shape[0]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                    )
                return jnp.asarray(chunk, jnp.float32)

            out12, out21 = self._refine_full(
                self.variables,
                d_img1.array,
                d_img2.array,
                up1_arr,
                up2_arr,
                _pad(ij1),
                _pad(ij2),
                jnp.float32(d_img1.offset),
                jnp.float32(d_img2.offset),
                jnp.float32(d_up1.offset),
                jnp.float32(d_up2.offset),
            )
            parts.append((out12, out21, min(bs, n - start)))
        return ("parts", parts)

    @staticmethod
    def resolve_refined(handle) -> Tuple[np.ndarray, np.ndarray]:
        """Resolve a :meth:`refine_matches_async` handle -> (grid12, grid21)."""
        kind, payload = handle
        if kind == "ready":
            return payload
        grid12 = np.concatenate([np.asarray(o[:k]) for o, _, k in payload])
        grid21 = np.concatenate([np.asarray(o[:k]) for _, o, k in payload])
        return grid12.astype(np.float32), grid21.astype(np.float32)

    def refine_matches(
        self,
        image1,
        keypoints1: np.ndarray,
        image2,
        keypoints2: np.ndarray,
        matches: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Coarse-to-fine refinement of matched keypoints
        (reference: refinement.py:122-185, symmetric grid mode).

        Args:
          image1/image2: (H, W, 3) uint8 RGB, already downscaled by fact —
            or :class:`PreparedImage` handles.
          keypoints1/keypoints2: (K, >=2) with x, y columns at this scale.
          matches: (N, 2) indices into the keypoint arrays.

        Returns (grid12, grid21): (N, 3, 3, 2) flow grids in displacement
        units (1 unit = 16 px), sampled at +-8 px around the source keypoint.
        """
        return self.resolve_refined(
            self.refine_matches_async(image1, keypoints1, image2, keypoints2, matches)
        )
