"""Self-supervised training harness for the patch-alignment flow CNN.

The reference never released training code or its checkpoint
(reference: README.md:200 "Training data and scripts" unchecked;
two-view-refinement/checkpoint.pth is a missing blob), so the framework
trains its own weights: reference/target patch pairs are sampled from
images with a *known* sub-pixel displacement between their centers plus
photometric jitter, and the network regresses that displacement (in
16-px units), with an optional symmetry term tying the two directions —
the warped-patch objective of the underlying paper.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DISPLACEMENT_UNIT_PX
from ..utils import synthetic
from . import panet


import flax.struct


@flax.struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: int


def create_train_state(
    rng: jax.Array, learning_rate: float = 1e-3, compute_dtype=jnp.bfloat16
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = panet.init_params(rng, compute_dtype)
    tx = optax.adam(learning_rate)
    return (
        TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=0,
        ),
        tx,
    )


def make_train_step(tx: optax.GradientTransformation, compute_dtype=jnp.bfloat16):
    """Jittable train step: (state, ref, tgt, delta_units) -> (state, loss).

    ``delta_units``: (B, 2) ground-truth displacement of the target patch
    center relative to the reference, in displacement units (16 px).
    """
    model = panet.PANet(compute_dtype)

    def loss_fn(params, batch_stats, ref, tgt, delta):
        variables = {"params": params, "batch_stats": batch_stats}
        (d12, d21), new_model_state = model.apply(
            variables,
            panet.normalize_patches(ref),
            panet.normalize_patches(tgt),
            train=True,
            method=panet.PANet.forward_sym,
            mutable=["batch_stats"],
        )
        # The target patch is sampled at center + delta, so its content sits
        # at -delta relative to the reference: the alignment displacement
        # the pipeline applies to the *target keypoint*
        # (reference: refinement.py:147 `ij2 + coarse12 * 16`) is -delta,
        # and +delta in the reverse direction.
        main = jnp.mean(jnp.sum((d12 + delta) ** 2, axis=-1))
        main += jnp.mean(jnp.sum((d21 - delta) ** 2, axis=-1))
        # Symmetry consistency: the two directions should be opposite.
        sym = jnp.mean(jnp.sum((d12 + d21) ** 2, axis=-1))
        loss = main + 0.1 * sym
        return loss, new_model_state["batch_stats"]

    def train_step(state: TrainState, ref, tgt, delta):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, ref, tgt, delta
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            loss,
        )

    return train_step


def make_train_chunk(tx: optax.GradientTransformation, compute_dtype=jnp.bfloat16):
    """Jittable K-step chunk: scans the train step over stacked batches
    (K, B, ...) in ONE device program — on a tunneled TPU each dispatch
    pays a network round trip, so per-step dispatch dominates wall time."""
    train_step = make_train_step(tx, compute_dtype)

    def chunk_fn(state: TrainState, ref_all, tgt_all, delta_all):
        def body(st, xs):
            r, t, d = xs
            st2, loss = train_step(st, r, t, d)
            return st2, loss

        return jax.lax.scan(body, state, (ref_all, tgt_all, delta_all))

    return chunk_fn


# ---------------------------------------------------------------------------
# Data generation
# ---------------------------------------------------------------------------


def _np_sample_bilinear(img: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Host-side bilinear sampling: img (H, W, C) at (i, j) coords (..., 2).

    Training centers carry a margin larger than any warp+displacement
    reach, so coordinates are in-bounds and simple clamping matches
    ops.patches.sample_bilinear exactly.  Keeping the sampler on the host
    avoids one tiny device program per (image, batch-slice) pair — the
    device round-trips made batch sampling ~30 s/batch; this is ~ms.
    """
    h, w = img.shape[:2]
    i = np.clip(coords[..., 0], 0.0, h - 1.0)
    j = np.clip(coords[..., 1], 0.0, w - 1.0)
    i0 = np.floor(i).astype(np.int32)
    j0 = np.floor(j).astype(np.int32)
    i0 = np.minimum(i0, h - 2)
    j0 = np.minimum(j0, w - 2)
    di = (i - i0)[..., None]
    dj = (j - j0)[..., None]
    v00 = img[i0, j0]
    v01 = img[i0, j0 + 1]
    v10 = img[i0 + 1, j0]
    v11 = img[i0 + 1, j0 + 1]
    return (
        v00 * (1 - di) * (1 - dj)
        + v01 * (1 - di) * dj
        + v10 * di * (1 - dj)
        + v11 * di * dj
    )


def sample_batch(
    rng: np.random.Generator,
    images: list,
    batch_size: int,
    max_disp_px: float = 8.0,
    jitter: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample (ref, tgt, delta_units) patch pairs from host images.

    The target patch is the same content re-sampled at center + delta px,
    so the network's task is exactly the two-view alignment problem.
    """
    from ..config import PATCH_SIZE
    from ..ops.patches import patch_offsets

    # Margin covers patch half-extent + max displacement (derived, not
    # hardcoded — a caller-supplied max_disp_px larger than the default
    # must still leave the host sampler in-bounds, clamping would
    # silently corrupt the labels).
    margin = float(np.ceil(PATCH_SIZE / 2.0 + max_disp_px)) + 1.0
    usable = [im for im in images if min(im.shape[:2]) > 2 * margin]
    if not usable:
        raise ValueError(
            f"no training image exceeds the minimum size of "
            f"{int(2 * margin) + 1}px per side required for "
            f"patch_size={PATCH_SIZE}, max_disp_px={max_disp_px}"
        )
    # Quota spreads over USABLE images only, so the batch stays full even
    # when some images were skipped for being too small.
    per_image = max(1, -(-batch_size // len(usable)))
    refs, tgts, deltas = [], [], []
    remaining = batch_size
    for img in usable:
        n = min(per_image, remaining)
        if n <= 0:
            break
        h, w = img.shape[:2]
        centers = np.stack(
            [rng.uniform(margin, h - margin, n), rng.uniform(margin, w - margin, n)],
            axis=1,
        )
        delta_px = rng.uniform(-max_disp_px, max_disp_px, (n, 2))
        offs = np.asarray(patch_offsets(PATCH_SIZE))
        ref = _np_sample_bilinear(img, centers[:, None, None, :] + offs[None])
        tgt = _np_sample_bilinear(
            img, (centers + delta_px)[:, None, None, :] + offs[None]
        )
        # Photometric jitter on the target (brightness/contrast).
        scale = 1.0 + rng.uniform(-jitter, jitter, (n, 1, 1, 1))
        shift = rng.uniform(-jitter, jitter, (n, 1, 1, 1)) * 255.0
        tgt = np.clip(tgt * scale + shift, 0, 255)
        refs.append(ref)
        tgts.append(tgt)
        deltas.append(delta_px / DISPLACEMENT_UNIT_PX)
        remaining -= n
    ref = np.concatenate(refs)[:batch_size]
    tgt = np.concatenate(tgts)[:batch_size]
    delta = np.concatenate(deltas)[:batch_size]
    return ref.astype(np.float32), tgt.astype(np.float32), delta.astype(np.float32)


def sample_batch_warped(
    rng: np.random.Generator,
    images: list,
    batch_size: int,
    max_disp_px: float = 8.0,
    jitter: float = 0.15,
    max_rot: float = 0.25,
    scale_range: Tuple[float, float] = (0.85, 1.18),
    noise: float = 4.0,
    occlusion_prob: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Warped-patch pairs: the target is the same content re-sampled at
    center + delta through a random similarity warp (rotation + scale)
    plus photometric jitter and sensor noise — the conditions two views of
    a real scene impose on the alignment CNN (reference patches at
    inference are axis-aligned crops of *different photos*,
    two-view-refinement/refinement.py:23-43).

    The warp is centered on the displaced content, so the ground-truth
    alignment label stays -delta exactly as in :func:`sample_batch`.

    ``occlusion_prob``: probability of overwriting a random half-plane of
    the target patch with content from a DIFFERENT image — a depth
    discontinuity seen from a second viewpoint, where the far side of an
    occlusion edge moves independently.  The label stays the foreground
    displacement: the network must align on the consistent part.
    """
    from ..config import PATCH_SIZE
    from ..ops.patches import patch_offsets, sample_bilinear

    offs = np.asarray(patch_offsets(PATCH_SIZE))  # (ps, ps, 2)
    # Margin covers the rotated+scaled patch half-extent plus the max
    # displacement (derived from the actual arguments so larger warps or
    # displacements never silently clamp at image edges): a rotation by
    # up to max_rot scales the per-axis offset reach by cos+|sin|.
    half = PATCH_SIZE / 2.0
    reach = half * scale_range[1] * (np.cos(max_rot) + abs(np.sin(max_rot)))
    margin = float(np.ceil(reach + max_disp_px)) + 2.0
    refs, tgts, deltas = [], [], []
    remaining = batch_size
    img_ids = rng.integers(0, len(images), batch_size)
    for i in np.unique(img_ids):
        n = int((img_ids == i).sum())
        if n <= 0:
            continue
        img = images[i]
        h, w = img.shape[:2]
        if h <= 2 * margin or w <= 2 * margin:
            img_ids[img_ids == i] = rng.integers(0, len(images))
            continue
        centers = np.stack(
            [rng.uniform(margin, h - margin, n), rng.uniform(margin, w - margin, n)],
            axis=1,
        )
        delta_px = rng.uniform(-max_disp_px, max_disp_px, (n, 2))
        theta = rng.uniform(-max_rot, max_rot, n)
        scale = rng.uniform(scale_range[0], scale_range[1], n)
        ca, sa = np.cos(theta) * scale, np.sin(theta) * scale
        # (n, 2, 2) rotation+scale acting on (di, dj) offsets.
        M = np.stack(
            [np.stack([ca, -sa], -1), np.stack([sa, ca], -1)], axis=1
        )

        ref_coords = centers[:, None, None, :] + offs[None]
        tgt_coords = (
            (centers + delta_px)[:, None, None, :]
            + np.einsum("nab,ijb->nija", M, offs)
        )
        ref = _np_sample_bilinear(img, ref_coords)
        tgt = _np_sample_bilinear(img, tgt_coords)
        # Photometric: per-sample gain/bias + gamma + gaussian noise.
        gain = 1.0 + rng.uniform(-jitter, jitter, (n, 1, 1, 1))
        bias = rng.uniform(-jitter, jitter, (n, 1, 1, 1)) * 255.0
        gamma = np.exp(rng.uniform(-0.15, 0.15, (n, 1, 1, 1)))
        tgt = np.clip(tgt * gain + bias, 0, 255)
        tgt = 255.0 * (tgt / 255.0) ** gamma
        tgt = np.clip(tgt + rng.normal(0, noise, tgt.shape), 0, 255)
        if occlusion_prob > 0.0:
            tgt = _occlude_half_plane(rng, tgt, images, occlusion_prob)
        refs.append(ref)
        tgts.append(tgt)
        deltas.append(delta_px / DISPLACEMENT_UNIT_PX)
        remaining -= n
    ref = np.concatenate(refs)[:batch_size]
    tgt = np.concatenate(tgts)[:batch_size]
    delta = np.concatenate(deltas)[:batch_size]
    return ref.astype(np.float32), tgt.astype(np.float32), delta.astype(np.float32)


def _occlude_half_plane(
    rng: np.random.Generator,
    tgt: np.ndarray,
    images: list,
    prob: float,
    min_offset: float = 4.0,
) -> np.ndarray:
    """Overwrite a random half-plane of some target patches with a crop
    from another image (occlusion augmentation; see sample_batch_warped).

    The dividing line passes at >= min_offset px from the patch center so
    the keypoint itself stays on the foreground surface."""
    n, ps = tgt.shape[0], tgt.shape[1]
    hit = rng.random(n) < prob
    if not hit.any():
        return tgt
    ii, jj = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
    ii = ii - (ps - 1) / 2.0
    jj = jj - (ps - 1) / 2.0
    out = tgt.copy()
    for k in np.flatnonzero(hit):
        theta = rng.uniform(0, 2 * np.pi)
        offset = rng.uniform(min_offset, ps / 2.0)
        mask = ii * np.cos(theta) + jj * np.sin(theta) > offset
        src = images[rng.integers(0, len(images))]
        h, w = src.shape[:2]
        if h <= ps or w <= ps:
            continue
        r0 = rng.integers(0, h - ps)
        c0 = rng.integers(0, w - ps)
        out[k][mask] = src[r0 : r0 + ps, c0 : c0 + ps][mask]
    return out


def synthetic_images(rng: np.random.Generator, count: int = 8, h: int = 256, w: int = 256):
    return [synthetic.textured_image(rng, h, w).astype(np.float32) for _ in range(count)]


#: Photos excluded from the "real" training corpus by default: every image
#: the accuracy A/B (scripts/ab_realistic.py) renders evaluation scenes
#: from, so the headline refined-vs-raw numbers are leak-free (the
#: reference's protocol evaluates on held-out scenes,
#: reference: README.md:104-115).
DEFAULT_HOLDOUT = ("china", "flower", "grace_hopper")


def train(
    num_steps: int = 1000,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    image_dir: Optional[str] = None,
    corpus: str = "synthetic",
    warp: bool = False,
    seed: int = 0,
    log_every: int = 50,
    eval_every: int = 500,
    compute_dtype=jnp.bfloat16,
    checkpoint_path: Optional[str] = None,
    holdout: Tuple[str, ...] = DEFAULT_HOLDOUT,
    occlusion_prob: float = 0.0,
) -> dict:
    """Train PANet; returns final variables {params, batch_stats}.

    ``corpus``: "synthetic" (random textures), "real" (locally bundled real
    photos/textures, see utils.corpus), or use ``image_dir``.
    ``warp``: sample targets through random similarity warps + noise
    (recommended with real images).
    ``holdout``: path substrings excluded from the "real" corpus; the
    held-out photos form the validation set.
    ``occlusion_prob``: occlusion augmentation rate (warp mode only).
    """
    rng = np.random.default_rng(seed)
    # Cosine-decayed Adam with warmup for the long real-image runs.
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, min(200, num_steps // 10 + 1), num_steps, learning_rate * 0.02
    )
    variables = panet.init_params(jax.random.PRNGKey(seed), compute_dtype)
    tx = optax.adam(schedule)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=0,
    )

    val_images = None
    if image_dir is not None:
        import os

        from ..io.images import load_image_rgb

        images = []
        for name in sorted(os.listdir(image_dir))[:64]:
            try:
                images.append(load_image_rgb(os.path.join(image_dir, name)).astype(np.float32))
            except Exception:
                continue
    elif corpus == "real":
        import os

        import cv2

        from ..utils.corpus import discover_local_images, load_corpus

        # Every held-out photo is excluded from training and forms the
        # validation set (leak-free: the A/B scenes render from these).
        images = load_corpus(exclude=list(holdout))
        val_paths = [
            p
            for p in discover_local_images(include_textures=False)
            if any(h in p for h in holdout)
        ]
        val_images = []
        for p in val_paths:
            img = cv2.imread(p)
            if img is not None:
                val_images.append(
                    cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
                )
        val_images = val_images or None
        if not images:
            raise RuntimeError("no local real images found; use corpus='synthetic'")
        # Procedural diversity (training only, never validation): fractal
        # noise, natural 1/f^alpha spectra, Voronoi mosaics, dense text —
        # families the bundled assets are thin on.  The reference CNN was
        # trained on broad real-scene data (reference: model.py:43); with
        # no network egress this is the widest corpus reachable here.
        from ..utils.corpus import procedural_textures

        n_real = len(images)
        images = images + procedural_textures(rng, count=max(16, n_real // 2))
        print(
            f"[train] real corpus: {n_real} bundled + {len(images) - n_real} "
            f"procedural images, held out for validation: "
            f"{[os.path.basename(p) for p in val_paths]}",
            flush=True,
        )
    else:
        images = synthetic_images(rng)

    if warp:
        import functools

        sampler = functools.partial(sample_batch_warped, occlusion_prob=occlusion_prob)
    else:
        sampler = sample_batch
    val_batch = None
    val_batch_occ = None
    if val_images:
        val_rng = np.random.default_rng(12345)
        val_batch = sample_batch_warped(val_rng, val_images, 256)
        # Occlusion-bearing validation: half the targets carry a foreign
        # half-plane, probing robustness at depth discontinuities.
        val_batch_occ = sample_batch_warped(
            val_rng, val_images, 256, occlusion_prob=0.5
        )

    best_val = float("inf")
    result = None

    def snapshot():
        return {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
        }

    # Run K steps per dispatch: one stacked host->device transfer and one
    # lax.scan'd program per chunk.  On a tunneled TPU both the transfer
    # and every dispatch pay a network round trip (~1 s/step at K=1).
    chunk = 16
    chunk_fn = jax.jit(make_train_chunk(tx, compute_dtype))
    step = 0
    while step < num_steps:
        k = min(chunk, num_steps - step)
        batches = [sampler(rng, images, batch_size) for _ in range(k)]
        ref_all = jnp.asarray(np.stack([b[0] for b in batches]))
        tgt_all = jnp.asarray(np.stack([b[1] for b in batches]))
        delta_all = jnp.asarray(np.stack([b[2] for b in batches]))
        state, losses = chunk_fn(state, ref_all, tgt_all, delta_all)
        losses_np = np.asarray(losses)
        # Print the loss at each crossed log_every boundary from the
        # per-step losses the scan returns, so log_every < chunk keeps its
        # granularity (and step 1 prints on the first chunk).
        if log_every:
            for s in range(step + 1, step + k + 1):
                if s == 1 or s % log_every == 0:
                    print(
                        f"[train] step {s} loss {float(losses_np[s - step - 1]):.5f}",
                        flush=True,
                    )
        step += k
        # Eval fires on chunk-boundary crossings: its granularity is
        # floor-ed to the chunk size (evaluating mid-chunk would require
        # splitting the scan; not worth it for a periodic validation probe).
        if val_batch is not None and eval_every and (step - k) // eval_every != step // eval_every:
            err = evaluate_px_error(
                {"params": state.params, "batch_stats": state.batch_stats},
                val_batch,
                compute_dtype,
            )
            err_occ = evaluate_px_error(
                {"params": state.params, "batch_stats": state.batch_stats},
                val_batch_occ,
                compute_dtype,
            )
            print(
                f"[train] step {step} val error {err:.3f} px "
                f"(occlusion {err_occ:.3f} px)",
                flush=True,
            )
            if err < best_val:
                best_val = err
                result = snapshot()
                if checkpoint_path:
                    from .checkpoint import save_variables

                    save_variables(checkpoint_path, result)
                    print(f"[train] saved best ({err:.3f} px) -> {checkpoint_path}", flush=True)

    return result if result is not None else snapshot()


def evaluate_px_error(variables, batch, compute_dtype=jnp.bfloat16) -> float:
    """Mean alignment error in px of d12 against the known displacement."""
    model = panet.PANet(compute_dtype)
    ref, tgt, delta = batch
    d12 = []
    for s in range(0, ref.shape[0], 128):
        out = model.apply(
            variables,
            panet.normalize_patches(jnp.asarray(ref[s : s + 128])),
            panet.normalize_patches(jnp.asarray(tgt[s : s + 128])),
        )
        d12.append(np.asarray(out))
    d12 = np.concatenate(d12)
    err = np.linalg.norm((d12 + delta) * DISPLACEMENT_UNIT_PX, axis=-1)
    return float(err.mean())


def main(argv=None) -> None:
    """Training CLI: writes a framework checkpoint."""
    import argparse

    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="train the patch-alignment flow CNN")
    parser.add_argument("--num_steps", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--image_dir", default=None, help="real images (default: synthetic textures)")
    parser.add_argument(
        "--corpus",
        default="synthetic",
        choices=["synthetic", "real"],
        help="'real' uses locally bundled photos/textures (utils.corpus)",
    )
    parser.add_argument("--warp", action="store_true", help="similarity-warped targets + noise")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", required=True, help="checkpoint path (.msgpack)")
    parser.add_argument(
        "--holdout",
        nargs="*",
        default=list(DEFAULT_HOLDOUT),
        help="path substrings excluded from the real corpus (validation set)",
    )
    parser.add_argument(
        "--occlusion_prob",
        type=float,
        default=0.0,
        help="occlusion-augmentation rate for warped sampling",
    )
    args = parser.parse_args(argv)

    variables = train(
        num_steps=args.num_steps,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        image_dir=args.image_dir,
        corpus=args.corpus,
        warp=args.warp,
        seed=args.seed,
        checkpoint_path=args.output,
        holdout=tuple(args.holdout),
        occlusion_prob=args.occlusion_prob,
    )
    from .checkpoint import save_variables

    save_variables(args.output, variables)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
