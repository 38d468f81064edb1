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
from ..ops.patches import extract_patches
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


# ---------------------------------------------------------------------------
# Data generation
# ---------------------------------------------------------------------------


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
    per_image = max(1, batch_size // len(images))
    refs, tgts, deltas = [], [], []
    remaining = batch_size
    for img in images:
        n = min(per_image, remaining)
        if n <= 0:
            break
        h, w = img.shape[:2]
        centers = np.stack(
            [rng.uniform(24, h - 24, n), rng.uniform(24, w - 24, n)], axis=1
        )
        delta_px = rng.uniform(-max_disp_px, max_disp_px, (n, 2))
        ref = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(centers)))
        tgt = np.asarray(
            extract_patches(jnp.asarray(img), jnp.asarray(centers + delta_px))
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
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Warped-patch pairs: the target is the same content re-sampled at
    center + delta through a random similarity warp (rotation + scale)
    plus photometric jitter and sensor noise — the conditions two views of
    a real scene impose on the alignment CNN (reference patches at
    inference are axis-aligned crops of *different photos*,
    two-view-refinement/refinement.py:23-43).

    The warp is centered on the displaced content, so the ground-truth
    alignment label stays -delta exactly as in :func:`sample_batch`.
    """
    from ..config import PATCH_SIZE
    from ..ops.patches import patch_offsets, sample_bilinear

    offs = np.asarray(patch_offsets(PATCH_SIZE))  # (ps, ps, 2)
    margin = 56  # covers patch half-extent * max scale + displacement
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
        import jax.numpy as jnp

        ref = np.asarray(sample_bilinear(jnp.asarray(img), jnp.asarray(ref_coords)))
        tgt = np.asarray(sample_bilinear(jnp.asarray(img), jnp.asarray(tgt_coords)))
        # Photometric: per-sample gain/bias + gamma + gaussian noise.
        gain = 1.0 + rng.uniform(-jitter, jitter, (n, 1, 1, 1))
        bias = rng.uniform(-jitter, jitter, (n, 1, 1, 1)) * 255.0
        gamma = np.exp(rng.uniform(-0.15, 0.15, (n, 1, 1, 1)))
        tgt = np.clip(tgt * gain + bias, 0, 255)
        tgt = 255.0 * (tgt / 255.0) ** gamma
        tgt = np.clip(tgt + rng.normal(0, noise, tgt.shape), 0, 255)
        refs.append(ref)
        tgts.append(tgt)
        deltas.append(delta_px / DISPLACEMENT_UNIT_PX)
        remaining -= n
    ref = np.concatenate(refs)[:batch_size]
    tgt = np.concatenate(tgts)[:batch_size]
    delta = np.concatenate(deltas)[:batch_size]
    return ref.astype(np.float32), tgt.astype(np.float32), delta.astype(np.float32)


def synthetic_images(rng: np.random.Generator, count: int = 8, h: int = 256, w: int = 256):
    return [synthetic.textured_image(rng, h, w).astype(np.float32) for _ in range(count)]


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
) -> dict:
    """Train PANet; returns final variables {params, batch_stats}.

    ``corpus``: "synthetic" (random textures), "real" (locally bundled real
    photos/textures, see utils.corpus), or use ``image_dir``.
    ``warp``: sample targets through random similarity warps + noise
    (recommended with real images).
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
    step_fn = jax.jit(make_train_step(tx, compute_dtype))

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
        from ..utils.corpus import load_corpus

        # Hold grace_hopper out for validation.
        images = load_corpus(exclude=["grace_hopper"])
        val_images = load_corpus(include_textures=False)
        val_images = [
            im for im in val_images if im.shape[0] == 600  # grace_hopper only
        ] or None
        if not images:
            raise RuntimeError("no local real images found; use corpus='synthetic'")
        print(f"[train] real corpus: {len(images)} images", flush=True)
    else:
        images = synthetic_images(rng)

    sampler = sample_batch_warped if warp else sample_batch
    val_batch = None
    if val_images:
        val_rng = np.random.default_rng(12345)
        val_batch = sample_batch_warped(val_rng, val_images, 256)

    best_val = float("inf")
    result = None

    def snapshot():
        return {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
        }

    for step in range(num_steps):
        ref, tgt, delta = sampler(rng, images, batch_size)
        state, loss = step_fn(state, jnp.asarray(ref), jnp.asarray(tgt), jnp.asarray(delta))
        if log_every and step % log_every == 0:
            print(f"[train] step {step} loss {float(loss):.5f}", flush=True)
        if val_batch is not None and eval_every and (step + 1) % eval_every == 0:
            err = evaluate_px_error(
                {"params": state.params, "batch_stats": state.batch_stats},
                val_batch,
                compute_dtype,
            )
            print(f"[train] step {step + 1} val error {err:.3f} px", flush=True)
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
    )
    from .checkpoint import save_variables

    save_variables(args.output, variables)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
