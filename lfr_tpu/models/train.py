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


def synthetic_images(rng: np.random.Generator, count: int = 8, h: int = 256, w: int = 256):
    return [synthetic.textured_image(rng, h, w).astype(np.float32) for _ in range(count)]


def train(
    num_steps: int = 1000,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    image_dir: Optional[str] = None,
    seed: int = 0,
    log_every: int = 50,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Train PANet; returns final variables {params, batch_stats}."""
    rng = np.random.default_rng(seed)
    state, tx = create_train_state(jax.random.PRNGKey(seed), learning_rate, compute_dtype)
    step_fn = jax.jit(make_train_step(tx, compute_dtype))

    if image_dir is not None:
        import os

        from ..io.images import load_image_rgb

        images = []
        for name in sorted(os.listdir(image_dir))[:64]:
            try:
                images.append(load_image_rgb(os.path.join(image_dir, name)).astype(np.float32))
            except Exception:
                continue
    else:
        images = synthetic_images(rng)

    for step in range(num_steps):
        ref, tgt, delta = sample_batch(rng, images, batch_size)
        state, loss = step_fn(state, jnp.asarray(ref), jnp.asarray(tgt), jnp.asarray(delta))
        if log_every and step % log_every == 0:
            print(f"[train] step {step} loss {float(loss):.5f}", flush=True)

    return {"params": state.params, "batch_stats": state.batch_stats}


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
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", required=True, help="checkpoint path (.msgpack)")
    args = parser.parse_args(argv)

    variables = train(
        num_steps=args.num_steps,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        image_dir=args.image_dir,
        seed=args.seed,
    )
    from .checkpoint import save_variables

    save_variables(args.output, variables)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
