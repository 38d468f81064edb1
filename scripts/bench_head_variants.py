"""Microbenchmark alternative formulations of the refine head.

The refine head (four unpadded 5x5 convs 289->128->128->64->64 + BN + ReLU;
reference: two-view-refinement/model.py:24-37) carries ~55% of the FLOPs of
a crop-mode refined match and profiles at ~51% of bf16 peak
(scripts/profile_stages.py).  Two hypotheses for the gap:

  * BatchNorm in eval mode is a per-channel affine; folding it into the
    conv kernels removes four f32 elementwise stages and dtype bounces.
  * conv0's 289 input channels pad to 384 lanes on the MXU (~25% waste)
    when lowered as a spatial conv; an im2col matmul contracts over
    K = 5*5*289 = 7225, which pads negligibly.

Usage: python scripts/bench_head_variants.py [--batch 8192] [--json out]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lfr_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from lfr_tpu.models import panet

V5E_BF16_PEAK = 197.0


def head_flops(batch):
    def conv(h, w, kh, kw, cin, cout):
        return h * w * kh * kw * cin * cout * 2

    per = (
        conv(13, 13, 5, 5, 289, 128)
        + conv(9, 9, 5, 5, 128, 128)
        + conv(5, 5, 5, 5, 128, 64)
        + conv(1, 1, 5, 5, 64, 64)
    )
    return per * batch


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(jnp.sum(x.astype(jnp.float32))) for x in leaves]


def timeit(fn, *args, reps=30):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def fold_bn(params, stats, eps=1e-5):
    """Fold eval-mode BatchNorm affine into the preceding conv weights."""
    folded = {}
    for i in range(4):
        k = params[f"conv{i}"]["kernel"].astype(np.float32)
        b = params[f"conv{i}"]["bias"].astype(np.float32)
        bn = params[f"bn{i}"]
        s = bn["scale"] / np.sqrt(np.asarray(stats[f"bn{i}"]["var"]) + eps)
        folded[f"conv{i}"] = {
            "kernel": k * s,
            "bias": (b - np.asarray(stats[f"bn{i}"]["mean"])) * s + bn["bias"],
        }
    return folded


def head_flax(model, variables, corr):
    return model.apply(
        variables, corr, train=False, prenormalized=True, method=model._head
    )


def head_folded(folded, predict, corr):
    """Folded-BN conv head, all-bf16 with f32 bias add."""
    x = corr.astype(jnp.bfloat16)
    for i in range(4):
        k = folded[f"conv{i}"]["kernel"].astype(jnp.bfloat16)
        b = folded[f"conv{i}"]["bias"]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = jnp.maximum(x + b, 0.0).astype(jnp.bfloat16)
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    return x @ predict["kernel"] + predict["bias"]


def head_folded_im2col(folded, predict, corr):
    """Same, but conv0 as an explicit im2col matmul (K = 5*5*289)."""
    b = corr.shape[0]
    x = corr.astype(jnp.bfloat16)
    # im2col: (B,17,17,289) -> (B,13,13,5*5*289)
    cols = [
        x[:, di : di + 13, dj : dj + 13, :] for di in range(5) for dj in range(5)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * 13 * 13, 25 * 289)
    w0 = (
        folded["conv0"]["kernel"]
        .astype(jnp.bfloat16)
        .reshape(25 * 289, 128)
    )
    y = jnp.dot(patches, w0, preferred_element_type=jnp.float32)
    y = jnp.maximum(y + folded["conv0"]["bias"], 0.0).astype(jnp.bfloat16)
    x = y.reshape(b, 13, 13, 128)
    for i in range(1, 4):
        k = folded[f"conv{i}"]["kernel"].astype(jnp.bfloat16)
        bb = folded[f"conv{i}"]["bias"]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = jnp.maximum(x + bb, 0.0).astype(jnp.bfloat16)
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    return x @ predict["kernel"] + predict["bias"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # Match the real input distribution: correlations are ReLU'd and
    # L2-normalized over the 289 channels before entering the head.
    corr_np = np.abs(rng.standard_normal((args.batch, 17, 17, 289))).astype(np.float32)
    corr_np /= np.linalg.norm(corr_np, axis=-1, keepdims=True)
    corr = jnp.asarray(corr_np)

    from lfr_tpu.models.checkpoint import load_variables

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    variables = load_variables(os.path.join(here, "weights", "panet_real.msgpack"))
    model = panet.PANet()
    params = jax.tree_util.tree_map(np.asarray, variables["params"]["refine"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"]["refine"])
    predict = jax.tree_util.tree_map(np.asarray, variables["params"]["predict"])
    folded = fold_bn(params, stats)
    folded_dev = jax.tree_util.tree_map(jnp.asarray, folded)
    predict_dev = jax.tree_util.tree_map(jnp.asarray, predict)

    # The SHIPPED inference path: PANet(folded=True) with fold_bn_variables
    # output — what pipelines/refinement.py actually runs.
    model_folded = panet.PANet(folded=True)
    folded_vars = panet.fold_bn_variables(variables)
    f_shipped = jax.jit(functools.partial(head_flax, model_folded, folded_vars))

    f_flax = jax.jit(functools.partial(head_flax, model, variables))
    f_fold = jax.jit(functools.partial(head_folded, folded_dev, predict_dev))
    f_im2col = jax.jit(functools.partial(head_folded_im2col, folded_dev, predict_dev))

    ref = np.asarray(f_flax(corr))
    out_f = np.asarray(f_fold(corr))
    out_i = np.asarray(f_im2col(corr))
    out_s = np.asarray(f_shipped(corr))
    err_f = float(np.max(np.abs(out_f - ref)))
    err_i = float(np.max(np.abs(out_i - ref)))
    err_s = float(np.max(np.abs(out_s - ref)))

    fl = head_flops(args.batch)
    results = {}
    for name, fn in [
        ("flax_bn", f_flax),
        ("folded", f_fold),
        ("folded_im2col", f_im2col),
        ("panet_folded_shipped", f_shipped),
    ]:
        dt = timeit(fn, corr)
        tf = fl / dt / 1e12
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(tf, 2),
            "pct_peak": round(100 * tf / V5E_BF16_PEAK, 1),
        }
        print(f"{name:16s} {dt*1e3:9.3f} ms  {tf:7.2f} TFLOP/s  {100*tf/V5E_BF16_PEAK:5.1f}%")
    print(
        f"max |folded-flax| = {err_f:.3e}   max |im2col-flax| = {err_i:.3e}"
        f"   max |shipped-flax| = {err_s:.3e}"
    )
    results["max_abs_err"] = {"folded": err_f, "im2col": err_i, "shipped": err_s}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
