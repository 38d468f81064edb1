"""Stage-level roofline profiling of the two-view refinement hot path.

Times each compute stage of the coarse-to-fine refinement pipeline on the
available accelerator and reports achieved TFLOP/s against the chip's bf16
peak, to locate where the MFU goes (reference hot loop being replaced:
/root/reference/two-view-refinement/refinement.py:46-73).

Usage: python scripts/profile_stages.py [--batch 1024] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfr_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from lfr_tpu.models import panet

#: v5e bf16 peak (TFLOP/s per chip).
V5E_BF16_PEAK = 197.0


def conv_flops(h, w, kh, kw, cin, cout):
    return h * w * kh * kw * cin * cout * 2


def backbone_flops_per_patch():
    f = conv_flops(33, 33, 3, 3, 3, 64)
    f += conv_flops(33, 33, 3, 3, 64, 64)
    f += conv_flops(17, 17, 3, 3, 64, 128)
    f += conv_flops(17, 17, 3, 3, 128, 128)
    return f


def head_flops_per_sample():
    f = conv_flops(13, 13, 5, 5, 289, 128)
    f += conv_flops(9, 9, 5, 5, 128, 128)
    f += conv_flops(5, 5, 5, 5, 128, 64)
    f += conv_flops(1, 1, 5, 5, 64, 64)
    f += 64 * 2 * 2  # predict linear
    return f


def corr_flops_per_pair(pos=289, c=128):
    return pos * pos * c * 2


def match_flops():
    """Total FLOPs per refined match: coarse sym + 18 asym fine passes."""
    bb = backbone_flops_per_patch()
    hd = head_flops_per_sample()
    cr = corr_flops_per_pair()
    coarse = 2 * bb + cr + 2 * hd
    fine = 18 * (2 * bb + cr + hd)
    return coarse + fine


def _sync(out):
    """Force execution completion with a host transfer: through the axon
    relay, block_until_ready can return before the program finishes, so a
    tiny device->host readback is the only reliable fence."""
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(jnp.sum(x.astype(jnp.float32))) for x in leaves]


def timeit(fn, *args, reps=20):
    _sync(fn(*args))  # warm-up / compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    # Device execution is stream-ordered: syncing the last dispatch fences
    # all of them; per-dispatch host overhead amortizes across reps.
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    b = args.batch

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)

    model = panet.PANet()
    variables = panet.init_params(jax.random.PRNGKey(0))
    results = {}

    def record(name, secs, flops):
        tf = flops / secs / 1e12
        results[name] = {
            "ms": round(secs * 1e3, 3),
            "tflops": round(tf, 2),
            "pct_peak": round(100 * tf / V5E_BF16_PEAK, 1),
        }
        print(f"{name:24s} {secs*1e3:9.3f} ms  {tf:7.2f} TFLOP/s  "
              f"{100 * tf / V5E_BF16_PEAK:5.1f}% of bf16 peak", flush=True)

    rng = np.random.default_rng(0)

    # --- backbone on 2b patches (what one sym pass sees) ------------------
    patches = jnp.asarray(rng.standard_normal((2 * b, 33, 33, 3)), jnp.float32)

    @jax.jit
    def run_backbone(v, p):
        return model.apply(v, p, method=lambda m, x: m.features(x))

    t = timeit(run_backbone, variables, patches)
    record("backbone(2B)", t, 2 * b * backbone_flops_per_patch())

    # --- correlation einsum ----------------------------------------------
    feats = jnp.asarray(
        rng.standard_normal((b, 289, 128)), jnp.bfloat16
    )

    @jax.jit
    def run_corr(f):
        c = jnp.einsum("bpc,bqc->bpq", f, f, preferred_element_type=jnp.float32)
        c12 = panet._l2_normalize(jax.nn.relu(c), axis=-1)
        c21 = panet._l2_normalize(jax.nn.relu(jnp.swapaxes(c, 1, 2)), axis=-1)
        return c12, c21

    t = timeit(run_corr, feats)
    record("corr_einsum(B)", t, b * corr_flops_per_pair())

    # --- correlation pallas ----------------------------------------------
    if dev.platform not in ("cpu",):
        from lfr_tpu.ops.correlation import correlation_pallas

        try:
            t = timeit(correlation_pallas, feats, feats)
            record("corr_pallas(B,289)", t, b * corr_flops_per_pair())
        except Exception as e:  # pragma: no cover
            print(f"corr_pallas failed: {type(e).__name__}: {e}", flush=True)

    # --- refine head on 2b corr maps -------------------------------------
    corr_in = jnp.asarray(rng.standard_normal((2 * b, 17, 17, 289)), jnp.float32)

    @jax.jit
    def run_head(v, c):
        return model.apply(v, c, False, method=lambda m, x, t: m._head(x, t))

    t = timeit(run_head, variables, corr_in)
    record("head(2B)", t, 2 * b * head_flops_per_sample())

    # --- patch extraction (separable) ------------------------------------
    from lfr_tpu.ops.patches import extract_patches_separable

    img = jnp.asarray(rng.random((1024, 1280, 3)), jnp.float32)
    centers = jnp.asarray(
        rng.uniform(100, 900, size=(2 * b, 2)), jnp.float32
    )

    @jax.jit
    def run_extract(im, c):
        return extract_patches_separable(im, c)

    t = timeit(run_extract, img, centers)
    # Nominal flops: two (33,37)x(37,37) matmuls x3 channels per patch.
    ext_flops = 2 * b * 3 * (33 * 37 * 37 + 33 * 33 * 37) * 2
    record("extract(2B)", t, ext_flops)

    # --- whole asym forward (what one fine scan step runs) ----------------
    ref_p = jnp.asarray(rng.standard_normal((2 * b, 33, 33, 3)), jnp.float32)
    tgt_p = jnp.asarray(rng.standard_normal((2 * b, 33, 33, 3)), jnp.float32)

    @jax.jit
    def run_asym(v, a, c):
        return model.apply(v, a, c)

    t = timeit(run_asym, variables, ref_p, tgt_p)
    asym_flops = 2 * b * (2 * backbone_flops_per_patch() + head_flops_per_sample()) \
        + 2 * b * corr_flops_per_pair()
    record("asym_forward(2B)", t, asym_flops)

    # --- whole sym forward (the coarse pass) ------------------------------
    @jax.jit
    def run_sym(v, a, c):
        return model.apply(v, a, c, method=panet.PANet.forward_sym)

    t = timeit(run_sym, variables, ref_p[:b], tgt_p[:b])
    sym_flops = b * (2 * backbone_flops_per_patch() + 2 * head_flops_per_sample()) \
        + b * corr_flops_per_pair()
    record("sym_forward(B)", t, sym_flops)

    # --- 3x3-grid patch extraction (fine-pass front end) ------------------
    from lfr_tpu.ops.patches import extract_patch_grid_separable

    gcenters = jnp.asarray(rng.uniform(120, 800, size=(b, 2)), jnp.float32)

    @jax.jit
    def run_grid_extract(im, c):
        return extract_patch_grid_separable(im, c, 16)

    t = timeit(run_grid_extract, img, gcenters)
    grid_flops = b * 3 * (99 * 69 * 69 + 99 * 99 * 69) * 2
    record("grid_extract(B)", t, grid_flops)

    # --- full fused refinement program -----------------------------------
    from lfr_tpu.pipelines.refinement import TwoViewRefiner
    from lfr_tpu.utils import synthetic

    image1, image2 = synthetic.shifted_pair(rng, 480, 640, (3, -2))
    kps1, _ = synthetic.planted_features(rng, b, 480, 640)
    kps2 = kps1 + np.array([2.0, -3.0])
    matches = np.stack([np.arange(b), np.arange(b)], axis=1)
    refiner = TwoViewRefiner(variables=variables, batch_size=b)

    refiner.refine_matches(image1, kps1, image2, kps2, matches)  # warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        refiner.refine_matches(image1, kps1, image2, kps2, matches)
        best = min(best, time.perf_counter() - t0)
    record("refine_full(B)", best, b * match_flops())
    results["match_gflops"] = round(match_flops() / 1e9, 2)
    results["throughput_matches_per_s"] = round(b / best, 1)

    # Stage-sum sanity: coarse ~ backbone+corr+head, fine ~ 18x(asym).
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
