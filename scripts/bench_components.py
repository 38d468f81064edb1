"""Component per-call latency micro-benchmarks (matcher, patch sampling).

Note: on a tunneled TPU these measure host-visible dispatch+sync latency,
which the relay dominates; the fused end-to-end paths (bench.py,
bench_solver.py) pipeline dispatches and reflect real chip throughput.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from lfr_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lfr_tpu.ops import matchers
    from lfr_tpu.ops.patches import extract_patches_separable

    rng = np.random.default_rng(0)

    # MNN-ratio matching, 4096 x 4096 128-D descriptors.
    d1 = rng.standard_normal((4096, 128)).astype(np.float32)
    d2 = rng.standard_normal((4096, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    matchers.mnn_ratio_matcher(d1, d2)  # compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        matchers.mnn_ratio_matcher(d1, d2)
    dt = (time.perf_counter() - t0) / reps
    print(f"mnn_ratio 4096x4096x128 per-call latency: {dt*1e3:.1f} ms")

    # Patch extraction, 8192 patches from a 768x1024 padded image.
    img = jnp.asarray(rng.random((768, 1024, 3)).astype(np.float32))
    ij = jnp.asarray(rng.uniform(100, 600, (8192, 2)).astype(np.float32))
    ext = jax.jit(lambda im, ij: extract_patches_separable(im, ij))
    ext(img, ij).block_until_ready()
    t0 = time.perf_counter()
    outs = [ext(img, ij) for _ in range(20)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 20
    print(f"patch extraction 8192x33x33 per-dispatch latency: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
