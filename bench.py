"""Benchmark: two-view refinement throughput (the reference's hot loop #1).

Measures end-to-end coarse-to-fine match refinement — patch extraction +
symmetric coarse CNN + 2x9-grid fine CNN passes — in matches/second on the
available accelerator, and compares against the reference implementation's
throughput on this host's CPU (the reference is CUDA/torch; torch-cpu is
its only runnable form here; see tests/test_panet.py's oracle).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Reference-equivalent torch implementation, same per-match workload
#: (coarse sym + 2x9-grid fine passes, batch 1024), measured on this host's
#: 4-core CPU with scripts/bench_torch_baseline.py (5.71 matches/s).
TORCH_CPU_MATCHES_PER_S = 5.71

N_MATCHES = 1024


def main() -> None:
    import jax

    cache_dir = os.path.expanduser("~/.cache/lfr_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from lfr_tpu.pipelines.refinement import TwoViewRefiner
    from lfr_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    image1, image2 = synthetic.shifted_pair(rng, 480, 640, (3, -2))
    kps1, _ = synthetic.planted_features(rng, N_MATCHES, 480, 640)
    kps2 = kps1 + np.array([2.0, -3.0])
    matches = np.stack([np.arange(N_MATCHES), np.arange(N_MATCHES)], axis=1)

    refiner = TwoViewRefiner(batch_size=1024)

    # Warm-up (compiles coarse + fine programs).
    refiner.refine_matches(image1, kps1, image2, kps2, matches)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        g12, g21 = refiner.refine_matches(image1, kps1, image2, kps2, matches)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    assert np.isfinite(g12).all() and np.isfinite(g21).all()

    value = N_MATCHES / best
    print(
        json.dumps(
            {
                "metric": "two_view_refinement_throughput",
                "value": round(value, 2),
                "unit": "matches/s",
                "vs_baseline": round(value / TORCH_CPU_MATCHES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
