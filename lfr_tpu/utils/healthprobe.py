"""Device/link health probe: attribute wall-clock variance to the
environment, not the pipeline.

End-to-end stage timings through the remote TPU link vary run-to-run by
up to ~27x (results/e2e_scale_100cam_r03.json: sift_extract 9.8 s median
vs a 287 s outlier in the same process) — far beyond anything the
pipeline itself does differently between identical repeats.  To make
benchmark reports self-diagnosing, ``probe()`` times two fixed
micro-operations whose cost is invariant to the workload:

  * ``roundtrip_ms`` — a 4-byte device->host transfer (pure link latency);
  * ``matmul_ms``    — a fixed 1024^3 bf16 matmul incl. sync (device
                       compute + dispatch).

Benchmark drivers snapshot the probe before each stage repeat; a stage
outlier whose surrounding probes also balloon is an environment stall
(tunnel hiccup, host contention), while an outlier with steady probes
would implicate the pipeline.  Reference analog: the solver prints
per-stage wall-clock for the same diagnostic purpose (solve.cc:585-589).
"""

from __future__ import annotations

import time

_probe_state = {}


def probe() -> dict:
    """~15 ms health snapshot: {"roundtrip_ms", "matmul_ms"}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    st = _probe_state
    if "x" not in st:
        st["x"] = jnp.zeros((1024, 1024), jnp.bfloat16) + 0.5
        st["mm"] = jax.jit(
            lambda a: jnp.sum(
                jax.lax.dot(a, a, preferred_element_type=jnp.float32)
            )
        )
        np.asarray(st["mm"](st["x"]))  # compile outside the timed region
        st["n"] = 0

    # Fresh scalar each call: a reused array caches its host value after
    # the first transfer and would time a dict lookup, not the link.
    st["n"] += 1
    t0 = time.perf_counter()
    np.asarray(jnp.full((), st["n"], jnp.float32))
    roundtrip_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    np.asarray(st["mm"](st["x"]))
    matmul_ms = (time.perf_counter() - t0) * 1e3
    out = {
        "roundtrip_ms": round(roundtrip_ms, 2),
        "matmul_ms": round(matmul_ms, 2),
    }
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "largest_free_block_bytes"):
            if k in stats:
                out[k.replace("bytes_in_use", "mb_in_use").replace("_bytes", "_mb")] = round(
                    stats[k] / 1e6, 1
                )
    except Exception:
        pass
    return out
