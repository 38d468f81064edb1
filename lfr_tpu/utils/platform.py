"""Platform selection helper.

This machine's sitecustomize registers the TPU PJRT plugin at interpreter
start and pins ``JAX_PLATFORMS``, so plain env vars can't retarget JAX.
``select_platform()`` honors the ``LFR_PLATFORM`` env var (``cpu`` / ``tpu``)
via jax.config, which wins even after plugin registration.  Call it at CLI
entry points before any computation.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache — first-compile latency through the
    remote TPU compiler is minutes, so every entry point amortizes it."""
    import jax

    cache_dir = os.environ.get(
        "LFR_JAX_CACHE", os.path.expanduser("~/.cache/lfr_jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def select_platform(platform: str = None) -> None:
    import jax

    enable_compilation_cache()
    platform = platform or os.environ.get("LFR_PLATFORM")
    if not platform:
        return
    platform = platform.lower()
    if platform in ("tpu", "axon"):
        return  # default registration already targets the TPU
    jax.config.update("jax_platforms", platform)
