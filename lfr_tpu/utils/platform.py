"""Platform selection helper.

This machine's sitecustomize registers the TPU PJRT plugin at interpreter
start and pins ``JAX_PLATFORMS``, so plain env vars can't retarget JAX.
``select_platform()`` honors the ``LFR_PLATFORM`` env var (``cpu`` / ``tpu``)
via jax.config, which wins even after plugin registration.  Call it at CLI
entry points before any computation.
"""

from __future__ import annotations

import os


def select_platform(platform: str = None) -> None:
    import jax

    platform = platform or os.environ.get("LFR_PLATFORM")
    if not platform:
        return
    platform = platform.lower()
    if platform in ("tpu", "axon"):
        return  # default registration already targets the TPU
    jax.config.update("jax_platforms", platform)
