"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``--xla_force_host_platform_device_count``); real-TPU execution is covered
by bench.py and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine's sitecustomize may have imported jax (and registered a TPU
# plugin) before this conftest ran, making the env vars above ineffective;
# the config update below wins either way.
import jax

jax.config.update("jax_platforms", "cpu")

# Build the native C++ kernels once per session if absent, so the
# native-parity tests run instead of skipping (build takes ~5 s).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_repo, "lfr_tpu", "native", "liblfr_native.so")
if not os.path.exists(_so):
    import subprocess

    subprocess.run(
        ["bash", os.path.join(_repo, "lfr_tpu", "native", "build.sh")],
        check=False,
        capture_output=True,
    )
