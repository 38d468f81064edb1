"""PANet checkpoint persistence (msgpack via flax.serialization).

The framework's own weight format; torch ``checkpoint.pth`` files from the
reference load through lfr_tpu.models.torch_import instead.
"""

from __future__ import annotations

from typing import Dict

import flax.serialization
import jax

from . import panet


def save_variables(path: str, variables: Dict) -> None:
    with open(path, "wb") as fh:
        fh.write(flax.serialization.to_bytes(variables))


def load_variables(path: str) -> Dict:
    template = panet.init_params(jax.random.PRNGKey(0))
    with open(path, "rb") as fh:
        return flax.serialization.from_bytes(template, fh.read())


def load_any(path: str) -> Dict:
    """Load either a framework checkpoint (.msgpack) or a torch .pth."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from .torch_import import load_checkpoint

        return load_checkpoint(path)
    return load_variables(path)
