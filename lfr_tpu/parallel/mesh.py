"""Device mesh construction and sharding rules.

The framework's parallel axes:
  * ``dp`` — data parallel over patch/match batches (the CNN path);
  * ``mp`` — model/tensor parallel over the flow CNN's wide channel dims;
  * components from the graph partitioner shard over the *flattened* mesh
    (component parallelism — the reference's thread pool, solve.cc:614-635,
    generalized to chips).

Single-chip runs use a trivial 1x1 mesh; multi-host runs build the mesh
over all processes after ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, mp: Optional[int] = None
) -> Mesh:
    """Build a ("dp", "mp") mesh over the first n_devices devices.

    By default all model parallelism is off (mp=1): the flow CNN is small
    enough that pure DP wins on ICI; mp exists for the wide correlation
    channels at large batch.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if dp is None and mp is None:
        dp, mp = n, 1
    elif dp is None:
        dp = n // mp
    elif mp is None:
        mp = n // dp
    assert dp * mp == n, f"dp*mp must equal device count ({dp}*{mp} != {n})"
    arr = mesh_utils.create_device_mesh((dp, mp), devices=np.asarray(devices))
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params) -> dict:
    """Tensor-parallel placement for PANet parameters.

    The refine-head convs carry ~95% of the weights; their output-channel
    dim shards over ``mp``.  BatchNorm vectors follow their conv's channels.
    Everything else is replicated.  With mp=1 this degenerates to full
    replication.
    """

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim == 4 and "refine" in joined:
            return NamedSharding(mesh, P(None, None, None, "mp"))
        if leaf.ndim == 1 and "refine" in joined:
            return NamedSharding(mesh, P("mp"))
        if "predict" in joined and leaf.ndim == 2:
            return NamedSharding(mesh, P("mp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad axis to a multiple (for even dp sharding); returns (padded, orig)."""
    n = array.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return array, n
    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(array, pad_width), n
