"""Multi-host initialization.

Single-host runs need nothing.  For N>=2 hosts, every process calls
``initialize()`` (env-driven or explicit) before any JAX computation; the
global device mesh then spans all hosts and the solver/BA collectives ride
ICI within hosts and DCN across them.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or LFR_COORDINATOR /
    LFR_NUM_PROCESSES / LFR_PROCESS_ID env vars.  Returns True if a
    multi-process runtime was initialized."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("LFR_COORDINATOR")
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ.get("LFR_NUM_PROCESSES", "0"))
    process_id = (
        process_id if process_id is not None else int(os.environ.get("LFR_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
