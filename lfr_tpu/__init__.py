"""lfr_tpu — a TPU-native multi-view local-feature refinement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``mihaidusmanu/local-feature-refinement`` ("Multi-View Optimization of Local
Feature Geometry", ECCV 2020): feature extraction, descriptor matching, the
two-view patch-alignment flow CNN, multi-view track optimization, and
COLMAP-style triangulation / reconstruction — as one program with arrays
resident on device, instead of six OS processes glued by files.
"""

__version__ = "0.1.0"

# Large-array host work is page-fault-bound on this platform unless freed
# blocks stay on the heap; harmless elsewhere (see utils/platform.py).
from .utils.platform import retain_host_heap as _retain_host_heap

_retain_host_heap()
del _retain_host_heap
