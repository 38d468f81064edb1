"""ctypes bindings to the native (C++) solver kernels.

The irregular, inherently sequential host work — union-find MSF over sorted
edges — runs as native code when the shared library has been built
(``lfr_tpu/native/build.sh``), with a NumPy/Python fallback otherwise
(see lfr_tpu.solver.tracks).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "native", "liblfr_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.lfr_msf_union_find.restype = None
    lib.lfr_msf_union_find.argtypes = [
        ctypes.c_int64,  # n_edges
        ctypes.POINTER(ctypes.c_int64),  # order
        ctypes.POINTER(ctypes.c_int64),  # src
        ctypes.POINTER(ctypes.c_int64),  # dst
        ctypes.c_int64,  # n_nodes
        ctypes.POINTER(ctypes.c_int64),  # node_image
        ctypes.POINTER(ctypes.c_int64),  # parent (out)
    ]
    _LIB = lib
    return _LIB


def msf_union_find(
    order: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    node_image: np.ndarray,
    n_nodes: int,
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise ImportError("native library not built")
    order = np.ascontiguousarray(order, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    node_image = np.ascontiguousarray(node_image, dtype=np.int64)
    parent = np.full(n_nodes, -1, dtype=np.int64)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    lib.lfr_msf_union_find(
        order.shape[0], p(order), p(src), p(dst), n_nodes, p(node_image), p(parent)
    )
    return parent
