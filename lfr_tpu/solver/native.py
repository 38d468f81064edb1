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


def sort_matches_desc(
    sim: np.ndarray, src: np.ndarray, dst: np.ndarray, n_threads: int = 4
) -> np.ndarray:
    """Match order by (sim desc, src desc, dst desc) — parallel native sort
    byte-identical to ``np.lexsort((dst, src, sim))[::-1]``."""
    lib = _load()
    if lib is None:
        raise ImportError("native library not built")
    sim = np.ascontiguousarray(sim, dtype=np.float32)
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    order = np.empty(sim.shape[0], dtype=np.int64)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    lib.lfr_sort_matches_desc(
        sim.shape[0],
        sim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p(src),
        p(dst),
        p(order),
        n_threads,
    )
    return order


def counting_argsort(vals: np.ndarray, n_vals: int) -> np.ndarray:
    """Stable argsort for small-range int keys; O(n) native counting sort.
    Identical ordering to ``np.argsort(vals, kind="stable")``."""
    lib = _load()
    if lib is None or not hasattr(lib, "lfr_counting_argsort"):
        return np.argsort(vals, kind="stable")
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    order = np.empty(vals.shape[0], dtype=np.int64)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    lib.lfr_counting_argsort(vals.shape[0], p(vals), int(n_vals), p(order))
    return order


def prefault(arr: np.ndarray, n_threads: int = 4) -> bool:
    """Parallel first-touch of a freshly allocated buffer (see
    ``lfr_prefault``).  No-op returning False without the native library."""
    lib = _load()
    if lib is None or not hasattr(lib, "lfr_prefault"):
        return False
    if not hasattr(lib, "_pf_ready"):
        lib.lfr_prefault.restype = None
        lib.lfr_prefault.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib._pf_ready = True
    lib.lfr_prefault(arr.ctypes.data, arr.nbytes, n_threads)
    return True


def gather_scatter_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lfr_gather_scatter")


def gather_scatter(
    src: np.ndarray,
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    dst: np.ndarray,
    n_threads: int = 4,
) -> bool:
    """``dst[dst_idx[i]] = src[src_idx[i]]`` over the leading axis, via the
    multithreaded native kernel.  Returns False (no-op) when the native
    library is unavailable so callers can fall back to NumPy.  ``dst_idx``
    must be disjoint (each destination slot written at most once)."""
    lib = _load()
    if lib is None or not hasattr(lib, "lfr_gather_scatter"):
        return False
    if not hasattr(lib, "_gs_ready"):
        lib.lfr_gather_scatter.restype = None
        lib.lfr_gather_scatter.argtypes = [
            ctypes.c_void_p,  # src
            ctypes.c_int64,  # elem_bytes
            ctypes.POINTER(ctypes.c_int64),  # src_idx
            ctypes.POINTER(ctypes.c_int64),  # dst_idx
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # dst
            ctypes.c_int,  # n_threads
        ]
        lib._gs_ready = True
    assert src.flags.c_contiguous and dst.flags.c_contiguous
    assert src.dtype == dst.dtype
    elem = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    src_idx = np.ascontiguousarray(src_idx, dtype=np.int64)
    dst_idx = np.ascontiguousarray(dst_idx, dtype=np.int64)
    p64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    lib.lfr_gather_scatter(
        src.ctypes.data,
        elem,
        p64(src_idx),
        p64(dst_idx),
        src_idx.shape[0],
        dst.ctypes.data,
        n_threads,
    )
    return True


def copy_blocks_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "lfr_copy_blocks")


def copy_blocks(
    srcs: "list[np.ndarray]",
    dst: np.ndarray,
    dst_offsets: np.ndarray,
    n_threads: int = 4,
) -> bool:
    """``dst.view(bytes)[dst_offsets[i]:+srcs[i].nbytes] = srcs[i]`` for all
    blocks at once, multithreaded (see ``lfr_copy_blocks``).  Offsets are in
    BYTES from ``dst``'s base.  Returns False (no-op) when unavailable.
    Sources must be C-contiguous and dtype-compatible with ``dst``."""
    lib = _load()
    if lib is None or not hasattr(lib, "lfr_copy_blocks"):
        return False
    if not hasattr(lib, "_cb_ready"):
        lib.lfr_copy_blocks.restype = None
        lib.lfr_copy_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # srcs
            ctypes.POINTER(ctypes.c_int64),  # dst_off (bytes)
            ctypes.POINTER(ctypes.c_int64),  # nbytes
            ctypes.c_int64,  # n
            ctypes.c_void_p,  # dst_base
            ctypes.c_int,  # n_threads
        ]
        lib._cb_ready = True
    n = len(srcs)
    src_ptrs = (ctypes.c_void_p * n)()
    nbytes = np.empty(n, dtype=np.int64)
    for i, s in enumerate(srcs):
        assert s.flags.c_contiguous
        src_ptrs[i] = s.ctypes.data
        nbytes[i] = s.nbytes
    dst_offsets = np.ascontiguousarray(dst_offsets, dtype=np.int64)
    assert dst.flags.c_contiguous
    p64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    lib.lfr_copy_blocks(
        src_ptrs, p64(dst_offsets), p64(nbytes), n, dst.ctypes.data, n_threads
    )
    return True


def copy_blocks_async(
    srcs: "list[np.ndarray]",
    dst: np.ndarray,
    dst_offsets: np.ndarray,
    n_threads: int = 3,
):
    """Launch :func:`copy_blocks` on a worker thread (ctypes releases the
    GIL for the native call, so it overlaps main-thread NumPy work).

    Returns a join() callable: True once the copy completed natively, False
    immediately when the native library is unavailable (caller falls back).
    """
    if not copy_blocks_available():
        return lambda: False
    import threading

    t = threading.Thread(
        target=copy_blocks, args=(srcs, dst, dst_offsets, n_threads), daemon=True
    )
    t.start()

    def join() -> bool:
        t.join()
        return True

    return join


def decode_matching_file_native(data: bytes):
    """Native MatchingFile decode -> list of PairMatches (or None if the
    library is unavailable)."""
    lib = _load()
    if lib is None:
        return None
    import ctypes as ct

    if not hasattr(lib, "lfr_matching_count"):
        return None
    lib.lfr_matching_count.restype = ct.c_int
    lib.lfr_matching_fill.restype = ct.c_int

    buf = np.frombuffer(data, dtype=np.uint8)
    bptr = buf.ctypes.data_as(ct.POINTER(ct.c_uint8))
    n_pairs = ct.c_int64()
    n_matches = ct.c_int64()
    name_bytes = ct.c_int64()
    rc = lib.lfr_matching_count(
        bptr, len(data), ct.byref(n_pairs), ct.byref(n_matches), ct.byref(name_bytes)
    )
    if rc != 0:
        raise ValueError("native MatchingFile count pass failed")
    P, M, NB = n_pairs.value, n_matches.value, name_bytes.value

    counts = np.zeros(P, np.int64)
    facts = np.zeros(2 * P, np.float32)
    name_offsets = np.zeros(2 * P + 1, np.int64)
    name_data = ctypes.create_string_buffer(max(NB, 1))
    matches = np.zeros(2 * M, np.uint32)
    sims = np.zeros(M, np.float32)
    disps = np.zeros(M * 36, np.float32)

    p64 = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_int64))  # noqa: E731
    pf = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_float))  # noqa: E731
    rc = lib.lfr_matching_fill(
        bptr,
        len(data),
        p64(counts),
        pf(facts),
        p64(name_offsets),
        name_data,
        matches.ctypes.data_as(ct.POINTER(ct.c_uint32)),
        pf(sims),
        pf(disps),
    )
    if rc != 0:
        raise ValueError("native MatchingFile fill pass failed")

    from ..io.protos import PairMatches

    names_raw = name_data.raw[:NB]
    out = []
    m0 = 0
    for k in range(P):
        n = int(counts[k])
        name1 = names_raw[name_offsets[2 * k] : name_offsets[2 * k + 1]].decode("utf-8")
        name2 = names_raw[name_offsets[2 * k + 1] : name_offsets[2 * k + 2]].decode("utf-8")
        mm = matches[2 * m0 : 2 * (m0 + n)].reshape(n, 2).copy()
        ss = sims[m0 : m0 + n].copy()
        dd = disps[36 * m0 : 36 * (m0 + n)].reshape(n, 2, 3, 3, 2)
        out.append(
            PairMatches(
                name1,
                float(facts[2 * k]),
                name2,
                float(facts[2 * k + 1]),
                mm,
                ss,
                dd[:, 0].copy(),
                dd[:, 1].copy(),
            )
        )
        m0 += n
    return out


def encode_matching_file_native(pairs):
    """Native MatchingFile encode from PairMatches list (or None)."""
    lib = _load()
    if lib is None or not hasattr(lib, "lfr_matching_encode"):
        return None
    import ctypes as ct

    lib.lfr_matching_encode_size.restype = ct.c_int64
    lib.lfr_matching_encode.restype = ct.c_int

    n_pairs = len(pairs)
    counts = np.array([p.num_matches for p in pairs], np.int64)
    facts = np.empty(2 * n_pairs, np.float32)
    names = []
    name_offsets = np.zeros(2 * n_pairs + 1, np.int64)
    for k, p in enumerate(pairs):
        facts[2 * k] = p.fact1
        facts[2 * k + 1] = p.fact2
        b1 = p.image_name1.encode("utf-8")
        b2 = p.image_name2.encode("utf-8")
        names.append(b1)
        names.append(b2)
        name_offsets[2 * k + 1] = name_offsets[2 * k] + len(b1)
        name_offsets[2 * k + 2] = name_offsets[2 * k + 1] + len(b2)
    name_data = b"".join(names)
    total_m = int(counts.sum())
    matches = np.zeros((total_m, 2), np.uint32)
    sims = np.zeros(total_m, np.float32)
    disps = np.zeros((total_m, 36), np.float32)
    m0 = 0
    for p in pairs:
        n = p.num_matches
        if n:
            matches[m0 : m0 + n] = p.matches
            sims[m0 : m0 + n] = p.similarities
            disps[m0 : m0 + n, :18] = np.asarray(p.disp1, np.float32).reshape(n, 18)
            disps[m0 : m0 + n, 18:] = np.asarray(p.disp2, np.float32).reshape(n, 18)
        m0 += n

    p64 = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_int64))  # noqa: E731
    pf = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_float))  # noqa: E731
    size = lib.lfr_matching_encode_size(
        n_pairs, p64(counts), pf(facts), p64(name_offsets),
        matches.ctypes.data_as(ct.POINTER(ct.c_uint32)), pf(sims), pf(disps),
    )
    out = ctypes.create_string_buffer(max(int(size), 1))
    rc = lib.lfr_matching_encode(
        n_pairs, p64(counts), pf(facts), p64(name_offsets), name_data,
        matches.ctypes.data_as(ct.POINTER(ct.c_uint32)), pf(sims), pf(disps),
        ct.cast(out, ct.POINTER(ct.c_uint8)),
    )
    if rc != 0:
        raise ValueError("native MatchingFile encode failed")
    return out.raw[: int(size)]
