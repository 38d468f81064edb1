"""Cross-pair streaming refinement: fixed-size CNN batches over many pairs.

The per-pair fused path (refinement.TwoViewRefiner.process_pair) pads every
pair's matches to a capacity bucket, so pairs with few matches waste most
of the CNN batch.  This module instead streams matches from MANY pairs into
fixed 2048-row refinement batches against a device-resident image *stack*:

  per pair:   cheap matcher program  -> (nn, sim, keep)  [one small transfer]
  per batch:  one coarse+fine CNN program over (S, H, W, 3) image stacks
              with per-match image indices — the MXU always runs full.

This is the TPU-native answer to the reference's hot loop
(reference: two-view-refinement/compute_match_graph.py:96-205 processes one
pair at a time at whatever batch size the pair's match count happens to be).

Pair results are emitted in submission order; there are no per-pair match
capacities and no silent caps (every match of every pair is refined).
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matchers import _pad_descriptors

#: Matches per refinement batch (the MXU sweet spot measured by bench.py).
REFINE_BATCH = 2048

#: In-flight batched matcher dispatches before the oldest is synced.
MATCH_DEPTH = 2

#: In-flight refinement batches before the oldest is synced.
REFINE_DEPTH = 2

#: Device bytes for the two image stacks together.  Sized with the
#: refine program's ~5 GB transient peak and the match-graph prep cache
#: in mind; at 640x480 the stacks hold ~85 images, and an eviction
#: drains all in-flight work, so UNDERsizing this thrashes a
#: 100-image exhaustive run (measured: match stage 142 s -> 286 s at a
#: 3.5 GB budget).  Stage-boundary hygiene (stream.close(), the
#: benchmark's between-repeat eval-cache clear) keeps the 4+4 GB
#: budgets inside the chip.
STACK_BUDGET_BYTES = int(4e9)

#: Device bytes for the descriptor stack.
DESC_BUDGET_BYTES = int(512e6)

#: Pairs per batched matcher dispatch at descriptor bucket B (bounded by
#: the (P, B, B) similarity volume; 32 pairs at B=2048 is 512 MB).
def _match_pairs_for(bucket: int) -> int:
    return int(max(2, min(32, (1 << 31) // max(bucket * bucket * 4, 1))))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_slot(stack, arr, slot):
    """In-place (donated) write of one image into its stack slot."""
    return jax.lax.dynamic_update_slice(stack, arr[None], (slot, 0, 0, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_slot3(stack, arr, slot):
    """In-place (donated) write of one descriptor block into its slot."""
    return jax.lax.dynamic_update_slice(stack, arr[None], (slot, 0, 0))


class _PairRec:
    __slots__ = (
        "meta", "matches", "sims", "grid12", "grid21", "remaining", "matched"
    )

    def __init__(self, meta):
        self.meta = meta
        self.matches = None
        self.sims = None
        self.grid12 = None
        self.grid21 = None
        self.remaining = -1
        self.matched = False


class MatchRefineStream:
    """Streams (match -> batch-refine) over a sequence of image pairs.

    Usage (see pipelines.match_graph):
        stream.add_pair(meta, name1, prep1, kps1, d1, name2, prep2, kps2, d2,
                        matcher, threshold)
        for meta, payload in stream.ready():   # completed pairs, in order
            ...
        for meta, payload in stream.flush():   # at end of the pair list
            ...
    """

    def __init__(
        self,
        refiner,
        refine_batch: int = REFINE_BATCH,
        stack_budget_bytes: int = STACK_BUDGET_BYTES,
        accum=None,
    ):
        from ..utils.timing import Accum

        self.refiner = refiner
        self.refine_batch = int(refine_batch)
        self.stack_budget = int(stack_budget_bytes)
        #: Blocking-time attribution of the streaming pipeline (shared
        #: with the caller's match-graph breakdown when provided).
        self.accum = accum if accum is not None else Accum()

        self._base_stack = None  # (S, Hb, Wb, 3)
        self._up_stack = None    # (S, Hu, Wu, 3)
        self._slots: "collections.OrderedDict[str, int]" = collections.OrderedDict()
        self._free: List[int] = []
        self._off_base: Optional[np.ndarray] = None
        self._off_up: Optional[np.ndarray] = None

        # Host-side accumulation of matches awaiting refinement.
        self._acc: Dict[str, List[np.ndarray]] = {
            k: [] for k in ("ij1", "ij2", "k1", "k2", "ob1", "ob2", "ou1", "ou2")
        }
        self._acc_rows = 0
        #: CNN-refined rows (= MNN matches BEFORE geometric verification;
        #: stage-throughput accounting must use this count, not the
        #: post-verification inlier count downstream stats report).
        self.refined_rows = 0
        #: (pair_rec, start_row_in_pair, n_rows) segments per accum row run.
        self._acc_segments: List[Tuple[_PairRec, int, int]] = []

        self._pairs: "collections.deque[_PairRec]" = collections.deque()
        #: Pairs awaiting a batched matcher dispatch.
        self._pend_match: List[tuple] = []
        #: In-flight matcher batches: (handle, [per-pair meta, ...]).
        self._match_q: "collections.deque[tuple]" = collections.deque()
        #: In-flight refinement batches: (handle, segments, n_valid).
        self._refine_q: "collections.deque[tuple]" = collections.deque()

        # Device descriptor stack (matching analog of the image stacks):
        # each image's padded descriptors upload once and P pairs match by
        # slot index in one program.
        self._dstack = None  # (S, B, D)
        self._dslots: "collections.OrderedDict[str, int]" = collections.OrderedDict()
        self._dhost: Dict[str, tuple] = {}  # name -> (padded np, n_valid)
        self._dfree: List[int] = []
        self._dn: Optional[np.ndarray] = None  # (S,) valid counts

    # ------------------------------------------------------------------
    # Image stack
    # ------------------------------------------------------------------

    def _stack_shapes(self, prep):
        return prep.base.array.shape, prep.up.array.shape

    def _alloc_stacks(self, base_shape, up_shape):
        bytes_per = int(np.prod(base_shape) + np.prod(up_shape)) * 4
        s = max(4, min(256, self.stack_budget // max(bytes_per, 1)))
        self._base_stack = jnp.zeros((s,) + tuple(base_shape), jnp.float32)
        self._up_stack = jnp.zeros((s,) + tuple(up_shape), jnp.float32)
        self._slots.clear()
        self._free = list(range(s))
        self._off_base = np.zeros(s, np.float32)
        self._off_up = np.zeros(s, np.float32)

    def _ensure_slot(self, name: str, prep) -> int:
        if name in self._slots:
            self._slots.move_to_end(name)
            return self._slots[name]

        base_shape, up_shape = self._stack_shapes(prep)
        if self._base_stack is None:
            self._alloc_stacks(base_shape, up_shape)
        elif (
            base_shape[0] > self._base_stack.shape[1]
            or base_shape[1] > self._base_stack.shape[2]
            or up_shape[0] > self._up_stack.shape[1]
            or up_shape[1] > self._up_stack.shape[2]
        ):
            # A larger image arrived: finish all in-flight work referencing
            # the old stacks, then grow.
            self._drain_all_device_work()
            self._alloc_stacks(
                (
                    max(base_shape[0], self._base_stack.shape[1]),
                    max(base_shape[1], self._base_stack.shape[2]),
                    3,
                ),
                (
                    max(up_shape[0], self._up_stack.shape[1]),
                    max(up_shape[1], self._up_stack.shape[2]),
                    3,
                ),
            )

        if not self._free:
            # Evict the least-recently-used image.  In-flight batches hold
            # row indices into the stack, so they must complete first.
            self._drain_all_device_work()
            old_name, slot = self._slots.popitem(last=False)
            self._free.append(slot)

        slot = self._free.pop()
        from .refinement import _extend

        base_arr = prep.base.array
        sh = self._base_stack.shape
        if base_arr.shape[:2] != sh[1:3]:
            base_arr = _extend(base_arr, sh[1], sh[2])
        up_arr = prep.up.array
        sh = self._up_stack.shape
        if up_arr.shape[:2] != sh[1:3]:
            up_arr = _extend(up_arr, sh[1], sh[2])

        self._base_stack = _write_slot(self._base_stack, base_arr, jnp.int32(slot))
        self._up_stack = _write_slot(self._up_stack, up_arr, jnp.int32(slot))
        self._off_base[slot] = prep.base.offset
        self._off_up[slot] = prep.up.offset
        self._slots[name] = slot
        return slot

    # ------------------------------------------------------------------
    # Descriptor stack
    # ------------------------------------------------------------------

    def _alloc_dstack(self, rows: int, dim: int) -> None:
        bytes_per = rows * dim * 4
        s = max(4, min(1024, DESC_BUDGET_BYTES // max(bytes_per, 1)))
        self._dstack = jnp.zeros((s, rows, dim), jnp.float32)
        self._dslots.clear()
        self._dfree = list(range(s))
        self._dn = np.zeros(s, np.int32)

    def _ensure_desc_slot(self, name: str, desc: np.ndarray) -> int:
        if name in self._dslots:
            self._dslots.move_to_end(name)
            return self._dslots[name]

        padded, n = _pad_descriptors(np.asarray(desc, np.float32))
        if self._dstack is None:
            self._alloc_dstack(padded.shape[0], padded.shape[1])
        elif (
            padded.shape[0] > self._dstack.shape[1]
            or padded.shape[1] > self._dstack.shape[2]
        ):
            # A larger descriptor block arrived: finish in-flight matcher
            # work, grow the stack, and re-upload the live slots.
            self._dispatch_match()
            while self._match_q:
                self._sync_one_match()
            live = list(self._dslots.keys())
            self._alloc_dstack(
                max(padded.shape[0], self._dstack.shape[1]),
                max(padded.shape[1], self._dstack.shape[2]),
            )
            for other in live:
                if other in self._dhost:
                    self._upload_desc(other, *self._dhost[other])
        if not self._dfree:
            # Evict the least-recently-used descriptors.  Pending pairs
            # hold slot indices, so their batch must dispatch+sync first.
            self._dispatch_match()
            while self._match_q:
                self._sync_one_match()
            old, slot = self._dslots.popitem(last=False)
            self._dhost.pop(old, None)
            self._dfree.append(slot)
        return self._upload_desc(name, padded, n)

    def _upload_desc(self, name: str, padded: np.ndarray, n: int) -> int:
        slot = self._dfree.pop()
        sh = self._dstack.shape
        if padded.shape != sh[1:]:
            block = np.zeros(sh[1:], np.float32)
            block[: padded.shape[0], : padded.shape[1]] = padded
            padded = block
        self._dstack = _write_slot3(
            self._dstack, jnp.asarray(padded), jnp.int32(slot)
        )
        self._dn[slot] = n
        self._dslots[name] = slot
        self._dhost[name] = (padded, n)
        return slot

    # ------------------------------------------------------------------
    # Pair intake
    # ------------------------------------------------------------------

    def add_pair(
        self,
        meta,
        name1: str, prep1, kps1: np.ndarray, desc1: np.ndarray,
        name2: str, prep2, kps2: np.ndarray, desc2: np.ndarray,
        matcher: str, threshold: float,
    ) -> None:
        rec = _PairRec(meta)
        self._pairs.append(rec)

        # Ensure BOTH slots, then re-resolve: ensuring the second image can
        # grow or LRU-evict the stack, invalidating the first slot index.
        with self.accum.span("stack_upload"):
            self._ensure_slot(name1, prep1)
            self._ensure_slot(name2, prep2)
            if name1 not in self._slots:
                self._ensure_slot(name1, prep1)  # re-upload; LRU spares name2
        slot1 = self._slots[name1]
        slot2 = self._slots[name2]

        kind = "similarity" if matcher == "similarity" else "ratio"
        if self._pend_match and self._pend_match[0][1] != kind:
            self._dispatch_match()  # matcher kind is static per program
        with self.accum.span("desc_upload"):
            self._ensure_desc_slot(name1, desc1)
            self._ensure_desc_slot(name2, desc2)
            if name1 not in self._dslots:
                self._ensure_desc_slot(name1, desc1)
        d1 = self._dslots[name1]
        d2 = self._dslots[name2]
        self._pend_match.append(
            (rec, kind, d1, d2, float(threshold), kps1, kps2, slot1, slot2)
        )
        if len(self._pend_match) >= _match_pairs_for(self._dstack.shape[1]):
            self._dispatch_match()

    def add_empty_pair(self, meta) -> None:
        """Queue a pair with no features/matches (keeps emission order)."""
        rec = _PairRec(meta)
        rec.matches = np.zeros((0, 2), np.int64)
        rec.sims = np.zeros(0, np.float32)
        rec.grid12 = np.zeros((0, 3, 3, 2), np.float32)
        rec.grid21 = np.zeros((0, 3, 3, 2), np.float32)
        rec.remaining = 0
        rec.matched = True
        self._pairs.append(rec)

    def _dispatch_match(self) -> None:
        group, self._pend_match = self._pend_match, []
        if not group:
            return
        with self.accum.span("match_dispatch"):
            self._dispatch_match_inner(group)

    def _dispatch_match_inner(self, group) -> None:
        rows = _match_pairs_for(self._dstack.shape[1])
        pad = rows - len(group)
        s1 = np.array([g[2] for g in group] + [0] * pad, np.int32)
        s2 = np.array([g[3] for g in group] + [0] * pad, np.int32)
        n1 = self._dn[s1].copy()
        n2 = self._dn[s2].copy()
        if pad:
            n1[len(group):] = 0
            n2[len(group):] = 0
        thr = np.array([g[4] for g in group] + [0.0] * pad, np.float32)
        handle = self.refiner._match_stack(
            self._dstack,
            jnp.asarray(s1), jnp.asarray(s2),
            jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(thr),
            matcher=group[0][1],
        )
        metas = [(g[0], int(n1[i]), g[5], g[6], g[7], g[8]) for i, g in enumerate(group)]
        self._match_q.append((handle, metas))
        while len(self._match_q) > MATCH_DEPTH:
            self._sync_one_match()

    def _sync_one_match(self) -> None:
        handle, metas = self._match_q.popleft()
        with self.accum.span("match_sync"):
            packed_all = np.asarray(handle)  # (P, B, 3): one transfer/batch
        with self.accum.span("match_ingest"):
            for row, meta in zip(packed_all, metas):
                self._ingest_match(row, *meta)

    def _ingest_match(self, packed, rec, n1, kps1, kps2, slot1, slot2) -> None:
        keep = packed[:n1, 2] > 0
        idx1 = np.nonzero(keep)[0]
        idx2 = packed[idx1, 0].astype(np.int64)
        sims = packed[idx1, 1].astype(np.float32)
        m = idx1.shape[0]

        rec.matches = np.stack([idx1, idx2], axis=1) if m else np.zeros((0, 2), np.int64)
        rec.sims = sims
        rec.grid12 = np.zeros((m, 3, 3, 2), np.float32)
        rec.grid21 = np.zeros((m, 3, 3, 2), np.float32)
        rec.remaining = m
        rec.matched = True
        if m == 0:
            return

        # (row, col) centers at matching resolution.
        self._acc["ij1"].append(kps1[idx1][:, 1::-1].astype(np.float32))
        self._acc["ij2"].append(kps2[idx2][:, 1::-1].astype(np.float32))
        self._acc["k1"].append(np.full(m, slot1, np.int32))
        self._acc["k2"].append(np.full(m, slot2, np.int32))
        self._acc["ob1"].append(np.full(m, self._off_base[slot1], np.float32))
        self._acc["ob2"].append(np.full(m, self._off_base[slot2], np.float32))
        self._acc["ou1"].append(np.full(m, self._off_up[slot1], np.float32))
        self._acc["ou2"].append(np.full(m, self._off_up[slot2], np.float32))
        self._acc_segments.append((rec, 0, m))
        self._acc_rows += m

        while self._acc_rows >= self.refine_batch:
            self._dispatch_refine(self.refine_batch)

    # ------------------------------------------------------------------
    # Refinement batches
    # ------------------------------------------------------------------

    def _take_rows(self, want: int):
        """Pop exactly ``want`` accumulated rows (splitting segments)."""
        taken = {k: [] for k in self._acc}
        segs: List[Tuple[_PairRec, int, int]] = []
        got = 0
        while got < want and self._acc_segments:
            rec, start, n = self._acc_segments[0]
            take = min(n, want - got)
            for k in self._acc:
                arr = self._acc[k][0]
                taken[k].append(arr[:take])
                if take == arr.shape[0]:
                    self._acc[k].pop(0)
                else:
                    self._acc[k][0] = arr[take:]
            segs.append((rec, start, take))
            if take == n:
                self._acc_segments.pop(0)
            else:
                self._acc_segments[0] = (rec, start + take, n - take)
            got += take
        self._acc_rows -= got
        return {k: np.concatenate(v) if v else np.zeros(0) for k, v in taken.items()}, segs, got

    def _dispatch_refine(self, batch_rows: int) -> None:
        with self.accum.span("refine_dispatch"):
            self._dispatch_refine_inner(batch_rows)

    def _dispatch_refine_inner(self, batch_rows: int) -> None:
        cols, segs, got = self._take_rows(batch_rows)
        if got == 0:
            return
        self.refined_rows += got
        pad = batch_rows - got
        if pad:
            for k in ("ij1", "ij2"):
                cols[k] = np.concatenate([cols[k], np.zeros((pad, 2), np.float32)])
            for k in ("k1", "k2"):
                cols[k] = np.concatenate([cols[k], np.zeros(pad, np.int32)])
            for k in ("ob1", "ob2", "ou1", "ou2"):
                cols[k] = np.concatenate([cols[k], np.zeros(pad, np.float32)])
        handle = self.refiner._refine_batch(
            self.refiner.variables,
            self._base_stack,
            self._up_stack,
            jnp.asarray(cols["k1"]), jnp.asarray(cols["k2"]),
            jnp.asarray(cols["ij1"]), jnp.asarray(cols["ij2"]),
            jnp.asarray(cols["ob1"]), jnp.asarray(cols["ob2"]),
            jnp.asarray(cols["ou1"]), jnp.asarray(cols["ou2"]),
        )
        self._refine_q.append((handle, segs, got))
        while len(self._refine_q) > REFINE_DEPTH:
            self._sync_one_refine()

    def _sync_one_refine(self) -> None:
        handle, segs, got = self._refine_q.popleft()
        with self.accum.span("refine_sync"):
            packed = np.asarray(handle)[:got]  # (got, 36)
        row = 0
        for rec, start, n in segs:
            block = packed[row : row + n]
            rec.grid12[start : start + n] = block[:, :18].reshape(-1, 3, 3, 2)
            rec.grid21[start : start + n] = block[:, 18:].reshape(-1, 3, 3, 2)
            rec.remaining -= n
            row += n

    def _drain_all_device_work(self) -> None:
        self._dispatch_match()
        while self._match_q:
            self._sync_one_match()
        while self._acc_rows:
            # Tail batches pad to power-of-2 row buckets (>= 256) to bound
            # the number of compiled batch shapes.
            rows = min(self._acc_rows, self.refine_batch)
            bucket = 1 << max(8, int(rows - 1).bit_length())
            self._dispatch_refine(min(bucket, self.refine_batch))
        while self._refine_q:
            self._sync_one_refine()

    # ------------------------------------------------------------------
    # Output
    # ------------------------------------------------------------------

    def _pop_complete(self) -> Iterator[Tuple[object, tuple]]:
        while self._pairs and self._pairs[0].matched and self._pairs[0].remaining == 0:
            rec = self._pairs.popleft()
            yield rec.meta, (rec.matches, rec.sims, rec.grid12, rec.grid21)

    def ready(self) -> Iterator[Tuple[object, tuple]]:
        """Completed pairs in submission order (non-blocking-ish: only syncs
        result batches beyond the pipeline depth)."""
        yield from self._pop_complete()

    def flush(self) -> Iterator[Tuple[object, tuple]]:
        """Finish everything and yield all remaining pairs in order."""
        self._drain_all_device_work()
        yield from self._pop_complete()

    def close(self) -> None:
        """Release the device stacks deterministically.

        The image/descriptor stacks hold several GB of HBM; dropping them
        via garbage collection alone can lag behind the next stage's (or
        the next stream's) allocations and tip the refine program's
        ~full-chip peak into ResourceExhausted."""
        for arr in (self._base_stack, self._up_stack, self._dstack):
            if arr is not None:
                try:
                    arr.delete()
                except Exception:
                    pass
        self._base_stack = self._up_stack = self._dstack = None
        self._slots.clear()
        self._dslots.clear()
        self._dhost.clear()
        self._free = []
        self._dfree = []
