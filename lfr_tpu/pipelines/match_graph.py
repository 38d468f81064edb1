"""Match-graph construction: matching + two-view refinement over a pair list.

The reference's ``compute_match_graph.py`` process
(reference: two-view-refinement/compute_match_graph.py:31-205) as a library
function + CLI: for every pair in the match list, load + downscale images,
match descriptors (MXU matmul), run the coarse-to-fine flow CNN, and emit a
reference-compatible MatchingFile (chunked every 5000 pairs).
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time
from typing import List, Optional

import numpy as np

from ..config import DEFAULT_BATCH_SIZE, DUMP_INTERVAL, MethodConfig, get_method
from ..io import features as features_io
from ..io import images as images_io
from ..io import match_list as match_list_io
from ..io import protos
from ..ops import matchers
from .refinement import TwoViewRefiner, prepare_image


def compute_match_graph(
    image_path: str,
    match_list_file: str,
    method: MethodConfig,
    output_file: str,
    refiner: Optional[TwoViewRefiner] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    skip_refinement: bool = False,
    dump_interval: int = DUMP_INTERVAL,
    progress: bool = True,
    max_matches: int = 2048,
    sub_spans: Optional[dict] = None,
) -> List[str]:
    """Build the match graph for all pairs; returns the written file list.

    ``skip_refinement`` zero-fills the displacement grids, exercising the
    full pipeline with identity refinement — the reference's
    SKIP_REFINEMENT debug path (reference: compute_match_graph.py:28,150-159).

    ``sub_spans``: optional dict filled with the stage's internal
    blocking-time breakdown (host decode, device uploads, matcher
    dispatch/sync, CNN batches, proto emission) so drivers can attribute
    the stage wall-clock instead of guessing.
    """
    import concurrent.futures
    import sys as _sys

    from ..utils.timing import Accum

    accum = Accum()

    # Defensive stage hygiene: if an evaluation ran earlier in this
    # process, its cached device point blocks would crowd this stage's
    # near-full-chip refine peak (ResourceExhausted); drop them (host and
    # disk caches make later re-upload cheap).  Guarded so this never
    # imports the eval stack just to clear nothing.
    _eth3d = _sys.modules.get("lfr_tpu.eval.eth3d")
    if _eth3d is not None:
        _eth3d.release_device_blocks()

    pairs = match_list_io.read_match_list(match_list_file)
    if refiner is None and not skip_refinement:
        refiner = TwoViewRefiner(batch_size=batch_size)

    written: List[str] = []
    out_pairs: List[protos.PairMatches] = []
    part_idx = -1
    cached_name1 = None
    image1 = None
    fact1 = 1.0
    t0 = time.time()

    def _load(name):
        image, fact = images_io.load_and_downscale(
            os.path.join(image_path, name), method.max_edge, method.max_sum_edges
        )
        feats = features_io.load_features(os.path.join(image_path, name), method.name)
        return image, fact, feats

    # Host-side decode cache: exhaustive match lists revisit every image
    # ~n_images times, and decode+resize per PAIR was ~40% of the warm
    # match stage.  Byte-budgeted LRU (a 1600 px image is ~8 MB).
    LOAD_CACHE_BYTES = int(2e9)
    loaded = collections.OrderedDict()  # name -> (image, fact, feats)
    load_bytes = [0]

    def _remember(name, item):
        loaded[name] = item
        load_bytes[0] += item[0].nbytes
        while load_bytes[0] > LOAD_CACHE_BYTES and len(loaded) > 2:
            _, old = loaded.popitem(last=False)
            load_bytes[0] -= old[0].nbytes

    # Image decode + feature IO overlaps device compute: the next pair's
    # second image prefetches while the current pair refines.
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)
    prefetched = {}

    def _get(name):
        hit = loaded.get(name)
        if hit is not None:
            loaded.move_to_end(name)
            prefetched.pop(name, None)
            return hit
        with accum.span("host_decode"):
            fut = prefetched.pop(name, None)
            item = fut.result() if fut is not None else _load(name)
        _remember(name, item)
        return item

    def _flush(final: bool) -> None:
        nonlocal part_idx, out_pairs
        with accum.span("proto_write"):
            if final and part_idx == -1:
                protos.write_matching_file(output_file, out_pairs)
                written.append(output_file)
            else:
                part_idx += 1
                path = f"{output_file}.part.{part_idx}"
                protos.write_matching_file(path, out_pairs)
                written.append(path)
            out_pairs = []

    # Fused per-pair dispatch pipelines matching + refinement across pairs;
    # results resolve a few pairs behind the dispatch front.
    fused = (
        not skip_refinement
        and refiner is not None
        and getattr(refiner, "_patch_cnn", None) is getattr(refiner, "_patch_cnn_original", 0)
    )
    queue = collections.deque()  # (meta, pending-or-ready)
    PIPELINE_DEPTH = 3

    # Device-resident image cache: each image is padded/pyramided on device
    # once and reused across all its pairs (LRU-bounded for HBM).
    prepared = collections.OrderedDict()
    # The prep result is only consumed when the stream (re)writes a stack
    # slot; while the stack covers the working set, prep hits are free and
    # the cache is pure HBM overhead.  2 GB (~85 images at 640x480) plus
    # the 4 GB stacks and the refine program's ~5 GB transient peak fits
    # the chip at 300-image scale (a 4 GB prep budget OOM'd there: 4+4+5
    # GB + weights exceeded the v5e's HBM mid-stage).  The round-4 "2x
    # slower at a trimmed budget" measurement trimmed the STACK budget,
    # not this cache — stack capacity is what prevents drain thrash.
    PREP_CACHE_BYTES = int(2e9)
    prep_bytes = [0]

    def _prep_size(p):
        return p.base.array.nbytes + p.up.array.nbytes

    def _prep(name, image):
        p = prepared.get(name)
        if p is None:
            with accum.span("image_prep"):
                p = prepare_image(image)
            prepared[name] = p
            prep_bytes[0] += _prep_size(p)
            while prep_bytes[0] > PREP_CACHE_BYTES and len(prepared) > 2:
                _, old = prepared.popitem(last=False)
                prep_bytes[0] -= _prep_size(old)
        else:
            prepared.move_to_end(name)
        return p

    def _emit(meta, payload):
        name1, fact1, name2, fact2 = meta
        m, sim, grid12, grid21 = payload
        # disp1 carries the flow toward image 1 (2->1 grids), disp2 toward
        # image 2 (reference: compute_match_graph.py:178-187).
        with accum.span("proto_emit"):
            out_pairs.append(
                protos.PairMatches(
                    name1,
                    float(fact1),
                    name2,
                    float(fact2),
                    m.astype(np.uint32),
                    sim.astype(np.float32),
                    disp1=grid21,
                    disp2=grid12,
                )
            )

    def _drain(limit: int) -> None:
        while len(queue) > limit:
            meta, item, ready = queue.popleft()
            if not ready:
                item = refiner.finalize_pair(item)
            _emit(meta, item)

    stream = None
    if fused:
        from .stream import MatchRefineStream

        stream = MatchRefineStream(refiner, accum=accum)

    feats1 = None
    for pair_idx, (name1, name2) in enumerate(pairs):
        if name1 != cached_name1:
            cached_name1 = name1
            image1, fact1, feats1 = _get(name1)
        image2, fact2, feats2 = _get(name2)
        if pair_idx + 1 < len(pairs):
            nxt = pairs[pair_idx + 1][1]
            if nxt not in prefetched and nxt not in loaded:
                prefetched[nxt] = pool.submit(_load, nxt)

        meta = (name1, fact1, name2, fact2)
        if feats1.num_features > 0 and feats2.num_features > 0:
            # Keypoints live at original resolution; bring them to the
            # matching resolution (reference: compute_match_graph.py:127-131).
            kps1 = feats1.xy / fact1
            kps2 = feats2.xy / fact2
            if fused:
                stream.add_pair(
                    meta,
                    name1, _prep(name1, image1), kps1, feats1.descriptors,
                    name2, _prep(name2, image2), kps2, feats2.descriptors,
                    method.matcher, method.threshold,
                )
                for smeta, payload in stream.ready():
                    _emit(smeta, payload)
            else:
                m, sim = matchers.match(
                    feats1.descriptors, feats2.descriptors, method.matcher, method.threshold
                )
                if skip_refinement or m.shape[0] == 0:
                    grid12 = np.zeros((m.shape[0], 3, 3, 2), dtype=np.float32)
                    grid21 = np.zeros((m.shape[0], 3, 3, 2), dtype=np.float32)
                else:
                    grid12, grid21 = refiner.refine_matches(
                        _prep(name1, image1), kps1, _prep(name2, image2), kps2, m
                    )
                queue.append((meta, (m, sim, grid12, grid21), True))
        else:
            if fused:
                stream.add_empty_pair(meta)
            else:
                z = np.zeros((0, 3, 3, 2), dtype=np.float32)
                queue.append(
                    (meta, (np.zeros((0, 2), np.int64), np.zeros(0, np.float32), z, z), True)
                )
        _drain(PIPELINE_DEPTH)

        if progress and (pair_idx + 1) % 25 == 0:
            rate = (pair_idx + 1) / (time.time() - t0)
            print(
                f"[match-graph] {pair_idx + 1}/{len(pairs)} pairs ({rate:.2f} pairs/s)",
                file=sys.stderr,
                flush=True,
            )
        if pair_idx % dump_interval == dump_interval - 1:
            if fused:
                for smeta, payload in stream.flush():
                    _emit(smeta, payload)
            _drain(0)
            _flush(final=False)

    if fused:
        for smeta, payload in stream.flush():
            _emit(smeta, payload)
        stream.close()
    _drain(0)
    pool.shutdown(wait=False)
    _flush(final=part_idx == -1)
    accum.add("stage_total", time.time() - t0)
    if sub_spans is not None:
        sub_spans.update(accum.report())
        if stream is not None:
            # Rows the CNN actually refined: ALL mutual-NN matches, i.e.
            # more than the inlier count geometric verification later
            # reports — stage throughput must divide by this.
            sub_spans["n_refined_matches"] = int(stream.refined_rows)
    if progress:
        print(f"[match-graph] breakdown: {accum.report()}", file=sys.stderr)
    if refiner is not None and getattr(refiner, "regrown_pairs", 0):
        print(
            f"[match-graph] {refiner.regrown_pairs} pairs exceeded the "
            f"initial match capacity ({max_matches}) and were re-dispatched "
            "at a larger one (no matches dropped)",
            file=sys.stderr,
        )
    return written


def main(argv=None) -> None:
    from ..utils.platform import select_platform

    select_platform()
    parser = argparse.ArgumentParser(description="match graph + two-view refinement")
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--match_list_file", required=True)
    parser.add_argument("--method_name", required=True)
    parser.add_argument("--output_file", required=True)
    parser.add_argument("--batch_size", type=int, default=DEFAULT_BATCH_SIZE)
    parser.add_argument(
        "--max_matches",
        type=int,
        default=2048,
        help="initial per-pair match capacity (auto-grows on overflow; "
        "never drops matches)",
    )
    parser.add_argument("--checkpoint", default=None, help="optional torch checkpoint.pth")
    parser.add_argument("--max_edge", type=int, default=None)
    parser.add_argument("--max_sum_edges", type=int, default=None)
    parser.add_argument("--matcher", default=None, choices=["similarity", "ratio"])
    parser.add_argument(
        "--fine_mode",
        default="crop",
        choices=["grid", "crop"],
        help="fine-pass formulation: 'crop' (TPU-fast, backbone once per "
        "65px crop; default) or 'grid' (reference-parity 9-patch grid)",
    )
    parser.add_argument("--threshold", type=float, default=None)
    args = parser.parse_args(argv)

    method = get_method(args.method_name)
    # CLI overrides for custom methods.
    overrides = {
        k: v
        for k, v in dict(
            max_edge=args.max_edge,
            max_sum_edges=args.max_sum_edges,
            matcher=args.matcher,
            threshold=args.threshold,
        ).items()
        if v is not None
    }
    if overrides:
        import dataclasses

        method = dataclasses.replace(method, **overrides)

    skip = "SKIP_REFINEMENT" in os.environ
    refiner = None
    if not skip:
        variables = None
        if args.checkpoint:
            from ..models.checkpoint import load_any

            variables = load_any(args.checkpoint)
        refiner = TwoViewRefiner(
            variables=variables,
            batch_size=args.batch_size,
            fine_mode=args.fine_mode,
        )

    compute_match_graph(
        args.image_path,
        args.match_list_file,
        method,
        args.output_file,
        refiner=refiner,
        batch_size=args.batch_size,
        skip_refinement=skip,
        max_matches=args.max_matches,
    )


if __name__ == "__main__":
    main()
