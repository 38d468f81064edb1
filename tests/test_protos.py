"""Golden tests: lfr_tpu proto codecs vs the canonical protobuf library."""

import numpy as np
import pytest

from lfr_tpu.io import protos, wire
from proto_reference import MatchingFile, SolutionFile


def _random_pair(rng, n_matches, name1="img_a.jpg", name2="img_b.jpg", zero_grids=False):
    matches = rng.integers(0, 5000, size=(n_matches, 2)).astype(np.uint32)
    # Force index 0 to appear (proto3 default-skipping edge case).
    if n_matches:
        matches[0, 0] = 0
    sims = rng.random(n_matches).astype(np.float32)
    if n_matches:
        sims[-1] = 0.0
    if zero_grids:
        disp1 = np.zeros((n_matches, 3, 3, 2), dtype=np.float32)
        disp2 = np.zeros((n_matches, 3, 3, 2), dtype=np.float32)
    else:
        disp1 = rng.standard_normal((n_matches, 3, 3, 2)).astype(np.float32)
        disp2 = rng.standard_normal((n_matches, 3, 3, 2)).astype(np.float32)
        if n_matches:
            disp1[0, 0, 0, 0] = 0.0  # single-zero-component displacement
            disp2[0, 1, 1, 1] = 0.0
    return protos.PairMatches(name1, 1.5, name2, 1.0, matches, sims, disp1, disp2)


def _to_reference(pairs):
    mf = MatchingFile()
    for p in pairs:
        pp = mf.image_pairs.add()
        pp.image_name1 = p.image_name1
        pp.fact1 = p.fact1
        pp.image_name2 = p.image_name2
        pp.fact2 = p.fact2
        for k in range(p.num_matches):
            m = pp.matches.add()
            m.feature_idx1 = int(p.matches[k, 0])
            m.feature_idx2 = int(p.matches[k, 1])
            m.similarity = float(p.similarities[k])
            for gi in range(3):
                for gj in range(3):
                    d = m.disp1.add()
                    d.di = float(p.disp1[k, gi, gj, 0])
                    d.dj = float(p.disp1[k, gi, gj, 1])
                    d = m.disp2.add()
                    d.di = float(p.disp2[k, gi, gj, 0])
                    d.dj = float(p.disp2[k, gi, gj, 1])
    return mf


def test_varint_columns_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 2**14 - 1, 2**14, 2**21, 2**32 - 1], dtype=np.uint64)
    data, mask = wire.varint_columns(vals, max_bytes=5)
    for i, v in enumerate(vals):
        raw = bytes(data[i][mask[i]])
        assert raw == wire.encode_varint(int(v))
        dec, _ = wire.decode_varint(raw, 0)
        assert dec == int(v)


def test_matching_file_bytes_match_protobuf():
    rng = np.random.default_rng(0)
    pairs = [
        _random_pair(rng, 17),
        _random_pair(rng, 0, "empty1.png", "empty2.png"),
        _random_pair(rng, 5, zero_grids=True),
    ]
    ours_py = protos.encode_matching_file(pairs, use_native=False)
    ours_default = protos.encode_matching_file(pairs)
    theirs = _to_reference(pairs).SerializeToString(deterministic=True)
    assert ours_py == theirs
    assert ours_default == theirs


def test_matching_file_roundtrip():
    rng = np.random.default_rng(1)
    pairs = [_random_pair(rng, 64), _random_pair(rng, 3, zero_grids=True)]
    decoded = protos.decode_matching_file(protos.encode_matching_file(pairs))
    assert len(decoded) == len(pairs)
    for a, b in zip(pairs, decoded):
        assert a.image_name1 == b.image_name1
        assert a.image_name2 == b.image_name2
        assert a.fact1 == pytest.approx(b.fact1)
        np.testing.assert_array_equal(a.matches, b.matches)
        np.testing.assert_allclose(a.similarities, b.similarities, rtol=0)
        np.testing.assert_allclose(a.disp1, b.disp1, rtol=0)
        np.testing.assert_allclose(a.disp2, b.disp2, rtol=0)


def test_decode_protobuf_encoded():
    rng = np.random.default_rng(2)
    pairs = [_random_pair(rng, 9)]
    blob = _to_reference(pairs).SerializeToString()
    decoded = protos.decode_matching_file(blob)
    np.testing.assert_array_equal(decoded[0].matches, pairs[0].matches)
    np.testing.assert_allclose(decoded[0].disp2, pairs[0].disp2)


def test_solution_file_bytes_match_protobuf():
    rng = np.random.default_rng(3)
    images = []
    for i in range(3):
        m = int(rng.integers(0, 50))
        idx = rng.integers(0, 10000, size=m).astype(np.uint32)
        disp = rng.standard_normal((m, 2)).astype(np.float32)
        if m:
            idx[0] = 0
            disp[0, 0] = 0.0
        images.append(protos.ImageSolution(f"im{i}.jpg", 2.0, idx, disp))

    ours = protos.encode_solution_file(images)

    sf = SolutionFile()
    for img in images:
        ip = sf.images.add()
        ip.image_name = img.image_name
        ip.fact = img.fact
        for k in range(img.feature_indices.shape[0]):
            d = ip.displacements.add()
            d.feature_idx = int(img.feature_indices[k])
            d.di = float(img.displacements[k, 0])
            d.dj = float(img.displacements[k, 1])
    assert ours == sf.SerializeToString(deterministic=True)

    decoded = protos.decode_solution_file(ours)
    for a, b in zip(images, decoded):
        assert a.image_name == b.image_name
        np.testing.assert_array_equal(a.feature_indices, b.feature_indices)
        np.testing.assert_allclose(a.displacements, b.displacements)


def test_part_files(tmp_path):
    rng = np.random.default_rng(4)
    base = tmp_path / "matches.pb"
    p0 = [_random_pair(rng, 4)]
    p1 = [_random_pair(rng, 6, "c.jpg", "d.jpg")]
    protos.write_matching_file(str(base) + ".part.0", p0)
    protos.write_matching_file(str(base) + ".part.1", p1)
    pairs = protos.read_matching_file(str(base))
    assert len(pairs) == 2
    assert pairs[1].image_name1 == "c.jpg"


def test_native_decoder_parity():
    pytest.importorskip("ctypes")
    from lfr_tpu.solver.native import decode_matching_file_native

    rng = np.random.default_rng(11)
    pairs = [
        _random_pair(rng, 23),
        _random_pair(rng, 0, "e1.png", "e2.png"),
        _random_pair(rng, 7, zero_grids=True),
    ]
    blob = protos.encode_matching_file(pairs)
    native = decode_matching_file_native(blob)
    if native is None:
        pytest.skip("native library not built")
    python = protos.decode_matching_file(blob, use_native=False)
    assert len(native) == len(python) == 3
    for a, b in zip(native, python):
        assert a.image_name1 == b.image_name1
        assert a.image_name2 == b.image_name2
        assert a.fact1 == pytest.approx(b.fact1)
        np.testing.assert_array_equal(a.matches, b.matches)
        np.testing.assert_allclose(a.similarities, b.similarities, rtol=0)
        np.testing.assert_allclose(a.disp1, b.disp1, rtol=0)
        np.testing.assert_allclose(a.disp2, b.disp2, rtol=0)


def test_native_encoder_byte_parity():
    from lfr_tpu.solver.native import encode_matching_file_native

    rng = np.random.default_rng(12)
    pairs = [
        _random_pair(rng, 31),
        _random_pair(rng, 0, "x.png", "y.png"),
        _random_pair(rng, 5, zero_grids=True),
    ]
    native = encode_matching_file_native(pairs)
    if native is None:
        pytest.skip("native library not built")
    assert native == protos.encode_matching_file(pairs, use_native=False)
