"""Bit-exactness of the FSE host twin vs the reference CLI, plus unit tests
mirroring the reference fuzzer's deterministic checks (programs/fuzzer.c:282-464).
"""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from finitestateentropy_tpu.refimpl.fse import (
    fse_compress,
    fse_decompress,
    fse_compress_using_ctable,
    fse_decompress_using_dtable,
)
from finitestateentropy_tpu.refimpl.hist import hist_count
from finitestateentropy_tpu.refimpl.ncount import fse_read_ncount, fse_write_ncount
from finitestateentropy_tpu.refimpl.norm import fse_normalize_count, fse_optimal_table_log
from finitestateentropy_tpu.refimpl.tables import (
    build_ctable,
    build_ctable_raw,
    build_dtable,
    build_dtable_raw,
)
from finitestateentropy_tpu.refimpl.blocktypes import Kind
from finitestateentropy_tpu.errors import FSEError
from finitestateentropy_tpu.utils import generate_proba
from tests.conftest import requires_ref
from tests.ref_frames import parse_frame_blocks, ref_compress_file


@pytest.mark.parametrize("pct", [80, 14, 2])
@requires_ref
def test_fse_blocks_byte_identical_to_reference(tmp_path, ref_fse, pct):
    data = generate_proba(pct)
    src = tmp_path / "src.bin"
    src.write_bytes(data)
    out = tmp_path / "src.fse"
    ref_compress_file(ref_fse, "-e", src, out)
    blocks = parse_frame_blocks(out.read_bytes())
    assert len(blocks) == 32
    pos = 0
    for btype, rsize, payload in blocks:
        chunk = data[pos : pos + rsize]
        pos += rsize
        r = fse_compress(chunk)
        if btype == 0:
            assert r.kind == Kind.COMPRESSED
            assert r.data == payload, f"block at {pos} differs"
            # and our decoder decodes the reference's bytes
            assert fse_decompress(payload, rsize) == chunk
        elif btype == 1:
            assert r.kind == Kind.RAW
        else:
            assert r.kind == Kind.RLE
    assert pos == len(data)


def test_fse_roundtrip_random_sizes():
    rng = np.random.default_rng(7)
    for size in [3, 4, 5, 6, 7, 8, 9, 13, 100, 1000, 32768, 65536]:
        # skewed distribution so it's compressible
        syms = rng.choice(16, size=size, p=np.r_[0.5, np.full(15, 0.5 / 15)]).astype(np.uint8)
        block = syms.tobytes()
        r = fse_compress(block)
        if r.kind == Kind.COMPRESSED:
            assert fse_decompress(r.data, size) == block
        else:
            assert r.kind in (Kind.RAW, Kind.RLE)


def test_fse_rle_and_incompressible():
    assert fse_compress(b"\x42" * 1000).kind == Kind.RLE
    noise = np.random.default_rng(0).integers(0, 256, 32768, dtype=np.uint8).tobytes()
    assert fse_compress(noise).kind == Kind.RAW


def test_ncount_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n_sym = int(rng.integers(2, 80))
        counts = rng.integers(0, 1000, n_sym)
        counts[rng.integers(0, n_sym)] += 3000
        counts = np.maximum(counts, 0).astype(np.uint32)
        total = int(counts.sum())
        max_sv = n_sym - 1
        while counts[max_sv] == 0:
            max_sv -= 1
        counts = counts[: max_sv + 1]
        tlog = fse_optimal_table_log(11, total, max_sv)
        norm, tlog = fse_normalize_count(tlog, counts, total, max_sv)
        assert norm is not None
        assert sum(abs(x) for x in norm) == 1 << tlog
        hdr = fse_write_ncount(norm, max_sv, tlog)
        norm2, sv2, tlog2, used = fse_read_ncount(hdr)
        assert used == len(hdr)
        assert tlog2 == tlog
        assert sv2 <= max_sv
        assert norm2 == list(norm[: sv2 + 1])


def test_normalize_corner_cases_from_fuzzer():
    # fuzzer.c:333-355 crafted distributions that overflowed internal ranks
    tlog = 10
    count = np.zeros(3, dtype=np.uint32)
    count[0] = 337
    count[1] = 137
    count[2] = 97
    total = int(count.sum())
    norm, _ = fse_normalize_count(tlog, count, total, 2)
    assert sum(abs(x) for x in norm) == 1 << tlog

    # normalizeM2 divide-by-zero trigger territory: many tiny counts
    count = np.ones(200, dtype=np.uint32)
    count[0] = 10000
    norm, _ = fse_normalize_count(10, count, int(count.sum()), 199)
    assert sum(abs(x) for x in norm) == 1 << 10


def test_raw_table_roundtrip():
    # fuzzer.c:420-444: raw CTable/DTable round-trip at nbBits=8
    data = bytes(range(256)) * 8
    ct = build_ctable_raw(8)
    payload = fse_compress_using_ctable(data, ct)
    assert payload
    dt = build_dtable_raw(8)
    assert fse_decompress_using_dtable(payload, dt, len(data)) == data


def test_decompress_garbage_never_crashes():
    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(1, 300))
        garbage = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            out = fse_decompress(garbage, 1 << 16)
            assert len(out) <= 1 << 16
        except FSEError:
            pass  # any typed error is acceptable; crashes/overruns are not


def test_known_8byte_corner_sample():
    # fuzzer.c:446-458 — a historically problematic tiny sample
    sample = bytes([0, 1, 1, 1, 1, 1, 1, 1])
    r = fse_compress(sample)
    if r.kind == Kind.COMPRESSED:
        assert fse_decompress(r.data, 8) == sample
