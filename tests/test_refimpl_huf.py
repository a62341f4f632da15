"""Huff0 twin vs reference CLI and internal consistency (X1/X2 decoders)."""
import numpy as np
import pytest

from finitestateentropy_tpu.refimpl.blocktypes import Kind
from finitestateentropy_tpu.refimpl.hist import hist_count
from finitestateentropy_tpu.refimpl.huf import (
    huf_build_ctable,
    huf_compress,
    huf_decompress,
    huf_decompress_4x1,
    huf_decompress_4x2,
    huf_read_ctable,
    huf_select_decoder,
    huf_write_ctable,
)
from finitestateentropy_tpu.errors import FSEError
from finitestateentropy_tpu.utils import generate_proba
from tests.conftest import requires_ref
from tests.ref_frames import parse_frame_blocks, ref_compress_file


@pytest.mark.parametrize("pct", [80, 14, 2])
@requires_ref
def test_huf_blocks_byte_identical_to_reference(tmp_path, ref_fse, pct):
    data = generate_proba(pct)
    src = tmp_path / "src.bin"
    src.write_bytes(data)
    out = tmp_path / "src.huf"
    ref_compress_file(ref_fse, "-h", src, out)
    blocks = parse_frame_blocks(out.read_bytes())
    pos = 0
    for btype, rsize, payload in blocks:
        chunk = data[pos : pos + rsize]
        pos += rsize
        r = huf_compress(chunk)
        if btype == 0:
            assert r.kind == Kind.COMPRESSED
            assert r.data == payload
            assert huf_decompress(payload, rsize) == chunk
        elif btype == 1:
            assert r.kind == Kind.RAW
        else:
            assert r.kind == Kind.RLE
    assert pos == len(data)


def test_both_decoders_agree():
    """X1 and X2 must decode the same stream identically."""
    rng = np.random.default_rng(5)
    for trial in range(8):
        probs = rng.dirichlet(np.full(40, 0.2))
        syms = rng.choice(40, size=20000, p=probs).astype(np.uint8)
        block = syms.tobytes()
        r = huf_compress(block)
        if r.kind != Kind.COMPRESSED:
            continue
        assert huf_decompress_4x1(r.data, len(block)) == block
        assert huf_decompress_4x2(r.data, len(block)) == block


def test_ctable_header_roundtrip():
    rng = np.random.default_rng(9)
    for _ in range(10):
        probs = rng.dirichlet(np.full(60, 0.3))
        syms = rng.choice(60, size=5000, p=probs).astype(np.uint8)
        count, max_sv, _ = hist_count(syms.tobytes())
        ct = huf_build_ctable(count, max_sv)
        hdr = huf_write_ctable(ct, max_sv)
        ct2, max_sv2, used = huf_read_ctable(hdr)
        assert used == len(hdr)
        assert max_sv2 <= max_sv
        n = max_sv2 + 1
        assert np.array_equal(ct.nb_bits[:n], ct2.nb_bits[:n])
        assert np.array_equal(ct.val[:n], ct2.val[:n])


def test_huf_roundtrip_sizes():
    rng = np.random.default_rng(2)
    for size in [13, 50, 100, 1000, 4095, 32768, 65536, 131072]:
        syms = rng.choice(8, size=size, p=np.r_[0.6, np.full(7, 0.4 / 7)]).astype(np.uint8)
        block = syms.tobytes()
        r = huf_compress(block)
        if r.kind == Kind.COMPRESSED:
            assert huf_decompress(r.data, size) == block


def test_huf_rle_raw_and_selector():
    assert huf_compress(b"\x07" * 5000).kind == Kind.RLE
    noise = np.random.default_rng(1).integers(0, 256, 32768, dtype=np.uint8).tobytes()
    assert huf_compress(noise).kind == Kind.RAW
    # selector: highly compressible big block favors X2, mid-ratio favors X1
    assert huf_select_decoder(32768, 4000) in (0, 1)
    assert huf_select_decoder(32768, 32000) in (0, 1)


def test_huf_garbage_never_crashes():
    rng = np.random.default_rng(21)
    for _ in range(200):
        n = int(rng.integers(2, 400))
        garbage = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            out = huf_decompress(garbage, 32768)
            assert len(out) == 32768
        except (FSEError, IndexError, ValueError):
            pass


def test_huf_truncated_input_fails():
    data = generate_proba(80)[:32768]
    r = huf_compress(data)
    assert r.kind == Kind.COMPRESSED
    for cut in (1, 5, len(r.data) // 2):
        try:
            out = huf_decompress(r.data[:-cut], 32768)
            assert out != data  # must not silently produce the original
        except (FSEError, IndexError, ValueError):
            pass


def test_huf_repeat_table():
    """HUF_repeat flow: second block reuses the first table when told to."""
    data = generate_proba(80)
    b1, b2 = data[:32768], data[32768:65536]
    c1, m1, _ = hist_count(b1)
    t1 = huf_build_ctable(c1, m1)
    r2, t2, used_old2 = huf_compress(b2, old_table=t1, repeat_mode="valid", prefer_repeat=True)
    assert r2.kind == Kind.COMPRESSED
    assert used_old2
    assert t2 is t1  # table carried over
    # without prefer_repeat, the heuristic compares table costs
    r3, t3, used_old3 = huf_compress(b2, old_table=t1, repeat_mode="check")
    assert r3.kind == Kind.COMPRESSED
