"""FSE_U16 twin vs the reference u16_oracle binary + round-trip properties."""
import subprocess

import numpy as np
import pytest

from finitestateentropy_tpu.refimpl.blocktypes import Kind
from finitestateentropy_tpu.refimpl.fseu16 import (
    count_u16,
    fse_compress_u16,
    fse_decompress_u16,
)
from finitestateentropy_tpu.errors import FSEError
from tests.conftest import REF_BIN, requires_ref


def _oracle_compress(raw: bytes):
    p = subprocess.run([str(REF_BIN / "u16_oracle"), "c"], input=raw, capture_output=True)
    assert p.returncode == 0
    return int(p.stderr.split()[0]), p.stdout


def _oracle_decompress(data: bytes, nsym: int) -> bytes:
    p = subprocess.run(
        [str(REF_BIN / "u16_oracle"), "d", str(nsym)], input=data, capture_output=True
    )
    assert p.returncode == 0
    return p.stdout


def _dist_workload(seed, n, mod=286):
    """Synthetic distance stream (fseDist-style log2-bucketed distances)."""
    rng = np.random.default_rng(seed)
    return (rng.pareto(1.2, n) * 8).astype(np.uint16) % mod


@requires_ref
@pytest.mark.parametrize("seed,n", [(0, 20000), (1, 4097), (2, 100), (3, 65536)])
def test_u16_byte_identical_to_oracle(seed, n):
    d = _dist_workload(seed, n)
    raw = d.astype("<u2").tobytes()
    mode, ref = _oracle_compress(raw)
    ours = fse_compress_u16(d)
    if mode > 1:
        assert ours.kind == Kind.COMPRESSED
        assert ours.data == ref
        assert np.array_equal(fse_decompress_u16(ref, n), d)
        assert _oracle_decompress(ours.data, n) == raw
    elif mode == 1:
        assert ours.kind == Kind.RLE
    else:
        assert ours.kind == Kind.RAW


@requires_ref
def test_u16_wide_alphabet():
    rng = np.random.default_rng(7)
    d = rng.integers(0, 286, 30000, dtype=np.uint16)
    d[::3] = 5  # give it skew
    raw = d.astype("<u2").tobytes()
    mode, ref = _oracle_compress(raw)
    ours = fse_compress_u16(d)
    if mode > 1:
        assert ours.data == ref


def test_u16_roundtrip_and_rle():
    d = np.full(1000, 77, dtype=np.uint16)
    assert fse_compress_u16(d).kind == Kind.RLE
    d = _dist_workload(9, 12345)
    r = fse_compress_u16(d)
    assert r.kind == Kind.COMPRESSED
    assert np.array_equal(fse_decompress_u16(r.data, 12345), d)


def test_u16_rejects_oversized_symbols():
    d = np.array([5, 10, 300], dtype=np.uint16)
    with pytest.raises(FSEError):
        count_u16(d, 286 if False else 200)
    # symbol > default maxSV
    d = np.array([5, 4000], dtype=np.uint16)
    with pytest.raises(FSEError):
        fse_compress_u16(d)


def test_u16_garbage_decode():
    rng = np.random.default_rng(31)
    for _ in range(100):
        g = rng.integers(0, 256, int(rng.integers(2, 200)), dtype=np.uint8).tobytes()
        try:
            out = fse_decompress_u16(g, 4096)
            assert len(out) <= 4096
        except (FSEError, IndexError, ValueError):
            pass
