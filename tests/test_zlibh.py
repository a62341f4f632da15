"""zlibh decoder vs frames produced by the reference CLI's -z codec."""
import subprocess

import numpy as np
import pytest

from tests.conftest import requires_ref


@requires_ref
@pytest.mark.parametrize("kind", ["p20", "p90ish", "text", "noise"])
def test_zlibh_frames_decode(tmp_path, ref_fse, ref_probagen, kind):
    rng = np.random.default_rng(42)
    if kind == "p20":
        subprocess.run([ref_probagen, "20%"], cwd=tmp_path, check=True,
                       capture_output=True)
        data = (tmp_path / "proba.bin").read_bytes()[:200000]
    elif kind == "p90ish":
        data = bytes(rng.choice(4, 150000, p=[0.9, 0.06, 0.03, 0.01]).astype(np.uint8))
    elif kind == "text":
        data = (b"the quick brown fox jumps over the lazy dog. " * 3000)[:120000]
    else:
        data = bytes(rng.integers(0, 256, 100000, dtype=np.uint8))

    src = tmp_path / "in.bin"
    src.write_bytes(data)
    comp = tmp_path / "in.zlh"
    subprocess.run([ref_fse, "-z", "-f", str(src), str(comp)], check=True,
                   capture_output=True)

    from finitestateentropy_tpu.io.frame import decompress_bytes

    assert decompress_bytes(comp.read_bytes()) == data


@requires_ref
def test_zlibh_small_and_rle_blocks(tmp_path, ref_fse):
    for data in (b"x" * 50000, b"ab" * 25000, b"z"):
        src = tmp_path / "in.bin"
        src.write_bytes(data)
        comp = tmp_path / "in.zlh"
        subprocess.run([ref_fse, "-z", "-f", str(src), str(comp)], check=True,
                       capture_output=True)
        from finitestateentropy_tpu.io.frame import decompress_bytes

        assert decompress_bytes(comp.read_bytes()) == data


@requires_ref
@pytest.mark.parametrize("kind", ["p20", "noise", "text", "rle"])
def test_zlibh_encode_byte_identical(tmp_path, ref_fse, ref_probagen, kind):
    rng = np.random.default_rng(9)
    if kind == "p20":
        subprocess.run([ref_probagen, "20%"], cwd=tmp_path, check=True,
                       capture_output=True)
        data = (tmp_path / "proba.bin").read_bytes()[:300000]
    elif kind == "noise":
        data = bytes(rng.integers(0, 256, 200000, dtype=np.uint8))
    elif kind == "text":
        data = (b"few symbols: abcabcababc " * 10000)[:200000]
    else:
        data = b"Q" * 150000

    src = tmp_path / "in.bin"
    src.write_bytes(data)
    ref_out = tmp_path / "ref.zlh"
    subprocess.run([ref_fse, "-z", "-f", str(src), str(ref_out)], check=True,
                   capture_output=True)

    from finitestateentropy_tpu.io.frame import compress_bytes

    assert compress_bytes(data, codec="zlibh") == ref_out.read_bytes()


def test_zlibh_decode_rejects_oversized_output():
    """ADVICE r1: a stream whose end-of-block arrives right after the literal
    that already filled dst_size must raise, not return dst_size+1 bytes."""
    from finitestateentropy_tpu.errors import CorruptionError
    from finitestateentropy_tpu.refimpl.zlibh import (zlibh_compress,
                                                      zlibh_decompress)

    data = b"entropy coding streams " * 50
    payload = zlibh_compress(data)
    assert zlibh_decompress(payload, len(data)) == data
    with pytest.raises(CorruptionError):
        zlibh_decompress(payload, len(data) - 1)
