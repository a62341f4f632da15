"""Resumable job layer: interrupt/resume, idempotence, verification."""
import json

import numpy as np
import pytest

from finitestateentropy_tpu.io.jobs import (MANIFEST_SUFFIX,
                                            compress_file_resumable,
                                            job_status, verify_job)
from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress
from finitestateentropy_tpu.utils import generate_proba


def _compress_group(chunk: bytes) -> bytes:
    return rans_compress(chunk)


def test_resume_produces_identical_stream(tmp_path):
    data = generate_proba(80)[:300000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)

    # one-shot
    full = tmp_path / "full.tfse"
    compress_file_resumable(src, full, group_size=65536,
                            compress_group=_compress_group)
    assert job_status(full)["done"]

    # interrupted after 2 groups, then resumed
    part = tmp_path / "part.tfse"
    m1 = compress_file_resumable(src, part, group_size=65536,
                                 compress_group=_compress_group, max_groups=2)
    assert m1.groups_done == 2
    st = job_status(part)
    assert not st["done"] and st["next_group"] == 2
    m2 = compress_file_resumable(src, part, group_size=65536,
                                 compress_group=_compress_group)
    assert job_status(part)["done"]
    assert part.read_bytes() == full.read_bytes()
    assert rans_decompress_all(part.read_bytes()) == data


def rans_decompress_all(blob: bytes) -> bytes:
    from finitestateentropy_tpu.turbo.rans import parse_rans_group

    out = b""
    pos = 0
    while pos < len(blob):
        g, used = parse_rans_group(blob[pos:])
        out += rans_decompress(blob[pos : pos + used])
        pos += used
    return out


def test_partial_tail_is_truncated_on_resume(tmp_path):
    data = generate_proba(14)[:200000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.tfse"
    compress_file_resumable(src, dst, group_size=65536,
                            compress_group=_compress_group, max_groups=1)
    # simulate a crash mid-write of the next group: garbage tail beyond the
    # manifest's out_bytes
    with open(dst, "ab") as f:
        f.write(b"\xde\xad\xbe\xef" * 10)
    compress_file_resumable(src, dst, group_size=65536,
                            compress_group=_compress_group)
    assert rans_decompress_all(dst.read_bytes()) == data


def test_manifest_mismatch_rejected(tmp_path):
    data = generate_proba(80)[:100000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.tfse"
    compress_file_resumable(src, dst, group_size=65536,
                            compress_group=_compress_group, max_groups=1)
    with pytest.raises(ValueError):
        compress_file_resumable(src, dst, group_size=32768,
                                compress_group=_compress_group)


def test_verify_job(tmp_path):
    data = generate_proba(80)[:150000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.tfse"
    compress_file_resumable(src, dst, group_size=65536,
                            compress_group=_compress_group)
    assert verify_job(dst, decompress=rans_decompress_all)
    # corrupt the stream -> decode raises (failure detection)
    blob = bytearray(dst.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    dst.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        verify_job(dst, decompress=rans_decompress_all)


def test_empty_source_file(tmp_path):
    """ADVICE r1: empty source must not crash the native default path."""
    src = tmp_path / "empty.bin"
    src.write_bytes(b"")
    dst = tmp_path / "empty.tfse"
    m = compress_file_resumable(src, dst)  # default native compress_group
    assert job_status(dst)["done"]
    assert m.bytes_in == 0
    assert rans_decompress_all(dst.read_bytes()) == b""
    assert verify_job(dst, decompress=rans_decompress_all)
