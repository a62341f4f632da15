"""One-past-end canary checks (reference fuzzer.c:225-227 pattern).

The reference fuzzers plant a byte just past the destination end and verify
it after every call.  Host-side, the riskiest surface here is the native C
codec (raw pointers); device-side, the encode kernel's predicated pull
writes and the batched group layout (no group may scribble into its
neighbor's rows).
"""
import ctypes

import numpy as np
import pytest

from finitestateentropy_tpu import native
from finitestateentropy_tpu.utils import generate_proba

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CANARY = 0xA5


def _canary_buf(size: int, slack: int = 16) -> ctypes.Array:
    buf = ctypes.create_string_buffer(size + slack)
    ctypes.memset(buf, CANARY, size + slack)
    return buf


def test_native_decompress_canary():
    data = generate_proba(80)[:300000]
    blob = native.rans_compress_native(data, group_size=65536)
    lib = native._load()
    total = len(data)
    dst = _canary_buf(total)
    r = lib.tfse_rans_decompress(blob, len(blob), dst, total, 1)
    assert r == total
    assert dst.raw[:total] == data
    assert dst.raw[total:] == bytes([CANARY]) * 16  # one-past-end untouched


def test_native_compress_canary_and_exact_cap():
    data = generate_proba(14)[:200000]
    blob = native.rans_compress_native(data, group_size=65536)
    lib = native._load()
    # exact-capacity compress: same bytes, canary untouched
    dst = _canary_buf(len(blob))
    r = lib.tfse_rans_compress(data, len(data), 65536, dst, len(blob), 1)
    assert r == len(blob)
    assert dst.raw[: len(blob)] == blob
    assert dst.raw[len(blob) :] == bytes([CANARY]) * 16


def test_native_compress_too_small_dst_fails_cleanly():
    """fuzzer.c:212-220: compressing into cSize-1 must fail, not overflow."""
    data = generate_proba(80)[:131072]
    blob = native.rans_compress_native(data, group_size=65536)
    lib = native._load()
    dst = _canary_buf(len(blob) - 1)
    r = lib.tfse_rans_compress(data, len(data), 65536, dst, len(blob) - 1, 1)
    assert r < 0
    assert dst.raw[len(blob) - 1 :] == bytes([CANARY]) * 16


def test_native_decompress_too_small_dst_fails_cleanly():
    data = generate_proba(80)[:131072]
    blob = native.rans_compress_native(data, group_size=65536)
    lib = native._load()
    dst = _canary_buf(len(data) - 1)
    r = lib.tfse_rans_decompress(blob, len(blob), dst, len(data) - 1, 1)
    assert r < 0
    assert dst.raw[len(data) - 1 :] == bytes([CANARY]) * 16


def test_device_encode_group_isolation():
    """Batched encode: each group's stream must equal its solo encode —
    the pull passes' predicated writes never cross group row boundaries."""
    from finitestateentropy_tpu.turbo.api import turbo_compress_device
    from finitestateentropy_tpu.turbo.rans import parse_rans_group

    rng = np.random.default_rng(5)
    p80 = generate_proba(80)
    parts = [p80[:65536], bytes(rng.integers(0, 4, 65536, np.uint8)),
             p80[65536:131072]]
    batched = turbo_compress_device(b"".join(parts), group_size=65536,
                                    interpret=True)
    solo = b"".join(turbo_compress_device(p, group_size=65536, interpret=True)
                    for p in parts)
    assert batched == solo
    # and every group parses cleanly on its own
    pos = 0
    while pos < len(batched):
        _, used = parse_rans_group(batched[pos:])
        pos += used
    assert pos == len(batched)


def test_device_decode_tail_padding_is_deterministic():
    """Decode out rows past n hold the mfs padding (no garbage / no OOB):
    a ragged group round-trips and its padded tail is exactly mfs."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.turbo.rans import parse_rans_group

    data = generate_proba(80)[: 65536 + 1234]  # ragged final group
    blob = turbo_compress_device(data, group_size=65536, interpret=True)
    assert turbo_decompress_device(blob, interpret=True) == data
