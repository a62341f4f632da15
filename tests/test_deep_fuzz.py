"""Reference-scale randomized fuzzing of the turbo wires.

The reference fuzzers default to 128K iterations over <=128 KiB slices
(programs/fuzzer.c:54,187-202); the regular CI suite (test_fuzz.py) runs a
scaled-down gate.  This suite is the deep/nightly mode: FSE_TPU_FUZZ_ITERS
(>= 10000 in the nightly job, `make deepfuzz`) drives iteration counts
across the five corpora and the full turbo wire matrix — three section
formats (rows/rows4, totals, none) x bytes/u16 symbols x single and
chunked (multi-MiB) groups.  The native host codec carries the bulk
iterations when available (same wire bytes as the kernels, differential-
tested in test_native.py); the numpy twin covers the wire modes the native
encoder doesn't emit.  Seeds are fixed per sub-test and every failure
message carries the iteration + seed for replay (fuzzer.c:484,553).
"""
import os
import struct

import numpy as np
import pytest

from finitestateentropy_tpu.errors import FSEError

SEED = 20260818
N_ITERS = int(os.environ.get("FSE_TPU_FUZZ_ITERS", "30") or 30)
MAX_SLICE = 128 * 1024
DEEP = N_ITERS >= 1000


def _corpora(rng):
    size = 1 << 18

    def proba(p):
        out = rng.random(size)
        sym = np.zeros(size, np.uint8)
        k = 0
        while True:
            mask = out >= p
            if not mask.any() or k > 50:
                break
            sym[mask] += 1
            out[mask] = (out[mask] - p) / (1 - p)
            k += 1
        return sym.tobytes()

    return [
        rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
        proba(0.01),
        proba(0.15),
        proba(0.90),
        b"\x5A" * size,
    ]


@pytest.fixture(scope="module")
def corpora():
    return _corpora(np.random.default_rng(SEED))


def _slice(rng, corpora):
    pick = rng.integers(0, 8)
    data = corpora[2] if pick < 7 else corpora[int(rng.integers(0, 5))]
    n = int(rng.integers(1, MAX_SLICE))
    off = int(rng.integers(0, len(data) - n))
    return data[off : off + n]


def test_deep_fuzz_native_bytes(corpora):
    """Bulk roundtrip + bitflip iterations through the native codec (both
    ratio and speed wires), reference-fuzzer shaped."""
    from finitestateentropy_tpu import native

    if not native.available():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(SEED + 1)
    for it in range(N_ITERS):
        src = _slice(rng, corpora)
        speed = bool(rng.integers(0, 2))
        blob = (native.rans_compress2_native(src) if speed
                else native.rans_compress_native(src))
        out = native.rans_decompress_native(blob)
        assert out == src, f"iter {it} seed {SEED + 1} speed={speed}"
        if len(blob) > 6200 and bool(rng.integers(0, 2)):
            b = bytearray(blob)
            b[-int(rng.integers(1, 16))] ^= 1 << int(rng.integers(0, 8))
            try:
                o2 = native.rans_decompress_native(bytes(b))
                assert o2 != src or bytes(b) == blob, \
                    f"iter {it}: corrupted stream decoded to original"
            except (ValueError, FSEError, RuntimeError):
                pass


def test_deep_fuzz_twin_wire_modes(corpora):
    """The numpy twin covers the wire modes across section formats and
    chunked groups; scaled to ~N/50 because the twin is ~50x slower than
    the native path it differentially matches."""
    from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress

    from finitestateentropy_tpu.turbo.rans import FLAG_RAW, FLAG_RLE, _HDR

    rng = np.random.default_rng(SEED + 2)
    iters = max(6, N_ITERS // 50)
    modes = [{}, {"steptots": False}, {"totals_only": True}]
    for it in range(iters):
        src = _slice(rng, corpora)
        kw = modes[it % 3]
        blob = rans_compress(src, **kw)
        assert rans_decompress(blob) == src, \
            f"iter {it} seed {SEED + 2} kw={kw}"
        flags = _HDR.unpack_from(blob)[4]
        if len(blob) > 6200 and not flags & (FLAG_RAW | FLAG_RLE):
            # Corruption contract (reference parity): group-level
            # detection is PROBABILISTIC (final-state checks; the
            # reference's decoders also pass some corrupt streams, which
            # is why the frame CRC exists, fileio.c:609-614).  A flipped
            # payload byte must raise OR decode to different bytes —
            # never crash, never silently return the original.
            b = bytearray(blob)
            b[-int(rng.integers(1, 16))] ^= 0x20
            try:
                out2 = rans_decompress(bytes(b))
                assert out2 != src, \
                    f"iter {it}: flipped payload decoded to the original"
            except (ValueError, FSEError):
                pass


def test_deep_fuzz_u16(corpora):
    from finitestateentropy_tpu import native
    from finitestateentropy_tpu.turbo.rans16 import (rans16_compress,
                                                     rans16_decompress)

    rng = np.random.default_rng(SEED + 3)
    have_native = native.available()
    iters = N_ITERS if have_native else max(6, N_ITERS // 50)
    for it in range(iters):
        n = int(rng.integers(1, MAX_SLICE // 2))
        max_val = int(rng.choice([255, 700, 1023, 2048, 4095]))
        s = np.clip((rng.pareto(1.0, n) * max_val / 10).astype(np.int64),
                    0, max_val).astype(np.uint16)
        if have_native and max_val <= 1023 and bool(rng.integers(0, 2)):
            blob = native.rans16_compress_native(s)
            out = native.rans16_decompress_native(blob)
            assert np.array_equal(out, s), f"iter {it} seed {SEED + 3} native"
        else:
            blob = rans16_compress(s)
            assert np.array_equal(rans16_decompress(blob), s), \
                f"iter {it} seed {SEED + 3}"


@pytest.mark.skipif(not DEEP, reason="chunked-group deep fuzz only at "
                                     "FSE_TPU_FUZZ_ITERS >= 1000")
def test_deep_fuzz_chunked_groups():
    """Multi-MiB groups exercise the encode kernel's chunked src path and
    the decoder's multi-chunk cursors; sizes straddle the 1 MiB chunk
    boundary."""
    from finitestateentropy_tpu import native
    from finitestateentropy_tpu.utils import generate_proba

    if not native.available():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(SEED + 4)
    base = generate_proba(80) + generate_proba(14)
    data = (base * 5)[: 5 << 20]
    for it in range(max(4, N_ITERS // 500)):
        n = int(rng.integers((1 << 20) - 3, (4 << 20) + 3))
        src = data[:n]
        for gs in (1 << 20, 2 << 20, 4 << 20):
            blob = native.rans_compress_native(src, group_size=gs)
            assert native.rans_decompress_native(blob) == src, \
                f"iter {it} seed {SEED + 4} gs={gs} n={n}"


def test_deep_fuzz_pair(corpora):
    """Multi-byte wires (turbo/pair.py order-1 + turbo/quad.py order-3)
    twin fuzz at ~N/50 (twin-speed scaled, like the other twin suites):
    eligibility dispatch, roundtrip (incl. quad's odd step counts),
    escapes, native decode parity, and the corruption contract."""
    from finitestateentropy_tpu import native
    from finitestateentropy_tpu.turbo.pair import pair_compress, pair_decompress
    from finitestateentropy_tpu.turbo.quad import quad_compress, quad_decompress

    have_native = native.available()
    rng = np.random.default_rng(SEED + 6)
    iters = max(6, N_ITERS // 50)
    for it in range(iters):
        src = _slice(rng, corpora)
        tlog = int(rng.choice([9, 10, 11]))
        if rng.integers(0, 2):
            blob = quad_compress(src, table_log=tlog)
            dec = quad_decompress
        else:
            blob = pair_compress(src, table_log=tlog,
                                 steptots=bool(rng.integers(0, 2)))
            dec = pair_decompress
        if blob is None:
            continue  # ineligible (wide alphabet / tiny / constant)
        assert dec(blob) == src, f"iter {it} seed {SEED + 6}"
        if have_native and it % 4 == 0:
            assert native.rans_decompress_native(blob) == src, \
                f"iter {it}: native multibyte decode diverged"
        if len(blob) > 6200:
            b = bytearray(blob)
            b[-int(rng.integers(1, 16))] ^= 1 << int(rng.integers(0, 8))
            try:
                out2 = dec(bytes(b))
                assert out2 != src, \
                    f"iter {it}: flipped payload decoded to original"
            except (ValueError, FSEError):
                pass


def test_deep_fuzz_device_kernels(corpora):
    """Interpret-mode Pallas kernel fuzz at ~N/500 (VERDICT r4 next #5):
    the device decode's ERROR-FLAG surface (the corruption_detected
    analogue) gets randomized coverage, not just the dedicated corruption
    tests — byte and pair wires, roundtrip + payload flips."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    rng = np.random.default_rng(SEED + 7)
    # interpret mode is ~1000x hardware and every (shape, tlog, csize-rows)
    # combination recompiles, so iterations are capped: 1 at the default
    # CI scale, 24 (~20 min) at nightly/reference scale — the BULK 128K
    # randomized iterations run through the native codec and twins above,
    # matching the reference fuzzer's CPU-speed economics (fuzzer.c:54)
    for it in range(min(max(1, N_ITERS // 500), 24)):
        n = int(rng.integers(1024, 24 * 1024))
        data = corpora[2] if rng.integers(0, 4) else corpora[3]
        off = int(rng.integers(0, len(data) - n))
        src = data[off : off + n]
        pair_mode = int(rng.choice([-1, 0, 1]))
        blob = turbo_compress_device(src, group_size=1 << 15, interpret=True,
                                     pair=pair_mode)
        assert turbo_decompress_device(blob, interpret=True) == src, \
            f"iter {it} seed {SEED + 7} pair={pair_mode}"
        if len(blob) > 6200:
            b = bytearray(blob)
            b[-int(rng.integers(1, 16))] ^= 1 << int(rng.integers(0, 8))
            try:
                out2 = turbo_decompress_device(bytes(b), interpret=True)
                assert out2 != src, \
                    f"iter {it}: flipped payload decoded to original " \
                    f"(pair={pair_mode})"
            except (ValueError, FSEError):
                pass  # device error flags raised — the expected path


def test_deep_fuzz_garbage_headers():
    """Garbage after a valid magic must never crash or overread — at depth
    (fuzzer.c:252-262 ran 128K of these)."""
    from finitestateentropy_tpu.turbo.rans import RANS_MAGIC, rans_decompress
    from finitestateentropy_tpu.turbo.rans16 import RANS16_MAGIC, rans16_decompress

    rng = np.random.default_rng(SEED + 5)
    for it in range(N_ITERS):
        body = rng.integers(0, 256, int(rng.integers(8, 9000)),
                            dtype=np.uint8).tobytes()
        for magic, dec in ((RANS_MAGIC, rans_decompress),
                           (RANS16_MAGIC, rans16_decompress)):
            blob = struct.pack("<I", magic) + body
            try:
                out = dec(blob)
                assert len(out) < 1 << 24
            except (ValueError, FSEError, AssertionError, IndexError,
                    struct.error):
                pass
