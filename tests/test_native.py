"""Native C++ TurboRANS codec: byte-equality with the numpy twin."""
import numpy as np
import pytest

from finitestateentropy_tpu import native
from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress
from finitestateentropy_tpu.utils import generate_proba

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_matches_twin_bytes():
    data = generate_proba(80)[:300000]
    # the native encoder emits ratio-mode (v1) groups
    assert native.rans_compress_native(data, group_size=len(data)) == \
        rans_compress(data, steptots=False)
    # and decodes speed-mode (v2) groups by skipping the section
    assert native.rans_decompress_native(rans_compress(data)) == data


def test_native_roundtrip_and_cross():
    rng = np.random.default_rng(3)
    cases = [
        generate_proba(80)[:150000],
        generate_proba(14)[:70000],
        bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),  # raw fallback
        b"Q" * 30000,                                        # RLE
        b"",
        b"x",
    ]
    for data in cases:
        blob = native.rans_compress_native(data, group_size=65536)
        assert native.rans_decompress_native(blob) == data
        assert rans_decompress(blob[: _first_group_len(blob)]) == \
            data[:_n_of(blob)] if data else True


def _n_of(blob):
    return int.from_bytes(blob[4:8], "little")


def _first_group_len(blob):
    from finitestateentropy_tpu.turbo.rans import parse_rans_group

    _, used = parse_rans_group(blob)
    return used


def test_native_multigroup_cross_with_twin():
    data = generate_proba(80)[:200000]
    blob_n = native.rans_compress_native(data, group_size=65536)
    # twin group-by-group must produce the identical stream
    twin = b"".join(
        rans_compress(data[i : i + 65536], steptots=False)
        for i in range(0, len(data), 65536)
    )
    assert blob_n == twin


def test_native_threaded_pool():
    """Explicit thread counts produce the identical stream and roundtrip
    (this box is 1-core, so this checks correctness, not scaling)."""
    rng = np.random.default_rng(9)
    data = (generate_proba(80)[:300000] + b"R" * 70000          # RLE group
            + bytes(rng.integers(0, 256, 70000, dtype=np.uint8))  # RAW group
            + generate_proba(14)[:90000])
    ref = native.rans_compress_native(data, group_size=65536, nthreads=1)
    for nt in (2, 4, 0):
        blob = native.rans_compress_native(data, group_size=65536, nthreads=nt)
        assert blob == ref
        assert native.rans_decompress_native(blob, nthreads=nt) == data
    # v2 (speed-mode) sections skipped correctly through the threaded walk
    sped = b"".join(rans_compress(data[i : i + 65536])
                    for i in range(0, len(data), 65536))
    assert native.rans_decompress_native(sped, nthreads=4) == data


def test_native_corruption_detected():
    data = generate_proba(80)[:100000]
    blob = bytearray(native.rans_compress_native(data, group_size=len(data)))
    blob[-5] ^= 0x20
    with pytest.raises(ValueError):
        native.rans_decompress_native(bytes(blob))


def test_native_decodes_speed_tablelog_frames():
    """r2: the speed-mode default moved to tableLog 10; the native decoder
    accepts any wire tableLog in [5, 13] (it rebuilds tables per group)."""
    from finitestateentropy_tpu import native
    from finitestateentropy_tpu.turbo.rans import rans_compress
    from finitestateentropy_tpu.utils import generate_proba

    if not native.available():
        pytest.skip("native library unavailable")
    data = generate_proba(80)[:131072]
    for tlog in (0, 9, 10, 12):   # 0 = mode default (10)
        blob = rans_compress(data, table_log=tlog)
        assert native.rans_decompress_native(blob) == data, tlog


def test_native_u16_decoder_matches_twin():
    """Native u16 decoder (tfse_rans16_decompress) reads twin-encoded
    frames across the alphabet range, fallbacks, and multi-group blobs."""
    from finitestateentropy_tpu.turbo.rans16 import rans16_compress

    rng = np.random.default_rng(0)
    small = np.clip((rng.pareto(1.2, 1 << 17) * 50).astype(np.int64), 0,
                    1023).astype(np.uint16)
    big = np.clip((rng.pareto(1.1, 1 << 16) * 500).astype(np.int64), 0,
                  4095).astype(np.uint16)
    rle = np.full(30000, 77, np.uint16)
    for d in (small, big, rle):
        blob = rans16_compress(d)
        assert np.array_equal(native.rans16_decompress_native(blob), d)
    parts = [small, big, rle, small[: 1 << 14]]
    blob = b"".join(rans16_compress(p) for p in parts)
    out = native.rans16_decompress_native(blob, nthreads=2)
    assert np.array_equal(out, np.concatenate(parts))
    # corruption must error, not crash
    bad = bytearray(rans16_compress(small))
    bad[-7] ^= 0x40
    with pytest.raises(ValueError):
        native.rans16_decompress_native(bytes(bad))


def test_native_u16_encoder_byte_identical_to_twin():
    """tfse_rans16_compress emits frames byte-identical to
    rans16_compress(steptots=False) across alphabets and fallbacks, and
    the native decoder round-trips them."""
    from finitestateentropy_tpu.turbo.rans16 import rans16_compress

    rng = np.random.default_rng(1)
    cases = (
        np.clip((rng.pareto(1.2, 1 << 16) * 50).astype(np.int64), 0,
                1023).astype(np.uint16),
        np.clip((rng.pareto(1.1, 1 << 15) * 500).astype(np.int64), 0,
                4095).astype(np.uint16),
        np.full(3000, 9, np.uint16),
        rng.integers(0, 1024, 20000).astype(np.uint16),
    )
    for d in cases:
        nb = native.rans16_compress_native(d)
        assert nb == rans16_compress(d, steptots=False)
        assert np.array_equal(native.rans16_decompress_native(nb), d)
    # multi-group with a ragged tail
    d = cases[0]
    nb = native.rans16_compress_native(d, group_syms=20000, nthreads=2)
    tw = b"".join(rans16_compress(d[i : i + 20000], steptots=False)
                  for i in range(0, len(d), 20000))
    assert nb == tw


def test_u16codec_turbo_native_wire_interchange():
    """U16Codec(wire='turbo_native') frames interchange with the device
    wire: native-encoded groups decode through the device path and
    device-encoded (v2) groups decode through the native path."""
    from finitestateentropy_tpu.models.u16_codec import U16Codec
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)

    rng = np.random.default_rng(2)
    d = np.clip((rng.pareto(1.2, 1 << 15) * 50).astype(np.int64), 0,
                1023).astype(np.uint16)
    c = U16Codec(wire="turbo_native")
    blobs = c.compress_streams([d])
    assert np.array_equal(c.decompress_streams([(blobs[0], len(d))])[0], d)
    # cross: native frame -> device decoder
    assert np.array_equal(
        turbo16_decompress_device(blobs[0], interpret=True)[: len(d)], d)
    # cross: device (v2) frame -> native decoder
    dev = turbo16_compress_device(d, interpret=True)
    assert np.array_equal(
        c.decompress_streams([(dev, len(d))])[0], d)


def test_native_speed_mode_encoder_byte_identical_to_twin():
    """tfse_rans_compress2 (FLAG_STEPTOTS + ROWS4 when smaller) emits
    frames byte-identical to rans_compress(steptots=True) across rows4
    (p80), plain-rows fallback (p14), raw, RLE, and ragged sizes — so a
    host can encode at native speed into frames the device decodes with
    the fused-rank v2/windowed kernels."""
    from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress

    rng = np.random.default_rng(4)
    cases = (
        generate_proba(80)[: 1 << 18],
        generate_proba(80)[:40000],
        generate_proba(14)[: 1 << 17],
        bytes(rng.integers(0, 256, 1 << 16, dtype=np.uint8)),
        b"Q" * 50000,
        b"abracadabra" * 40,
    )
    for d in cases:
        nb = native.rans_compress2_native(d, group_size=1 << 20)
        assert nb == rans_compress(d, steptots=True)
        assert rans_decompress(nb) == d
        assert native.rans_decompress_native(nb) == d
    # multi-group with ragged tail, explicit tableLog 11
    d = generate_proba(80)[:300000]
    nb = native.rans_compress2_native(d, group_size=1 << 17, table_log=11,
                                      nthreads=2)
    tw = b"".join(rans_compress(d[i : i + (1 << 17)], table_log=11,
                                steptots=True)
                  for i in range(0, len(d), 1 << 17))
    assert nb == tw


def test_cli_native_speed_frames(tmp_path, monkeypatch):
    """-T on a no-TPU host emits speed-mode (rows4) frames byte-identical
    to the twin; --ratio emits sectionless v1; both decode."""
    import jax

    from finitestateentropy_tpu.cli import main
    from finitestateentropy_tpu.turbo.rans import (FLAG_ROWS4,
                                                   parse_rans_group,
                                                   rans_compress)
    from finitestateentropy_tpu.utils import generate_proba

    data = generate_proba(80)[:200000]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    sp, rt, out = (tmp_path / n for n in ("s.tfse", "r.tfse", "o.bin"))
    assert main(["-T", "-f", str(src), str(sp)]) == 0
    g, _ = parse_rans_group(sp.read_bytes())
    assert g[3] & FLAG_ROWS4
    assert sp.read_bytes() == rans_compress(data, steptots=True)
    assert main(["-T", "--ratio", "-f", str(src), str(rt)]) == 0
    assert parse_rans_group(rt.read_bytes())[0][3] == 0
    assert main(["-T", "-d", "-f", str(sp), str(out)]) == 0
    assert out.read_bytes() == data
