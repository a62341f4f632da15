"""TurboRANS-QUAD (order-3 4-byte wire, turbo/quad.py) tests.

Quad recodes byte groups as 4-byte super-symbols (capped 256-id alphabet +
escapes) so each decode step writes one full output word per lane (spc=1).
Tests: host twin, device kernels byte-exact vs the twin (interpret mode),
escapes, three-way dispatch, corruption, mesh parity.
"""
import numpy as np
import pytest

from finitestateentropy_tpu.turbo.quad import (
    FLAG_QUAD, QUAD_TABLELOG, quad_compress, quad_decompress, quad_plan,
    parse_quad_group, prep_quad_group)
from finitestateentropy_tpu.utils import generate_proba


def _p80(n):
    raw = generate_proba(80)
    return bytes((raw * ((n // len(raw)) + 2))[:n])


def _escape_corpus(n, seed=13):
    """>256 distinct quads with <1% escaping (n >= 1<<16: 120 rares of
    each 1 count under the 1% cap needs n/4 >= 12800 quads)."""
    assert n >= 1 << 16
    rng = np.random.default_rng(seed)
    hot = rng.integers(0, 8, n // 4, dtype=np.uint32) * 0x01010101
    rare_at = rng.choice(n // 4, size=260, replace=False)
    hot[rare_at] = (np.arange(260) * 9719 + 77).astype(np.uint32)
    return hot.astype("<u4").tobytes()[:n]


class TestTwin:
    def test_roundtrip_p80(self):
        data = _p80(1 << 16)
        blob = quad_compress(data)
        assert blob is not None
        assert quad_decompress(blob) == data

    @pytest.mark.parametrize("tail", [1, 2, 3])
    def test_roundtrip_ragged_tail(self, tail):
        data = _p80((1 << 14) + tail)
        assert quad_decompress(quad_compress(data)) == data

    @pytest.mark.parametrize("n", [9000, 7000, 12288 + 1])
    def test_roundtrip_odd_step_counts(self, n):
        """Quad groups pad to 1024 ids, so the steptots row count T can be
        ODD — the FLAG_ROWS4 nibble packer silently broadcast-corrupted
        those sections until r5 (the byte/pair wires always have even T,
        so only quad reached this).  Also exercises the native decoder's
        odd-T section skip."""
        data = _p80(n)
        blob = quad_compress(data)
        assert blob is not None
        assert quad_decompress(blob) == data
        from finitestateentropy_tpu import native
        if native.available():
            assert native.rans_decompress_native(blob) == data

    def test_roundtrip_escapes(self):
        data = _escape_corpus(1 << 16)
        plan = quad_plan(data)
        assert plan is not None and plan["esc_id"] is not None
        blob = quad_compress(data)
        (_n, _cs, _tl, flags, *_), _ = parse_quad_group(blob)
        assert flags & FLAG_QUAD
        assert quad_decompress(blob) == data

    def test_ineligible_wide_alphabet(self):
        assert quad_compress(generate_proba(14)[: 1 << 16]) is None

    def test_tiny_and_constant(self):
        assert quad_compress(b"abc") is None
        assert quad_compress(b"abcd" * 4096) is None  # single quad id

    def test_ratio_calibration_points(self):
        # guards the measured dispatch constants (tools/probe_r5.py):
        # quad@11 out-compresses pair@9 on p80 (8.13 vs 8.07 at 1 MiB),
        # and quad@10 (the speed default) stays within PAIR_RATIO_GIVE of
        # the byte wire so the auto dispatch can pick it
        from finitestateentropy_tpu.turbo.api import PAIR_RATIO_GIVE
        from finitestateentropy_tpu.turbo.pair import pair_compress
        from finitestateentropy_tpu.turbo.rans import rans_compress
        data = _p80(1 << 20)
        assert len(quad_compress(data, table_log=11)) < len(pair_compress(data))
        q10 = quad_compress(data, table_log=10)
        byte = rans_compress(data)
        assert len(q10) <= len(byte) * (1 + PAIR_RATIO_GIVE)


class TestCorruption:
    def test_payload_flip_detected(self):
        blob = bytearray(quad_compress(_p80(1 << 14)))
        blob[-7] ^= 0x40
        with pytest.raises(ValueError):
            quad_decompress(bytes(blob))

    def test_missing_steptots_rejected(self):
        blob = bytearray(quad_compress(_p80(1 << 14)))
        blob[13] &= ~4 & 0xFF  # clear FLAG_STEPTOTS
        with pytest.raises(ValueError):
            parse_quad_group(bytes(blob))

    def test_escape_pos_out_of_range(self):
        import struct
        data = _escape_corpus(1 << 16)
        blob = bytearray(quad_compress(data))
        from finitestateentropy_tpu.turbo.rans import _HDR
        _m, _n, _cs, _tl, _fl, nc_len = _HDR.unpack_from(bytes(blob), 0)
        (_g), _ = parse_quad_group(bytes(blob))
        max_sv = _g[5]
        pos = _HDR.size + nc_len + (-nc_len % 4) + 4 * (max_sv + 1)
        struct.pack_into("<I", blob, pos + 4, 1 << 30)
        with pytest.raises(ValueError):
            quad_decompress(bytes(blob))


class TestDeviceKernels:
    def test_device_encode_decode_exact(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 16)
        dev = turbo_compress_device(data, group_size=1 << 16,
                                    interpret=True, quad=1)
        assert dev == quad_compress(data, table_log=QUAD_TABLELOG)
        assert turbo_decompress_device(dev, interpret=True) == data

    @pytest.mark.parametrize("tlog", [9, 11])
    def test_device_tlogs(self, tlog):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 15)
        dev = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                    quad=1, quad_table_log=tlog)
        assert dev == quad_compress(data, table_log=tlog)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_escapes(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _escape_corpus(1 << 16)
        dev = turbo_compress_device(data, group_size=1 << 16, interpret=True,
                                    quad=1)
        assert dev == quad_compress(data, table_log=QUAD_TABLELOG)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_corrupt_payload_flags(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        dev = bytearray(turbo_compress_device(_p80(1 << 15),
                                              group_size=1 << 15,
                                              interpret=True, quad=1))
        dev[-9] ^= 0x10
        with pytest.raises(ValueError):
            turbo_decompress_device(bytes(dev), interpret=True)


class TestDispatch:
    def test_auto_picks_quad_on_skewed(self):
        # p90 at 64 KiB: the quad estimate is within the give of the best
        # candidate (on p80 that happens from ~1 MiB groups, where the
        # ~1.5 KiB LUT/ncount overhead amortizes — too slow for an
        # interpret-mode test)
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        raw = generate_proba(90)
        data = bytes((raw * 2)[: 1 << 16])
        blob = turbo_compress_device(data, group_size=1 << 16,
                                     interpret=True)
        g, _ = parse_rans_group(blob)
        assert len(g) == 11 and g[3] & FLAG_QUAD

    def test_pick_wire_p80_1mib_is_quad(self):
        # the headline operating point: dispatch math only (no kernels)
        from finitestateentropy_tpu.turbo.api import _pick_wire, _prep_group
        from finitestateentropy_tpu.turbo.pair import prep_pair_group
        data = np.frombuffer(_p80(1 << 20), np.uint8)
        prep = _prep_group(data, 10)
        assert _pick_wire(data, prep, 10, prep_pair_group(data),
                          prep_quad_group(data), -1, -1) == "quad"

    def test_quad_off_falls_to_pair(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.pair import FLAG_PAIR
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        blob = turbo_compress_device(_p80(1 << 15), group_size=1 << 15,
                                     interpret=True, quad=0)
        g, _ = parse_rans_group(blob)
        assert len(g) == 11 and g[3] & FLAG_PAIR

    def test_ratio_mode_disables_quad(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        blob = turbo_compress_device(_p80(1 << 15), group_size=1 << 15,
                                     interpret=True, steptots=False)
        g, _ = parse_rans_group(blob)
        assert not (len(g) == 11 and g[3] & FLAG_QUAD)

    def test_native_decodes_quad_frames(self):
        from finitestateentropy_tpu import native
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        if not native.available():
            pytest.skip("native library unavailable")
        gs = 1 << 14
        data = _p80(gs) + generate_proba(14)[:gs]
        blob = turbo_compress_device(data, group_size=gs, interpret=True)
        assert native.rans_decompress_native(blob) == data


def test_windowed_quad_interpret_parity():
    """The HBM-windowed quad kernel (spc=1, S=128 — the production
    dispatch for >= 512 KiB quad groups) must byte-match the twin in
    interpret mode."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device,
                                                  _window_dispatch)
    data = _p80(1 << 19)
    # 512 KiB -> 128K quads -> 128 steps: windowed-eligible
    assert _window_dispatch(0, 128, 64, 10, 2, False, quad=True)[0] == 8
    dev = turbo_compress_device(data, group_size=1 << 19, interpret=True,
                                quad=1)
    assert dev == quad_compress(data, table_log=QUAD_TABLELOG)
    assert turbo_decompress_device(dev, interpret=True) == data


class TestMesh:
    def test_mesh_quad_roundtrip_matches_single(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 16) * 2
        single = turbo_compress_device(data, group_size=1 << 16,
                                       interpret=True, quad=1)
        meshed = turbo_compress_device(data, group_size=1 << 16,
                                       interpret=True, quad=1, mesh=8)
        assert meshed == single
        assert turbo_decompress_device(meshed, interpret=True, mesh=8) == data
