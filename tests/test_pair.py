"""TurboRANS-PAIR (order-1 byte-pair wire, turbo/pair.py) tests.

The pair wire recodes byte groups as 2-byte super-symbols over a capped
(<=256 id) alphabet so each decode step moves 2 output bytes through the
same kernel machinery (the HUF X2 move, lib/huf_decompress.c:454-649,
applied to rANS).  Tests: host twin round-trips, device kernels
byte-exact vs the twin in interpret mode, escape handling, the auto
dispatch in turbo/api.py, corruption rejection, and the mesh path.
"""
import numpy as np
import pytest

from finitestateentropy_tpu.turbo.pair import (
    FLAG_PAIR, PAIR_TABLELOG, pair_compress, pair_decompress, pair_plan,
    parse_pair_group, predicted_bits, prep_pair_group)
from finitestateentropy_tpu.utils import generate_proba


def _p80(n):
    raw = generate_proba(80)
    return bytes((raw * ((n // len(raw)) + 2))[:n])


def _escape_corpus(n, seed=3):
    """A corpus whose pair alphabet exceeds 256 but where <2% of pairs
    escape: dominated by 8 hot pairs, salted with 280 distinct rare ones
    (needs n >= 1<<15 so 280 escapes stay under the 2% cap)."""
    assert n >= 1 << 15
    rng = np.random.default_rng(seed)
    hot = rng.integers(0, 8, n // 2, dtype=np.uint16) * 257
    rare_at = rng.choice(n // 2, size=280, replace=False)
    hot[rare_at] = (np.arange(280) * 7 + 300).astype(np.uint16)
    return hot.astype("<u2").tobytes()[:n]


class TestTwin:
    def test_roundtrip_p80(self):
        data = _p80(1 << 16)
        blob = pair_compress(data)
        assert blob is not None
        assert pair_decompress(blob) == data

    def test_roundtrip_odd_length(self):
        data = _p80((1 << 14) + 1)
        blob = pair_compress(data)
        assert pair_decompress(blob) == data

    def test_roundtrip_escapes(self):
        data = _escape_corpus(1 << 15)
        plan = pair_plan(data)
        assert plan is not None and plan["esc_id"] is not None
        blob = pair_compress(data)
        assert blob is not None
        (_n, _cs, _tl, flags, *_rest), _ = parse_pair_group(blob)
        assert flags & 64  # FLAG_PAIRESC
        assert pair_decompress(blob) == data

    def test_ineligible_wide_alphabet(self):
        # proba14 is near-uniform over 256 symbols: ~64K distinct pairs
        raw = generate_proba(14)
        assert pair_plan(raw[: 1 << 16]) is None
        assert pair_compress(raw[: 1 << 16]) is None

    def test_tiny_inputs(self):
        assert pair_compress(b"") is None
        assert pair_compress(b"a") is None
        # single distinct pair -> max_sv == 0 -> byte wire RLEs it
        assert pair_compress(b"ab" * 4096) is None

    def test_ratio_beats_byte_wire_payload(self):
        # order-1 modeling: the pair payload must be no larger than the
        # order-0 byte payload estimate on correlated data
        rng = np.random.default_rng(5)
        # Markov-ish: byte i+1 correlated with byte i
        n = 1 << 15
        a = np.zeros(n, np.uint8)
        a[0] = 7
        steps = rng.integers(0, 3, n)
        a[1:] = np.cumsum(steps[1:]).astype(np.uint8) % 16
        data = a.tobytes()
        blob = pair_compress(data, table_log=10)
        assert blob is not None
        from finitestateentropy_tpu.refimpl.hist import hist_count
        from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
        count, max_sv, _mc = hist_count(a, 255)
        norm, tlog = fse_normalize_count(10, count[: max_sv + 1], n, max_sv)
        byte_payload = predicted_bits(norm, count[: max_sv + 1], tlog) / 8
        (_n, cs, *_), _ = parse_pair_group(blob)
        assert 2 * cs < byte_payload

    def test_steptots_false_wire(self):
        data = _p80(1 << 14)
        blob = pair_compress(data, steptots=False)
        (_n, _cs, _tl, flags, *_rest), _ = parse_pair_group(blob)
        assert not flags & 4
        assert pair_decompress(blob) == data

    def test_predicted_bits_matches_payload(self):
        data = _p80(1 << 16)
        blob = pair_compress(data)
        (_n, cs, tl, _fl, norm, _msv, _init, _pl, _st, _pairs, _esc), _ = \
            parse_pair_group(blob)
        plan = pair_plan(data)
        est = predicted_bits(norm, plan["counts"], tl) / 8
        # est is an upper bound: the 1024 shipped init states absorb up to
        # 16 payload bits each (2 KiB); that credit is lane-count-bound and
        # wire-independent, so it cancels in the _pair_wins comparison
        assert 2 * cs <= est * 1.001
        assert est - 2 * cs <= 2048 + 0.01 * est


class TestCorruption:
    def test_payload_flip_detected(self):
        data = _p80(1 << 14)
        blob = bytearray(pair_compress(data))
        blob[-7] ^= 0x40
        with pytest.raises(ValueError):
            pair_decompress(bytes(blob))

    def test_truncated_lut(self):
        data = _p80(1 << 14)
        blob = pair_compress(data)
        with pytest.raises(ValueError):
            parse_pair_group(blob[:40])

    def test_escape_pos_out_of_range(self):
        data = _escape_corpus(1 << 15)
        blob = bytearray(pair_compress(data))
        (_n, _cs, _tl, _fl, _norm, max_sv, *_), _ = parse_pair_group(bytes(blob))
        # find the escape section: header + padded ncount + padded LUT
        import struct
        from finitestateentropy_tpu.refimpl.ncount import fse_read_ncount
        from finitestateentropy_tpu.turbo.rans import _HDR
        _m, _n2, _cs2, _tl2, _fl2, nc_len = _HDR.unpack_from(bytes(blob), 0)
        pos = _HDR.size + nc_len + (-nc_len % 4)
        pos += 2 * (max_sv + 1) + (-(2 * (max_sv + 1)) % 4)
        struct.pack_into("<I", blob, pos + 4, 1 << 30)  # first esc pos
        with pytest.raises(ValueError):
            pair_decompress(bytes(blob))

    def test_magic_rejected(self):
        data = _p80(1 << 14)
        blob = bytearray(pair_compress(data))
        blob[0] ^= 1
        with pytest.raises(ValueError):
            parse_pair_group(bytes(blob))


class TestDeviceKernels:
    """Interpret-mode Pallas kernels vs the host twin (byte equality)."""

    def test_device_encode_decode_exact(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 16)
        twin = pair_compress(data, table_log=PAIR_TABLELOG)
        dev = turbo_compress_device(data, group_size=1 << 16,
                                    interpret=True, pair=1)
        assert dev == twin
        assert turbo_decompress_device(dev, interpret=True) == data

    @pytest.mark.parametrize("tlog", [9, 10])
    def test_device_tlogs(self, tlog):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 15)
        dev = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                    pair=1, pair_table_log=tlog)
        assert dev == pair_compress(data, table_log=tlog)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_escapes(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _escape_corpus(1 << 15)
        dev = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                    pair=1)
        assert dev == pair_compress(data, table_log=PAIR_TABLELOG)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_v1_wire(self):
        # steptots=False: rank computed in-kernel (rans_decode pair mode)
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 15)
        dev = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                    pair=1, steptots=False)
        assert dev == pair_compress(data, table_log=PAIR_TABLELOG,
                                    steptots=False)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_multi_group_mixed(self):
        # pair-eligible + byte-wire + RLE groups in one stream
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        rng = np.random.default_rng(9)
        gs = 1 << 14
        data = (_p80(gs)                                   # pair
                + bytes(rng.integers(0, 256, gs, dtype=np.uint8))  # raw
                + b"\x42" * gs                             # RLE
                + generate_proba(14)[:gs])                 # byte wire
        dev = turbo_compress_device(data, group_size=gs, interpret=True)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_tiny_group(self):
        # a sub-supercycle group (n_pad16 = 2048 pairs, t2 = 1)
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        rng = np.random.default_rng(11)
        data = rng.choice([65, 66, 67], size=301,
                          p=[0.8, 0.15, 0.05]).astype(np.uint8).tobytes()
        dev = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                    pair=1)
        assert turbo_decompress_device(dev, interpret=True) == data

    def test_device_corrupt_payload_flags(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 15)
        dev = bytearray(turbo_compress_device(data, group_size=1 << 15,
                                              interpret=True, pair=1))
        dev[-9] ^= 0x10
        with pytest.raises(ValueError):
            turbo_decompress_device(bytes(dev), interpret=True)


class TestDispatch:
    def test_auto_picks_pair_on_skewed(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        data = _p80(1 << 15)
        blob = turbo_compress_device(data, group_size=1 << 15, interpret=True)
        g, _ = parse_rans_group(blob)
        assert len(g) == 11  # pair group

    def test_auto_skips_pair_on_wide_alphabet(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        data = generate_proba(14)[: 1 << 15]
        blob = turbo_compress_device(data, group_size=1 << 15, interpret=True)
        g, _ = parse_rans_group(blob)
        assert len(g) == 9  # byte group

    def test_pair_off(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        data = _p80(1 << 15)
        blob = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                     pair=0)
        g, _ = parse_rans_group(blob)
        assert len(g) == 9

    def test_totals_only_disables_pair(self):
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        data = _p80(1 << 15)
        blob = turbo_compress_device(data, group_size=1 << 15, interpret=True,
                                     totals_only=True)
        g, _ = parse_rans_group(blob)
        assert len(g) == 9

    def test_pair_give_is_bounded(self):
        # the dispatch may trade at most PAIR_RATIO_GIVE predicted size
        from finitestateentropy_tpu.turbo.api import (PAIR_RATIO_GIVE,
                                                      turbo_compress_device)
        data = _p80(1 << 16)
        pb = turbo_compress_device(data, group_size=1 << 16, interpret=True)
        bb = turbo_compress_device(data, group_size=1 << 16, interpret=True,
                                   pair=0)
        assert len(pb) <= len(bb) * (1 + PAIR_RATIO_GIVE) + 512


class TestNativeInterop:
    def test_native_decodes_pair_frames(self):
        """A frame with pair + byte + RLE groups from the device path must
        stay decodable on native-only hosts (the wrapper routes FLAG_PAIR
        groups to the host twin)."""
        from finitestateentropy_tpu import native
        from finitestateentropy_tpu.turbo.api import turbo_compress_device
        if not native.available():
            pytest.skip("native library unavailable")
        gs = 1 << 14
        data = (_p80(gs)                    # pair-eligible
                + generate_proba(14)[:gs]   # byte wire
                + b"\x07" * gs              # RLE
                + _p80(gs))                 # pair again (two spans)
        blob = turbo_compress_device(data, group_size=gs, interpret=True)
        from finitestateentropy_tpu.turbo.rans import parse_rans_group
        g, _ = parse_rans_group(blob)
        assert len(g) == 11, "first group should be pair (precondition)"
        assert native.rans_decompress_native(blob) == data


class TestMesh:
    def test_mesh_pair_roundtrip_matches_single(self):
        from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                      turbo_decompress_device)
        data = _p80(1 << 16) * 2  # 2 groups
        single = turbo_compress_device(data, group_size=1 << 16,
                                       interpret=True, pair=1)
        meshed = turbo_compress_device(data, group_size=1 << 16,
                                       interpret=True, pair=1, mesh=8)
        assert meshed == single
        assert turbo_decompress_device(meshed, interpret=True, mesh=8) == data
