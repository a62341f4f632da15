"""TurboFSE format: host twin round-trips + Pallas kernel vs twin (interpret)."""
import numpy as np
import pytest

from finitestateentropy_tpu.turbo.format import (
    TURBO_LANES,
    _pad_n,
    parse_group,
    turbo_fse_compress,
    turbo_fse_decompress,
)
from finitestateentropy_tpu.utils import generate_proba


def _corpora():
    rng = np.random.default_rng(7)
    return {
        "p80": generate_proba(80)[:65536],
        "p14": generate_proba(14)[:20000],
        "noise": bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),
        "skew": bytes(rng.choice(8, 30000, p=[0.8, 0.1, 0.04, 0.02, 0.02, 0.01, 0.005, 0.005]).astype(np.uint8)),
        "tiny": b"abracadabra" * 10,
        "one": b"Z",
        "rle": b"Q" * 12345,
        "empty": b"",
    }


@pytest.mark.parametrize("name", list(_corpora()))
def test_twin_roundtrip(name):
    data = _corpora()[name]
    blob = turbo_fse_compress(data)
    assert turbo_fse_decompress(blob) == data


def test_ratio_close_to_reference():
    from finitestateentropy_tpu.refimpl.fse import fse_compress

    data = generate_proba(80)  # full 1MB corpus = one realistic group
    blob = turbo_fse_compress(data)
    ref = sum(
        len(fse_compress(data[i : i + 32768]).data)
        for i in range(0, len(data), 32768)
    )
    # interleave tax: 1024 final states (2KB/group, amortized over MB-scale
    # groups) + shared table; stays within 2% at the design group size
    assert len(blob) <= ref * 1.02


def _group_to_arrays(blob):
    g, _ = parse_group(blob)
    assert g.flags == 0
    from finitestateentropy_tpu.turbo.kernels import pack_dtable

    n_pad = _pad_n(g.n_sym)
    t4 = n_pad // TURBO_LANES // 4
    words = np.frombuffer(g.payload, "<u4").astype(np.int32)
    from finitestateentropy_tpu.turbo.kernels import wrows_for
    wrows = wrows_for(len(words))
    stream = np.zeros((1, wrows, 128), np.int32)
    stream.reshape(1, -1)[0, : len(words)] = words
    tbl = pack_dtable(g.norm, g.max_symbol_value, g.table_log)[None]
    init = g.init_states.astype(np.int32).reshape(1, 8, 128)
    cs = np.array([g.csize_bits], np.int32)
    return g, cs, tbl, init, stream, t4, wrows


def test_decode_kernel_interpret_matches_twin():
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.kernels import turbo_fse_decode

    data = generate_proba(80)[:8192]
    blob = turbo_fse_compress(data)
    g, cs, tbl, init, stream, t4, wrows = _group_to_arrays(blob)

    out, err = turbo_fse_decode(
        jnp.asarray(cs), jnp.asarray(tbl), jnp.asarray(init),
        jnp.asarray(stream), t4, wrows, True,
    )
    assert int(np.asarray(err)[0]) == 0
    out_bytes = np.asarray(out)[0].astype("<i4").tobytes()[: g.n_sym]
    assert out_bytes == data


# ---------------------------------------------------------------------------
# TurboRANS (the flagship device codec)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", list(_corpora()))
def test_rans_twin_roundtrip(name):
    from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress

    data = _corpora()[name]
    assert rans_decompress(rans_compress(data)) == data


def test_rans_ratio_parity():
    from finitestateentropy_tpu.refimpl.fse import fse_compress
    from finitestateentropy_tpu.turbo.rans import rans_compress

    data = generate_proba(80)
    blob = rans_compress(data, steptots=False)   # ratio mode
    ref = sum(
        len(fse_compress(data[i : i + 32768]).data)
        for i in range(0, len(data), 32768)
    )
    assert len(blob) <= ref * 1.03  # 16-bit renorm + 4KB states per group
    # speed mode ships ~0.8% of raw as per-step counts
    blob2 = rans_compress(data, steptots=True)
    assert len(blob2) <= ref * 1.03 + len(data) * 0.01


def test_rans_device_kernels_match_twin_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.turbo.rans import rans_compress, rans_decompress

    data = generate_proba(80)[:40960]
    twin = rans_compress(data)
    # byte-wire parity test: pin the byte wire (r5 auto dispatch would
    # pick the pair/quad wires on p80)
    dev = turbo_compress_device(data, group_size=40960, interpret=True,
                                pair=0, quad=0)
    assert dev == twin                          # encoder bit-exact vs twin
    assert turbo_decompress_device(dev, interpret=True) == data
    assert rans_decompress(dev) == data         # twin decodes device frames


def test_rans_device_multigroup_and_fallbacks_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    rng = np.random.default_rng(5)
    data = (
        generate_proba(80)[:20000]
        + b"R" * 9000                            # RLE group
        + bytes(rng.integers(0, 256, 12000, dtype=np.uint8))  # raw group
        + generate_proba(14)[:5000]
    )
    dev = turbo_compress_device(data, group_size=9000, interpret=True)
    assert turbo_decompress_device(dev, interpret=True) == data


def test_rans_device_detects_corruption_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    data = generate_proba(80)[:40960]
    dev = bytearray(turbo_compress_device(data, group_size=40960, interpret=True))
    dev[len(dev) // 2] ^= 0xFF                  # flip payload bits
    with pytest.raises(ValueError):
        turbo_decompress_device(bytes(dev), interpret=True)


def test_rans16_twin_roundtrip_and_device_interpret():
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.rans16 import (
        _pad_n16, parse_rans16_group, rans16_compress, rans16_decompress)
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans16_ctables, pack_rans16_dtable, pack_stream_words,
        rans_decode, rans_encode, stream_word_rows)

    rng = np.random.default_rng(11)
    d = np.clip((rng.pareto(1.2, 20480) * 50).astype(np.int64), 0, 1023).astype(np.uint16)
    blob = rans16_compress(d, steptots=False)  # v1 wire
    assert np.array_equal(rans16_decompress(blob), d)

    (n, csize_hw, tlog, flags, norm, max_sv, init, payload, stots), _ = \
        parse_rans16_group(blob)
    assert flags == 0 and stots is None
    n_pad = _pad_n16(n)
    t2 = n_pad // 2048
    hcap = (n_pad // 128 + 16 + 7) // 8 * 8

    fc, mg = pack_rans16_ctables(norm)
    mfs = int(np.bincount(d).argmax())
    pad = np.full(n_pad, mfs, np.uint16)
    pad[:n] = d
    srcw = pad.view("<u4").view(np.int32).reshape(1, t2 * 8, 128)

    stream, fin, csize, _stots = rans_encode(
        jnp.asarray(fc[None]), jnp.asarray(mg[None]), jnp.asarray(srcw),
        t2, hcap, True, True)
    cs = int(np.asarray(csize)[0])
    assert cs == csize_hw
    got_hw = np.asarray(stream)[0].reshape(-1)[:cs].astype(np.uint16)
    assert np.array_equal(got_hw, np.frombuffer(payload, "<u2"))
    assert np.array_equal(
        np.asarray(fin)[0].reshape(-1).view(np.uint32), init)

    hrows = ((cs + 127) // 128 + 16 + 7) // 8 * 8
    hws = pack_stream_words(payload, stream_word_rows(hrows))[None]
    out, err = rans_decode(
        jnp.asarray(np.array([cs], np.int32)),
        jnp.asarray(pack_rans16_dtable(norm)[None]),
        jnp.asarray(init.view(np.int32).reshape(1, 8, 128)),
        jnp.asarray(hws), t2, hrows, True, True)
    assert int(np.asarray(err)[0]) == 0
    got = np.asarray(out)[0].astype("<i4").reshape(-1).view(np.uint16)[:n]
    assert np.array_equal(got, d)


def test_tablelog_speed_modes_interpret():
    """-M / table_log knob end to end: twin parity + device decode."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.turbo.rans import rans_compress

    data = generate_proba(80)[:100000]
    for tlog in (9, 10):
        blob = turbo_compress_device(data, interpret=True, table_log=tlog,
                                     pair=0, quad=0)
        assert blob == rans_compress(data, table_log=tlog)
        assert turbo_decompress_device(blob, interpret=True) == data


def test_nway_selection_and_group_size_guard():
    from finitestateentropy_tpu.turbo.api import turbo_compress_device
    from finitestateentropy_tpu.turbo.rans_kernels import _pick_nway

    mib = 1 << 20
    assert _pick_nway(1 * mib) == 7       # typical 1 MiB group (r2 budget)
    assert _pick_nway(2 * mib) == 4
    assert _pick_nway(3 * mib) == 3
    assert _pick_nway(5 * mib) == 1       # big (multi-MiB) decode group
    # 2 MiB groups are legal since the chunked encode2 kernel (r2); the
    # VMEM guard moved to >4 MiB (test_large_group_guards_and_tail_split)
    blob = turbo_compress_device(b"x" * 100, group_size=2 * mib,
                                 interpret=True)
    assert blob


def test_rans16_v2_speed_mode_interpret():
    """u16 v2 wire: steptots section + rans_decode_v2(u16=True)."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.rans16 import (
        FLAG_STEPTOTS, _pad_n16, parse_rans16_group, rans16_compress,
        rans16_decompress)
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans16_dtable, pack_stream_words, rans_decode_v2,
        stream_word_rows)

    rng = np.random.default_rng(12)
    d = np.clip((rng.pareto(1.2, 20480) * 50).astype(np.int64), 0, 1023).astype(np.uint16)
    blob = rans16_compress(d)  # steptots default on
    assert np.array_equal(rans16_decompress(blob), d)
    (n, cs, tlog, flags, norm, max_sv, init, payload, stots), _ = \
        parse_rans16_group(blob)
    assert flags == FLAG_STEPTOTS and stots is not None

    n_pad = _pad_n16(n)
    t2 = n_pad // 2048
    hrows = ((cs + 127) // 128 + 16 + 7) // 8 * 8
    hws = pack_stream_words(payload, stream_word_rows(hrows))[None]
    out, err = rans_decode_v2(
        jnp.asarray(np.array([cs], np.int32)),
        jnp.asarray(pack_rans16_dtable(norm)[None]),
        jnp.asarray(init.view(np.int32).reshape(1, 8, 128)),
        jnp.asarray(hws), jnp.asarray(stots.astype(np.int32)[None]),
        t2, hrows, True, tlog, True)
    assert int(np.asarray(err)[0]) == 0
    got = np.asarray(out)[0].astype("<i4").reshape(-1).view(np.uint16)[:n]
    assert np.array_equal(got, d)

    # twin rejects a corrupt steptots section
    bad = bytearray(blob)
    sect_off = 16 + len(blob) - len(blob)  # header
    # locate section: header + padded ncount + 4096B init
    import struct as _st
    nc_len = _st.unpack_from("<IIIBBH", blob, 0)[5]
    sect_off = 16 + nc_len + (-nc_len % 4) + 4096
    bad[sect_off] ^= 1
    with pytest.raises(ValueError):
        rans16_decompress(bytes(bad))


def test_turbo16_device_api_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)
    from finitestateentropy_tpu.turbo.rans16 import rans16_compress

    rng = np.random.default_rng(1)
    d = np.clip((rng.pareto(1.2, 40000) * 50).astype(np.int64), 0, 1023).astype(np.uint16)
    blob = turbo16_compress_device(d, group_syms=16384, interpret=True)
    twin = b"".join(rans16_compress(d[i : i + 16384])
                    for i in range(0, len(d), 16384))
    assert blob == twin
    assert np.array_equal(turbo16_decompress_device(blob, interpret=True), d)
    # RLE + empty groups through the API
    rle = np.full(5000, 286, np.uint16)
    assert np.array_equal(
        turbo16_decompress_device(turbo16_compress_device(rle, interpret=True),
                                  interpret=True), rle)


def test_ratio_mode_device_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.turbo.rans import rans_compress

    data = generate_proba(80)[:40960]
    dev = turbo_compress_device(data, group_size=40960, interpret=True,
                                steptots=False)
    assert dev == rans_compress(data, steptots=False)
    assert turbo_decompress_device(dev, interpret=True) == data


def test_corrupt_steptots_detected_interpret():
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    data = generate_proba(80)[:40960]
    dev = bytearray(turbo_compress_device(data, group_size=40960, interpret=True))
    # the steptots section sits right after the 4 KB init states; flip a count
    from finitestateentropy_tpu.turbo.rans import _HDR

    nc_len = int.from_bytes(dev[14:16], "little")
    sect_off = _HDR.size + (nc_len + (-nc_len % 4)) + 4096
    dev[sect_off + 5] ^= 0x01
    with pytest.raises(ValueError):
        turbo_decompress_device(bytes(dev), interpret=True)


def test_rans_encode2_matches_v1_and_chunks_interpret():
    """Packed-out encode2 (and its multi-chunk path) is byte-identical to
    the original encode kernel on the same inputs."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans_ctables, rans_encode, rans_encode2)

    gsz = 16384
    data = generate_proba(80)[:gsz]
    src = np.frombuffer(data, np.uint8)
    norm, max_sv, ncount, mfs = _prep_group(src)
    n_pad = _pad_n(gsz)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _hrows_cap(n_pad)
    fc, mg = pack_rans_ctables(norm)
    pad = np.full(n_pad, mfs, np.uint8)
    pad[:gsz] = src
    srcw = jnp.asarray(pad.view("<u4").view(np.int32)
                       .reshape(1, t4 * 8, 128))
    fcb, mgb = jnp.asarray(fc[None]), jnp.asarray(mg[None])

    s1, f1, c1, st1 = rans_encode(fcb, mgb, srcw, t4, hcap, True)
    cs = int(c1[0])
    # v1 contract: halfword-expanded; encode2: packed payload words — the
    # wire bytes must agree
    wire1 = (np.asarray(s1)[0].reshape(-1)[:cs].astype(np.uint16)
             .astype("<u2").tobytes())
    for force in (0, 2, 1):   # single chunk, 2 chunks, t4 chunks
        s2, f2, c2, st2 = rans_encode2(fcb, mgb, srcw, t4, hcap, True,
                                       False, 11, True, force)
        assert int(c2[0]) == cs
        wire2 = np.ascontiguousarray(np.asarray(s2)[0]).tobytes()[: 2 * cs]
        assert wire2 == wire1, force
        assert np.array_equal(np.asarray(f2), np.asarray(f1)), force
        assert np.array_equal(np.asarray(st2), np.asarray(st1)), force


def test_large_group_guards_and_tail_split():
    from finitestateentropy_tpu.turbo.api import turbo_compress_device

    with pytest.raises(ValueError, match="VMEM"):
        turbo_compress_device(b"x" * 100, group_size=5 << 20)
    with pytest.raises(ValueError, match="multiple of 1 MiB"):
        turbo_compress_device(b"x" * 100, group_size=(1 << 20) + (1 << 19))


def test_turbo16_big_alphabet_device_interpret():
    """VERDICT r1 item 8: device kernels for fseU16-class symbols in
    1024..4095 (split-table packing; reference allows 4095, fseU16.c:54)."""
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)
    from finitestateentropy_tpu.turbo.rans16 import (rans16_compress,
                                                     rans16_decompress)

    rng = np.random.default_rng(21)
    big = np.clip((rng.pareto(1.0, 12000) * 300).astype(np.int64),
                  0, 4095).astype(np.uint16)
    assert int(big.max()) > 1023      # actually exercises the wide path
    # twin round-trip at the extended alphabet
    blob_t = rans16_compress(big)
    assert np.array_equal(rans16_decompress(blob_t), big)
    # device kernels, both wire modes; device bytes == twin bytes
    for steptots in (True, False):
        dev = turbo16_compress_device(big, interpret=True, steptots=steptots)
        twin = rans16_compress(big, steptots=steptots)
        assert dev == twin
        assert np.array_equal(turbo16_decompress_device(dev, interpret=True),
                              big)
    # mixed alphabets in one stream batch separately and reassemble
    small = np.clip((rng.pareto(1.2, 6000) * 40).astype(np.int64),
                    0, 1000).astype(np.uint16)
    mixed = np.concatenate([small, big])
    dev = turbo16_compress_device(mixed, group_syms=6000, interpret=True)
    assert np.array_equal(turbo16_decompress_device(dev, interpret=True),
                          mixed)


def test_default_wire_tablelogs():
    """r2 defaults: speed wire = tableLog 10 (RANS_SPEED_TABLELOG), ratio
    wire = 11; explicit -M wins."""
    from finitestateentropy_tpu.turbo.rans import (RANS_SPEED_TABLELOG,
                                                   parse_rans_group,
                                                   rans_compress)

    data = generate_proba(80)[:40960]
    g, _ = parse_rans_group(rans_compress(data))
    assert g[2] == RANS_SPEED_TABLELOG == 10
    g, _ = parse_rans_group(rans_compress(data, steptots=False))
    assert g[2] == 11
    g, _ = parse_rans_group(rans_compress(data, table_log=12))
    assert g[2] == 12


def test_rans_encode2_u16_matches_v1_interpret():
    """encode2 with u16 symbols produces the same wire as the v1 kernel
    (the mesh u16 roundtrip wrapper ships encode2)."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
    from finitestateentropy_tpu.turbo.rans16 import _pad_n16
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans16_ctables, rans_encode, rans_encode2)

    rng = np.random.default_rng(31)
    nsym = 6144
    d = np.clip((rng.pareto(1.2, nsym) * 50).astype(np.int64),
                0, 1023).astype(np.uint16)
    count = np.bincount(d, minlength=1024)
    max_sv = int(d.max())
    norm, _tl = fse_normalize_count(11, count[: max_sv + 1], nsym, max_sv)
    fc, mg = pack_rans16_ctables(norm)
    n_pad = _pad_n16(nsym)
    t2 = n_pad // 2048
    hcap = (n_pad // 128 + 16 + 7) // 8 * 8
    mfs = int(count.argmax())
    pad = np.full(n_pad, mfs, np.uint16)
    pad[:nsym] = d
    srcw = jnp.asarray(pad.view("<u4").view(np.int32).reshape(1, t2 * 8, 128))
    fcb, mgb = jnp.asarray(fc[None]), jnp.asarray(mg[None])

    s1, f1, c1, st1 = rans_encode(fcb, mgb, srcw, t2, hcap, True, True)
    cs = int(c1[0])
    wire1 = (np.asarray(s1)[0].reshape(-1)[:cs].astype(np.uint16)
             .astype("<u2").tobytes())
    for force in (0, 1):
        s2, f2, c2, st2 = rans_encode2(fcb, mgb, srcw, t2, hcap, True,
                                       True, 11, True, force)
        assert int(c2[0]) == cs
        wire2 = np.ascontiguousarray(np.asarray(s2)[0]).tobytes()[: 2 * cs]
        assert wire2 == wire1, force
        assert np.array_equal(np.asarray(f2), np.asarray(f1)), force
        assert np.array_equal(np.asarray(st2), np.asarray(st1)), force


def test_rans_encode2_rowloc_matches_flat_interpret():
    """Row-local placement (rans_encode2 rowloc=True) is byte-identical to
    the flat-search kernel: same stream words, finals, csize, steptots —
    including the multi-chunk path and a near-raw corpus."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans_ctables, rans_encode2)

    for proba, gsz, tlog, force in ((80, 16384, 11, 0), (80, 16384, 10, 2),
                                    (2, 8192, 10, 0)):
        data = generate_proba(proba)[:gsz]
        src = np.frombuffer(data, np.uint8)
        norm, max_sv, ncount, mfs = _prep_group(src, tlog)
        n_pad = _pad_n(gsz)
        t4 = n_pad // TURBO_STEP_SYMS
        hcap = _hrows_cap(n_pad)
        fc, mg = pack_rans_ctables(norm)
        pad = np.full(n_pad, mfs, np.uint8)
        pad[:gsz] = src
        srcw = jnp.asarray(pad.view("<u4").view(np.int32)
                           .reshape(1, t4 * 8, 128))
        fcb, mgb = jnp.asarray(fc[None]), jnp.asarray(mg[None])
        s1, f1, c1, st1 = rans_encode2(fcb, mgb, srcw, t4, hcap, True,
                                       False, tlog, True, force)
        s2, f2, c2, st2 = rans_encode2(fcb, mgb, srcw, t4, hcap, True,
                                       False, tlog, True, force, True)
        cs = int(c1[0])
        assert int(c2[0]) == cs, (proba, tlog, force)
        nw = (cs + 1) // 2
        assert np.array_equal(np.asarray(s2)[0].reshape(-1)[:nw],
                              np.asarray(s1)[0].reshape(-1)[:nw]), \
            (proba, tlog, force)
        assert np.array_equal(np.asarray(f2), np.asarray(f1))
        assert np.array_equal(np.asarray(st2), np.asarray(st1))

    # u16 symbols: same row-local placement, 2 steps per supercycle
    from finitestateentropy_tpu.turbo.rans16 import _pad_n16
    from finitestateentropy_tpu.turbo.rans_kernels import pack_rans16_ctables
    from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
    from finitestateentropy_tpu.refimpl.fseu16 import count_u16

    rng = np.random.default_rng(11)
    d = np.clip((rng.pareto(1.2, 16384) * 50).astype(np.int64), 0,
                1023).astype(np.uint16)
    count, max_sv, _mc = count_u16(d, 1023)
    norm, tlog16 = fse_normalize_count(11, count[: max_sv + 1], len(d), max_sv)
    fc16, mg16 = pack_rans16_ctables(norm)
    n_pad = _pad_n16(len(d))
    t2 = n_pad // 2048
    pad = np.full(n_pad, int(np.bincount(d).argmax()), np.uint16)
    pad[: len(d)] = d
    srcw16 = jnp.asarray(pad.view("<u4").view(np.int32).reshape(1, t2 * 8, 128))
    hcap16 = ((n_pad // 128 + 16) + 7) // 8 * 8
    a16 = (jnp.asarray(fc16[None]), jnp.asarray(mg16[None]), srcw16)
    s1, f1, c1, st1 = rans_encode2(*a16, t2, hcap16, True, True, tlog16, True)
    s2, f2, c2, st2 = rans_encode2(*a16, t2, hcap16, True, True, tlog16, True,
                                   0, True)
    cs = int(c1[0])
    assert int(c2[0]) == cs
    nw = (cs + 1) // 2
    assert np.array_equal(np.asarray(s2)[0].reshape(-1)[:nw],
                          np.asarray(s1)[0].reshape(-1)[:nw])
    assert np.array_equal(np.asarray(f2), np.asarray(f1))
    assert np.array_equal(np.asarray(st2), np.asarray(st1))


def _wdec_inputs(nbytes, proba, G):
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans import parse_rans_group, rans_compress
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans_dtable, pack_stream_words, stream_word_rows)

    data = generate_proba(proba)[:nbytes]
    blob = rans_compress(bytes(data), steptots=True)
    (n, cs, tlog, flags, norm, max_sv, init, payload, stots), _ = \
        parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hrows = ((cs + 127) // 128 + 16 + 7) // 8 * 8
    srows = stream_word_rows(hrows)
    T = n_pad // 1024
    args = [jnp.asarray(a) for a in (
        np.full(G, cs, np.int32),
        np.broadcast_to(pack_rans_dtable(norm, tlog), (G, (1 << tlog) // 128, 128)).copy(),
        np.broadcast_to(init.view(np.int32).reshape(8, 128), (G, 8, 128)).copy(),
        np.broadcast_to(pack_stream_words(payload, srows), (G, srows, 128)).copy(),
        np.broadcast_to(stots.astype(np.int32), (G, T, 8)).copy())]
    return args, t4, hrows, tlog, data, n


def test_rans_decode_w_matches_v2_interpret():
    """HBM-windowed decode (double-buffered stream windows, 2 chunks, odd
    batch padded to nway, small stream padded to one window) decodes the
    same bytes as resident v2 with err == 0."""
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS
    from finitestateentropy_tpu.turbo.rans_kernels import (
        rans_decode_v2, rans_decode_w)

    args, t4, hrows, tlog, data, n = _wdec_inputs(256 << 10, 80, 1)
    assert t4 == 64  # 2 chunks at S=32
    o1, e1 = rans_decode_v2(*args, t4, hrows, True, tlog)
    o2, e2 = rans_decode_w(*args, t4, hrows, 2, tlog, 32, True)
    assert not np.asarray(e1).any() and not np.asarray(e2).any()
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.asarray(o2)[0].astype("<i4").tobytes()[:n] == data


def test_rans_decode_w_corruption_flagged_interpret():
    """A flipped mid-stream halfword must set the windowed decoder's
    per-group error flag (final-state check), never crash or overread."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.rans_kernels import rans_decode_w

    args, t4, hrows, tlog, data, n = _wdec_inputs(128 << 10, 80, 1)
    hws = np.asarray(args[3]).copy()
    hws[0, hws.shape[1] // 4, 64] ^= 0x29A
    args[3] = jnp.asarray(hws)
    out, err = rans_decode_w(*args, t4, hrows, 1, tlog, 32, True)
    assert np.asarray(err)[0] != 0


def test_rans_decode_w_u16_interpret():
    """Windowed decode, u16 wire: parity with rans_decode_v2(u16=True)."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.rans16 import (_pad_n16,
                                                     parse_rans16_group,
                                                     rans16_compress)
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans16_dtable, pack_stream_words, rans_decode_v2, rans_decode_w,
        stream_word_rows)

    rng = np.random.default_rng(5)
    n = 131072  # t2 = 64 supercycles -> 2 chunks at S = 64
    d = np.clip((rng.pareto(1.2, n) * 50).astype(np.int64), 0,
                1023).astype(np.uint16)
    blob = rans16_compress(d)
    (n0, cs, tlog, flags, norm, max_sv, init, payload, stots), _ = \
        parse_rans16_group(blob)
    n_pad = _pad_n16(n0)
    t2 = n_pad // 2048
    assert t2 == 64
    hrows = ((cs + 127) // 128 + 16 + 7) // 8 * 8
    hws = pack_stream_words(payload, stream_word_rows(hrows))[None]
    args = (jnp.asarray(np.array([cs], np.int32)),
            jnp.asarray(pack_rans16_dtable(norm)[None]),
            jnp.asarray(init.view(np.int32).reshape(1, 8, 128)),
            jnp.asarray(hws), jnp.asarray(stots.astype(np.int32)[None]))
    o1, e1 = rans_decode_v2(*args, t2, hrows, True, tlog, True)
    o2, e2 = rans_decode_w(*args, t2, hrows, 2, tlog, 64, True, True)
    assert int(np.asarray(e1)[0]) == 0 and not np.asarray(e2).any()
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    got = np.asarray(o2)[0].astype("<i4").reshape(-1).view(np.uint16)[:n0]
    assert np.array_equal(got, d)


def test_sharded_decode_w_matches_v2_interpret():
    """rans_decode_w under shard_map (2-device mesh, one group per shard)
    matches the single-device v2 output."""
    import jax
    from jax.sharding import Mesh

    from finitestateentropy_tpu.parallel.turbo_dp import sharded_turbo_decode_w
    from finitestateentropy_tpu.turbo.rans_kernels import rans_decode_v2

    args, t4, hrows, tlog, data, n = _wdec_inputs(128 << 10, 80, 2)
    o1, e1 = rans_decode_v2(*args, t4, hrows, True, tlog)
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("dp",))
    step = sharded_turbo_decode_w(mesh, t4, hrows, 1, tlog, 32, True)
    o2, e2, any_err = step(*args)
    assert not np.asarray(e1).any() and int(np.asarray(any_err)) == 0
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_rows4_section_pack_roundtrip():
    """FLAG_ROWS4 nibble+escape section: exact pack/unpack including the
    escape marker edge (count == 15 must escape, 14 must not), and the
    size-based fallback when escapes would not pay."""
    from finitestateentropy_tpu.turbo.rans import _pack_rows4, _unpack_rows4

    rng = np.random.default_rng(3)
    tots = rng.integers(0, 14, (64, 8)).astype(np.uint8)
    tots[5, 3] = 15   # escape-marker edge
    tots[6, 0] = 14   # largest in-band value
    tots[63, 7] = 200
    buf = _pack_rows4(tots)
    assert buf is not None
    back, used = _unpack_rows4(buf, 64)
    assert used == len(buf)
    assert np.array_equal(back, tots)
    assert len(buf) < 64 * 8

    # every count >= 15: escapes outgrow the plain wire -> fallback
    assert _pack_rows4(np.full((64, 8), 30, np.uint8)) is None


def test_rows4_wire_roundtrip_and_device_parity():
    """Skewed data emits FLAG_ROWS4 (twin + device paths byte-identical),
    near-flat data falls back to plain FLAG_STEPTOTS; both decode
    everywhere (twin + device kernels)."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.turbo.rans import (FLAG_ROWS4, FLAG_STEPTOTS,
                                                   parse_rans_group,
                                                   rans_compress,
                                                   rans_decompress)

    skew = generate_proba(80)[:32768]
    # pin the byte wire: this test is about the rows4 SECTION format (the
    # r5 auto dispatch would pick the pair/quad wire on p80)
    blob = turbo_compress_device(skew, group_size=32768, interpret=True,
                                 pair=0, quad=0)
    g, _ = parse_rans_group(blob)
    assert g[3] & FLAG_ROWS4
    assert blob == rans_compress(skew, steptots=True)   # twin == device
    assert rans_decompress(blob) == skew
    assert turbo_decompress_device(blob, interpret=True) == skew

    flat = generate_proba(14)[:32768]
    blob2 = turbo_compress_device(flat, group_size=32768, interpret=True)
    g2, _ = parse_rans_group(blob2)
    assert g2[3] & FLAG_STEPTOTS and not (g2[3] & FLAG_ROWS4)
    assert turbo_decompress_device(blob2, interpret=True) == flat


def test_decompress_device_windows_dispatch_interpret():
    """turbo_decompress_device(windows=N) routes eligible rows-wire
    batches through the HBM-windowed kernel and still yields the exact
    bytes; small groups (t4 % 64 != 0) fall back to resident kernels."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    data = generate_proba(80)[: 256 << 10]
    blob = turbo_compress_device(data, group_size=256 << 10, interpret=True)
    assert turbo_decompress_device(blob, interpret=True, windows=2) == data

    small = turbo_compress_device(data[:8192], group_size=8192, interpret=True)
    assert turbo_decompress_device(small, interpret=True, windows=2) == data[:8192]


def test_rans_decode_w_totals_wire_interpret():
    """Windowed decode on the FLAG_TOTALS wire: row offsets recomputed
    in-kernel (2-matmul rank) with the stream windowed from HBM; parity
    with resident v2 and with the rows-wire output."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.rans_kernels import (
        rans_decode_v2, rans_decode_w)

    args, t4, hrows, tlog, data, n = _wdec_inputs(256 << 10, 80, 1)
    totals = jnp.sum(args[4], axis=2).astype(jnp.int32)
    targs = args[:4] + [totals]
    o1, e1 = rans_decode_v2(*targs, t4, hrows, True, tlog)
    o2, e2 = rans_decode_w(*targs, t4, hrows, 2, tlog, 32, True)
    assert not np.asarray(e1).any() and not np.asarray(e2).any()
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.asarray(o2)[0].astype("<i4").tobytes()[:n] == data


def test_turbo16_windows_dispatch_interpret():
    """u16 pipeline with windows=N: eligible batches (t2 % 64 == 0) route
    through the windowed kernel; output matches the input symbols."""
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)

    rng = np.random.default_rng(8)
    n = 131072  # t2 = 64
    d = np.clip((rng.pareto(1.2, n) * 50).astype(np.int64), 0,
                1023).astype(np.uint16)
    blob = turbo16_compress_device(d, interpret=True)
    out = turbo16_decompress_device(blob, interpret=True, windows=2)
    assert np.array_equal(out, d)


def test_rans_decode_w_mixed_groups_interpret():
    """A windowed batch of two DIFFERENT groups (different payload sizes,
    different per-chunk window starts) decodes both correctly in one
    nway=2 launch."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans import parse_rans_group, rans_compress
    from finitestateentropy_tpu.turbo.rans_kernels import (
        pack_rans_dtable, pack_stream_words, rans_decode_w, stream_word_rows)

    datas = [generate_proba(80)[: 128 << 10],
             generate_proba(2)[: 128 << 10]]   # near-raw: ~4x the stream
    parsed = []
    for d in datas:
        g, _ = parse_rans_group(rans_compress(bytes(d), steptots=True))
        parsed.append(g)
    t4 = _pad_n(128 << 10) // TURBO_STEP_SYMS
    cs_max = max(g[1] for g in parsed)
    hrows = ((cs_max + 127) // 128 + 16 + 7) // 8 * 8
    srows = stream_word_rows(hrows)
    T = _pad_n(128 << 10) // 1024
    G = 2
    tlog = parsed[0][2]
    assert parsed[1][2] == tlog
    cs = np.array([g[1] for g in parsed], np.int32)
    tbl = np.stack([pack_rans_dtable(g[4], tlog) for g in parsed])
    init = np.stack([g[6].view(np.int32).reshape(8, 128) for g in parsed])
    hws = np.stack([pack_stream_words(g[7], srows) for g in parsed])
    tots = np.stack([g[8].astype(np.int32) for g in parsed])
    out, err = rans_decode_w(jnp.asarray(cs), jnp.asarray(tbl),
                             jnp.asarray(init), jnp.asarray(hws),
                             jnp.asarray(tots), t4, hrows, 2, tlog, 32, True)
    assert not np.asarray(err).any()
    for j, d in enumerate(datas):
        assert np.asarray(out)[j].astype("<i4").tobytes()[: len(d)] == d
