"""Auto-select and U16 model pipelines (VERDICT r1 weak #9)."""
import numpy as np
import pytest

from finitestateentropy_tpu.io import frame as fio
from finitestateentropy_tpu.models import AutoTpuCodec, U16Codec, choose_codec
from finitestateentropy_tpu.utils import generate_proba


def test_choose_codec_prefers_fse_on_skewed_data():
    # Proba80: FSE 8.84 vs Huff0 6.38 in the reference (README.md:32-33)
    blocks = fio.split_blocks(generate_proba(80)[:262144], 32768)
    assert choose_codec(blocks) == "fse"


def test_choose_codec_prefers_huf_on_moderate_data():
    # Proba14: FSE 1.91 vs Huff0 1.90 — ratio tie, Huff0 is the faster pick
    blocks = fio.split_blocks(generate_proba(14)[:262144], 32768)
    assert choose_codec(blocks) == "huf"


def test_choose_codec_degenerate_inputs():
    assert choose_codec([]) == "huf"
    assert choose_codec([b"\x00" * 32768]) == "huf"  # pure RLE: choice moot


@pytest.mark.parametrize("pct,expect", [(80, "fse"), (14, "huf")])
def test_auto_codec_frame_roundtrip(pct, expect):
    data = generate_proba(pct)[:131072]
    auto = AutoTpuCodec()
    frame = fio.compress_bytes(data, codec=expect, compressor=auto.compress_blocks)
    assert auto.chosen == expect
    assert fio.decompress_bytes(frame) == data


def test_cli_auto_flag(tmp_path, capsys):
    src = tmp_path / "in.bin"
    src.write_bytes(generate_proba(80)[:131072])
    from finitestateentropy_tpu.cli import main

    dst = tmp_path / "x.fse"
    assert main(["--auto", "-f", str(src), str(dst)]) == 0
    assert "auto: selected fse" in capsys.readouterr().err
    out = tmp_path / "x.out"
    assert main(["-d", "-f", str(dst), str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


def _dist_stream(n, rng):
    # Pareto-style distance stream (the fseU16 workload class)
    v = rng.pareto(1.2, n) * 40
    return np.minimum(v, 1000).astype(np.uint16)


def test_u16_codec_compat_roundtrip():
    rng = np.random.default_rng(7)
    streams = [_dist_stream(5000, rng), np.zeros(100, np.uint16),
               rng.integers(0, 65536, 300, dtype=np.uint16)]  # incompressible
    codec = U16Codec(wire="compat")
    blobs = codec.compress_streams(streams)
    back = codec.decompress_streams(
        [(b, len(s)) for b, s in zip(blobs, streams)])
    for s, o in zip(streams, back):
        assert np.array_equal(s, o)


def test_u16_codec_compat_matches_twin_bytes():
    rng = np.random.default_rng(8)
    s = _dist_stream(4000, rng)
    from finitestateentropy_tpu.refimpl.fseu16 import fse_compress_u16

    blob = U16Codec(wire="compat").compress_streams([s])[0]
    twin = fse_compress_u16(s, max_symbol_value=int(s.max()))
    assert blob[0] == 2 and blob[1:] == twin.data


def test_u16_codec_turbo_roundtrip_interpret():
    rng = np.random.default_rng(9)
    s = _dist_stream(3000, rng)
    codec = U16Codec(wire="turbo", interpret=True)
    blobs = codec.compress_streams([s])
    back = codec.decompress_streams([(blobs[0], len(s))])
    assert np.array_equal(s, back[0])
