"""Round-3 ADVICE/VERDICT fixes.

* sharded encode uses rans_encode2 (multi-MiB groups legal under --mesh)
* u16 paths use FSE_optimalTableLog (small inputs get small tables)
* AutoTpuCodec refuses to guess the codec on decompression
* byte-path tableLog is validated to [5, 12] (native packings are 12-bit)
* CLI decode honors --device tpu via the frame magic
* CLI overwrite prompt (fileio.c:222-257 parity)
"""
import io
import sys

import numpy as np
import pytest

from finitestateentropy_tpu.utils import generate_proba

MESH = 8


def test_sharded_encode2_multichunk_matches_single():
    """The mesh encode path must be the same kernel as single-device
    (rans_encode2), including the multi-chunk span used by >1 MiB groups
    (ADVICE r2 medium: the old v1 kernel could not fit them in VMEM)."""
    import jax.numpy as jnp

    from finitestateentropy_tpu.parallel.mesh import get_mesh
    from finitestateentropy_tpu.parallel.turbo_dp import sharded_turbo_encode_v2
    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_ctables,
                                                           rans_encode2)

    gsz = 16384
    data = generate_proba(80)[: gsz * MESH]
    n_pad = _pad_n(gsz)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _hrows_cap(n_pad)
    fc = np.zeros((MESH, 2, 128), np.int32)
    mg = np.zeros((MESH, 2, 128), np.int32)
    srcw = np.zeros((MESH, t4 * 8, 128), np.int32)
    for g in range(MESH):
        chunk = np.frombuffer(data[g * gsz : (g + 1) * gsz], np.uint8)
        norm, max_sv, ncount, mfs = _prep_group(chunk)
        fc[g], mg[g] = pack_rans_ctables(norm)
        srcw[g] = chunk.view("<u4").view(np.int32).reshape(t4 * 8, 128)

    fcb, mgb, srcb = map(jnp.asarray, (fc, mg, srcw))
    s1, f1, c1, st1 = rans_encode2(fcb, mgb, srcb, t4, hcap, True, False,
                                   11, True, 2)  # force 2 chunks/group
    mesh = get_mesh(MESH)
    assert mesh is not None
    step = sharded_turbo_encode_v2(mesh, t4, hcap, True, 11, force_chunk=2)
    s2, f2, c2, st2, total = step(fcb, mgb, srcb)
    assert np.array_equal(np.asarray(c2), np.asarray(c1))
    assert np.array_equal(np.asarray(f2), np.asarray(f1))
    assert np.array_equal(np.asarray(st2), np.asarray(st1))
    for g in range(MESH):
        cs = int(np.asarray(c1)[g])
        # packed-word streams: compare the wire bytes (beyond 2*cs the
        # buffers are unwritten)
        assert (np.ascontiguousarray(np.asarray(s2)[g]).tobytes()[: 2 * cs]
                == np.ascontiguousarray(np.asarray(s1)[g]).tobytes()[: 2 * cs])
    assert int(total) == int(np.asarray(c1).sum())


def test_u16_small_input_uses_optimal_tablelog():
    """Small u16 inputs must shrink the table via FSE_optimalTableLog
    (ADVICE r2: the dead normalize retry always paid full-size headers)."""
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)
    from finitestateentropy_tpu.turbo.rans16 import (parse_rans16_group,
                                                     rans16_compress,
                                                     rans16_decompress)

    rng = np.random.default_rng(7)
    small = rng.integers(0, 40, 600).astype(np.uint16)
    blob = rans16_compress(small)
    (n, cs, tlog, flags, norm, max_sv, init, payload, st), _ = \
        parse_rans16_group(blob)
    assert tlog < 11  # optimal tableLog kicked in
    assert np.array_equal(rans16_decompress(blob), small)
    dev = turbo16_compress_device(small, interpret=True)
    assert dev == blob  # device path mirrors the twin's choice
    assert np.array_equal(turbo16_decompress_device(dev, interpret=True),
                          small)


def test_auto_codec_decompress_requires_decision():
    from finitestateentropy_tpu.models import AutoTpuCodec

    c = AutoTpuCodec()
    with pytest.raises(ValueError, match="frame magic"):
        c.decompress_blocks([(b"\x00", 1)])


def test_byte_path_tablelog_validated():
    from finitestateentropy_tpu.turbo.api import turbo_compress_device

    for bad in (13, 4, 20):
        with pytest.raises(ValueError, match=r"\[5, 12\]"):
            turbo_compress_device(b"abc" * 100, table_log=bad)


def test_cli_device_decode_by_magic(tmp_path):
    """--device tpu decompression must route by the frame magic (the auto
    codec no longer guesses)."""
    from finitestateentropy_tpu.cli import main

    data = generate_proba(80)[: 3 * 32768 + 99]
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    frm = tmp_path / "in.bin.fse"
    assert main(["-h", str(src), str(frm)]) == 0  # Huff0 frame, host twin
    out = tmp_path / "back.bin"
    assert main(["-d", "--device", "tpu", str(frm), str(out)]) == 0
    assert out.read_bytes() == data


def test_overwrite_prompt(tmp_path, monkeypatch):
    """fileio.c:222-257 parity: interactive y/N prompt without -f."""
    from finitestateentropy_tpu import cli

    src = tmp_path / "a.bin"
    src.write_bytes(b"fresh data" * 100)
    dst = tmp_path / "a.bin.fse"
    dst.write_bytes(b"old")

    class FakeTty(io.StringIO):
        def isatty(self):
            return True

    # interactive "n" -> refused, output untouched
    monkeypatch.setattr(cli.sys, "stdin", FakeTty("n\n"))
    assert cli.main([str(src), str(dst)]) == 1
    assert dst.read_bytes() == b"old"
    # interactive "y" -> proceeds
    monkeypatch.setattr(cli.sys, "stdin", FakeTty("y\n"))
    assert cli.main([str(src), str(dst)]) == 0
    assert dst.read_bytes() != b"old"
    # non-interactive -> hard refuse (previous behavior)
    monkeypatch.setattr(cli.sys, "stdin", io.StringIO(""))
    before = dst.read_bytes()
    assert cli.main([str(src), str(dst)]) == 1
    assert dst.read_bytes() == before
