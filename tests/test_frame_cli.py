"""Frame format and CLI: byte-identical frames + cross-decode with reference."""
import subprocess
import sys

import pytest

from finitestateentropy_tpu.io import frame as fio
from finitestateentropy_tpu.utils import generate_proba
from tests.conftest import requires_ref
from tests.ref_frames import ref_compress_file, ref_decompress_file


@pytest.mark.parametrize("codec,flag", [("fse", "-e"), ("huf", "-h")])
@requires_ref
def test_frames_byte_identical(tmp_path, ref_fse, codec, flag):
    data = generate_proba(14)
    src = tmp_path / "a.bin"
    src.write_bytes(data)
    ref_out = tmp_path / "a.ref"
    ref_compress_file(ref_fse, flag, src, ref_out)
    ours = fio.compress_bytes(data, codec)
    assert ours == ref_out.read_bytes()
    # and we decode it back
    assert fio.decompress_bytes(ours) == data


@requires_ref
def test_reference_decodes_our_frame(tmp_path, ref_fse):
    data = generate_proba(80)[: 5 * 32768 + 1000]  # partial last block
    ours = tmp_path / "b.fse"
    ours.write_bytes(fio.compress_bytes(data, "huf"))
    back = tmp_path / "b.out"
    ref_decompress_file(ref_fse, ours, back)
    assert back.read_bytes() == data


def test_frame_checksum_rejects_corruption():
    data = generate_proba(80)[:70000]
    frame = bytearray(fio.compress_bytes(data, "fse"))
    frame[-1] ^= 0x01  # trailer CRC bit
    with pytest.raises(Exception):
        fio.decompress_bytes(bytes(frame))


def test_cli_roundtrip(tmp_path):
    from finitestateentropy_tpu.cli import main

    data = generate_proba(80)[:100000]
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    assert main(["-e", "-f", str(src), str(tmp_path / "x.fse")]) == 0
    assert main(["-d", "-f", str(tmp_path / "x.fse"), str(tmp_path / "x.out")]) == 0
    assert (tmp_path / "x.out").read_bytes() == data
    # test mode
    assert main(["-t", str(tmp_path / "x.fse")]) == 0


def test_cli_stdin_stdout_pipes(tmp_path):
    """'-' reads stdin / writes stdout (reference commandline.c:222-257)."""
    import subprocess
    import sys

    from finitestateentropy_tpu.io import frame as fio
    from finitestateentropy_tpu.utils import generate_proba

    data = generate_proba(70)[:50000]
    env_cmd = [sys.executable, "-m", "finitestateentropy_tpu.cli"]
    r = subprocess.run(env_cmd + ["-e", "-", "-"], input=data,
                       capture_output=True, check=True)
    assert r.stdout == fio.compress_bytes(data)
    r2 = subprocess.run(env_cmd + ["-d", "-", "-"], input=r.stdout,
                        capture_output=True, check=True)
    assert r2.stdout == data


def test_cli_refuses_overwrite_without_force(tmp_path):
    from finitestateentropy_tpu.cli import main
    from finitestateentropy_tpu.utils import generate_proba

    src = tmp_path / "x"
    src.write_bytes(generate_proba(70)[:10000])
    dst = tmp_path / "x.fse"
    dst.write_bytes(b"existing")
    assert main(["-e", str(src), str(dst)]) == 1
    assert dst.read_bytes() == b"existing"
    assert main(["-e", "-f", str(src), str(dst)]) == 0
    assert dst.read_bytes() != b"existing"


def test_cli_turbo_table_log_on_native_path(tmp_path, capsys):
    """r3: the native host path HONORS -M for speed frames (tableLog lands
    on the wire); ratio mode still warns that -M is ignored (v1 frames are
    tableLog 11)."""
    src = tmp_path / "in.bin"
    src.write_bytes(b"abcdabcdaabb" * 4096)
    from finitestateentropy_tpu import native
    from finitestateentropy_tpu.cli import main
    from finitestateentropy_tpu.turbo.rans import parse_rans_group

    if not native.available():
        pytest.skip("native library unavailable")
    assert main(["-T", "-M", "9", "-f", str(src),
                 str(tmp_path / "x.tfse")]) == 0
    g, _ = parse_rans_group((tmp_path / "x.tfse").read_bytes())
    assert g[2] == 9  # wire tableLog honors -M on the native speed path
    assert main(["-T", "--ratio", "-M", "9", "-f", str(src),
                 str(tmp_path / "y.tfse")]) == 0
    err = capsys.readouterr().err
    assert "-M 9" in err or "ignoring -M" in err


def test_cli_bench_mode_parity(tmp_path, capsys):
    """Reference parity: -i clamps to [1,9], bench takes multi-file lists,
    and file lists outside bench mode are rejected."""
    from finitestateentropy_tpu.cli import main

    a, b, c = tmp_path / "a.bin", tmp_path / "b.bin", tmp_path / "c.bin"
    for f in (a, b, c):
        f.write_bytes(generate_proba(80)[:8192])
    assert main(["-b", "-i", "99", str(a), str(b), str(c)]) == 0
    err = capsys.readouterr().err
    assert err.count("a.bin") + err.count("b.bin") + err.count("c.bin") >= 3
    # multi-file outside bench mode -> error
    assert main(["-e", "-f", str(a), str(b), str(c)]) == 1
