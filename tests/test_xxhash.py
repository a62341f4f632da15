"""XXH32/XXH64 vs oracle vectors generated from the reference xxhash.c
(programs/xxhash.c; harness output in tests/data_xxh_vectors.txt — the
buffer is the LCG byte sequence regenerated below)."""
from pathlib import Path

import numpy as np

from finitestateentropy_tpu.utils import debuglog, set_debuglevel, xxh32, xxh64

VECTORS = Path(__file__).parent / "data_xxh_vectors.txt"


def _lcg_buffer(n: int) -> bytes:
    out = bytearray(n)
    s = 2654435761
    for i in range(n):
        s = (s * 2654435761 + 2246822519) & 0xFFFFFFFF
        out[i] = (s >> 11) & 0xFF
    return bytes(out)


def test_xxh_oracle_vectors():
    buf = _lcg_buffer(1031)
    checked = 0
    for line in VECTORS.read_text().splitlines():
        ln, seed, h32, h64 = line.split()
        ln, seed = int(ln), int(seed)
        assert xxh32(buf[:ln], seed) == int(h32, 16), (ln, seed)
        assert xxh64(buf[:ln], seed) == int(h64, 16), (ln, seed)
        checked += 1
    assert checked == 33


def test_xxh64_known_answers():
    # the canonical published test values
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", 1) != xxh64(b"")


def test_debuglog_gating(capsys):
    set_debuglevel(0)
    debuglog(1, "hidden %d", 1)
    assert capsys.readouterr().err == ""
    set_debuglevel(3)
    try:
        debuglog(3, "shown %d", 7)
        assert "DEBUG[3]: shown 7" in capsys.readouterr().err
    finally:
        set_debuglevel(0)


def test_xxh64_numpy_input():
    d = np.arange(100, dtype=np.uint8)
    assert xxh64(d) == xxh64(d.tobytes())
