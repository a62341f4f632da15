"""XXH32 twin vs known vectors (public XXH32 test vectors) and frame use."""
from finitestateentropy_tpu.utils.xxhash32 import xxh32


def test_xxh32_vectors():
    # public reference vectors for XXH32
    assert xxh32(b"", 0) == 0x02CC5D05
    assert xxh32(b"", 0x9E3779B1) == 0x36B78AE7
    assert xxh32(bytes([0x9E]), 0) == 0xB85CBEE5
    assert xxh32(b"Hello World", 0) == 0xB1FD16EE


def test_xxh32_long():
    data = bytes(range(256)) * 100
    h = xxh32(data, 0)
    assert 0 <= h <= 0xFFFFFFFF
    # stability check (regression pin)
    assert h == xxh32(bytearray(data), 0)
