"""zlibh decoder — zlib's Huffman-only block format (programs/zlibh.c).

The reference ships zlib's static/dynamic Huffman coder as a comparison
baseline (`fse -z`).  This module implements the DECODER so frames produced
by the reference CLI's zlibh codec decompress here; the encoder is not
ported (zlibh exists for baseline benchmarking — blockbench shells out to
the reference binary for its numbers).

Block layout (bits read LSB-first from LE bytes, ZLIBH_inflate
zlibh.c:1492-1665):
  1 bit: 0 = dynamic block, 1 = fixed (deflate's static literal code)
  dynamic: 4 bits (ncode-4); ncode x 3-bit code-length-code lengths in the
  deflate `order`; then 257 literal code lengths with the 16/17/18 repeat
  escapes; codes are canonical deflate codes (RFC1951 bit order).
  payload: literal codes; symbol 256 = end of block.
"""
from __future__ import annotations

from ..errors import CorruptionError

_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)
_MAXBITS = 15

# deflate's fixed literal/length code: 0-143 -> 8 bits, 144-255 -> 9,
# 256-279 -> 7, 280-287 -> 8 (only 0..256 ever occur in zlibh streams)
_FIXED_LENS = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8


class _BitReader:
    __slots__ = ("data", "pos", "hold", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.hold = 0
        self.bits = 0

    def need(self, n: int) -> None:
        while self.bits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            if self.pos >= len(self.data) + 4:
                raise CorruptionError("zlibh: out of input")
            self.pos += 1
            self.hold |= b << self.bits
            self.bits += 8

    def take(self, n: int) -> int:
        self.need(n)
        v = self.hold & ((1 << n) - 1)
        self.hold >>= n
        self.bits -= n
        return v


class _Huffman:
    """Canonical deflate code: decode via the counts/offsets walk
    (the classic public-domain 'puff' structure)."""

    def __init__(self, lens):
        self.counts = [0] * (_MAXBITS + 1)
        for l in lens:
            self.counts[l] += 1
        self.counts[0] = 0
        left = 1
        for l in range(1, _MAXBITS + 1):
            left = (left << 1) - self.counts[l]
            if left < 0:
                raise CorruptionError("zlibh: over-subscribed code")
        offs = [0] * (_MAXBITS + 2)
        for l in range(1, _MAXBITS + 1):
            offs[l + 1] = offs[l] + self.counts[l]
        self.symbols = [0] * offs[_MAXBITS + 1]
        for sym, l in enumerate(lens):
            if l:
                self.symbols[offs[l]] = sym
                offs[l] += 1

    def decode(self, br: _BitReader) -> int:
        code = first = index = 0
        for length in range(1, _MAXBITS + 1):
            code |= br.take(1)
            count = self.counts[length]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise CorruptionError("zlibh: invalid code")


def zlibh_decompress(comp: bytes, dst_size: int) -> bytes:
    br = _BitReader(comp)
    if br.take(1) == 1:                      # fixed block
        lcode = _Huffman(_FIXED_LENS)
    else:                                    # dynamic block
        ncode = br.take(4) + 4
        cl_lens = [0] * 19
        for i in range(ncode):
            cl_lens[_ORDER[i]] = br.take(3)
        clcode = _Huffman(cl_lens)
        lens: list[int] = []
        while len(lens) < 257:
            sym = clcode.decode(br)
            if sym < 16:
                lens.append(sym)
            elif sym == 16:
                if not lens:
                    raise CorruptionError("zlibh: repeat with no previous")
                lens.extend([lens[-1]] * (3 + br.take(2)))
            elif sym == 17:
                lens.extend([0] * (3 + br.take(3)))
            else:
                lens.extend([0] * (11 + br.take(7)))
        if len(lens) > 257:
            raise CorruptionError("zlibh: too many code lengths")
        if lens[256] == 0:
            raise CorruptionError("zlibh: missing end-of-block code")
        lcode = _Huffman(lens)

    out = bytearray()
    while True:
        sym = lcode.decode(br)
        if sym == 256:
            break
        if sym > 256 or len(out) > dst_size:
            raise CorruptionError("zlibh: corrupt literal stream")
        out.append(sym)
    return bytes(out)
