"""Helpers to build/parse reference CLI frames for oracle comparisons."""
from __future__ import annotations

import subprocess
from pathlib import Path


def ref_compress_file(ref_fse: str, flag: str, src: Path, dst: Path):
    subprocess.run([ref_fse, flag, "-f", str(src), str(dst)], check=True, capture_output=True)


def ref_decompress_file(ref_fse: str, src: Path, dst: Path):
    subprocess.run([ref_fse, "-d", "-f", str(src), str(dst)], check=True, capture_output=True)


def parse_frame_blocks(frame: bytes, block_size: int = 32768):
    """Yield (btype, rsize, payload) per block of a fileio.c frame."""
    pos = 5  # magic + blockSizeID
    out = []
    while True:
        desc = frame[pos]
        btype = desc >> 6
        if btype == 3:  # crc
            break
        full = bool(desc & 0x20)
        pos += 1
        rsize = block_size
        if not full:
            rsize = (frame[pos] << 8) | frame[pos + 1]
            pos += 2
        if btype == 0:  # compressed
            csize = (frame[pos] << 8) | frame[pos + 1]
            pos += 2
        elif btype == 1:  # raw
            csize = rsize
        else:  # rle
            csize = 1
        payload = frame[pos : pos + csize]
        pos += csize
        out.append((btype, rsize, payload))
    return out
