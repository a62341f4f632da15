"""ctypes bindings for the native TurboRANS host codec (native/turbofse.cc).

The native path is the CLI/frame host fallback (no TPU attached) and a fast
oracle for the device kernels: its encoder emits ratio-mode (v1) groups
byte-identical to `rans_compress(..., steptots=False)`, and its decoder
reads both v1 and v2 (speed-mode) frames.  Builds on demand with the system
compiler; `available()` reports whether the library could be loaded.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_LIB_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB = _LIB_DIR / "libturbofse.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists():
        try:
            subprocess.run(["sh", str(_LIB_DIR / "build.sh")], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.tfse_rans_compress_group.restype = ctypes.c_int64
    lib.tfse_rans_compress_group.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64]
    lib.tfse_rans_decompress_group.restype = ctypes.c_int64
    lib.tfse_rans_decompress_group.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.tfse_prep_group.restype = ctypes.c_int64
    lib.tfse_prep_group.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def rans_compress_native(data: bytes, group_size: int = 1 << 20) -> bytes:
    """Multi-group TurboRANS compress, byte-identical to the twin/device."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native turbofse library unavailable")
    out = bytearray()
    for i in range(0, max(len(data), 1), group_size):
        chunk = data[i : i + group_size]
        cap = len(chunk) + 16 + 8192
        dst = ctypes.create_string_buffer(cap)
        r = lib.tfse_rans_compress_group(chunk, len(chunk), dst, cap)
        if r < 0:
            raise RuntimeError(f"native compress failed: {r}")
        out += dst.raw[:r]
    return bytes(out)


def prep_group_native(chunk: bytes, table_log: int = 11):
    """Group stats via C: returns (norm, max_sv, ncount, mfs), None for RLE,
    or the string "fallback" when the native path cannot handle the input."""
    import numpy as np

    lib = _load()
    if lib is None:
        return "fallback"
    norm = (ctypes.c_int16 * 256)()
    ncount = ctypes.create_string_buffer(512)
    meta = (ctypes.c_int64 * 3)()
    r = lib.tfse_prep_group(chunk, len(chunk), table_log, norm, ncount, meta)
    if r == 0:
        return None  # RLE
    if r != 1:
        return "fallback"
    max_sv, mfs, nc_len = int(meta[0]), int(meta[1]), int(meta[2])
    return (np.frombuffer(norm, np.int16, max_sv + 1).astype(np.int32),
            max_sv, ncount.raw[:nc_len], mfs)


def rans_decompress_native(blob: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native turbofse library unavailable")
    out = bytearray()
    pos = 0
    consumed = ctypes.c_uint64()
    while pos < len(blob):
        # n_sym from the header bounds the output buffer
        n_sym = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        dst = ctypes.create_string_buffer(max(n_sym, 1))
        r = lib.tfse_rans_decompress_group(
            blob[pos:], len(blob) - pos, dst, n_sym, ctypes.byref(consumed))
        if r < 0:
            raise ValueError(f"native decompress failed: {r}")
        out += dst.raw[:r]
        pos += consumed.value
    return bytes(out)
