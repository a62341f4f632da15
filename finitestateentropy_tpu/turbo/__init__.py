"""TurboFSE — the TPU-native lane-interleaved entropy-coding format.

The reference's formats (fse_compress.c / huf_compress.c) interleave 2 tANS
states or 4 Huffman streams because that is what an out-of-order CPU core can
exploit.  A TPU's unit of execution is an (8, 128) vector register, so the
TPU-native format interleaves K = 1024 coder states — one per VPU lane —
sharing a single LIFO bit cursor, with a table shared per multi-megabyte
group.  Encode/decode then run as single Pallas kernels whose inner loop
advances all 1024 chains per step.

See format.py for the wire layout and the host (numpy) twin, kernels.py for
the Pallas kernels.
"""
from .format import (  # noqa: F401
    TURBO_LANES,
    TURBO_MAGIC,
    turbo_fse_compress,
    turbo_fse_decompress,
)


def __getattr__(name):  # lazy: keep `import finitestateentropy_tpu` jax-free
    if name in ("turbo_compress_device", "turbo_decompress_device",
                "turbo16_compress_device", "turbo16_decompress_device"):
        from . import api

        return getattr(api, name)
    if name in ("rans_compress_resident", "rans_decompress_resident"):
        from . import device_api

        return getattr(device_api, name)
    if name in ("pair_compress", "pair_decompress"):
        from . import pair

        return getattr(pair, name)
    if name in ("quad_compress", "quad_decompress"):
        from . import quad

        return getattr(quad, name)
    raise AttributeError(name)
