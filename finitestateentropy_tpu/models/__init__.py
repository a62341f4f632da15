"""Codec pipelines ("model families"): FSE, Huff0, FSE_U16, auto-select.

Each codec exposes the batch interface consumed by the frame layer:
  compress_blocks(list[bytes]) -> list[BlockResult]
  decompress_blocks(list[(payload, regenerated_size)]) -> list[bytes]
The TPU codecs cross the host->device boundary once per batch.
"""
from .fse_codec import FseTpuCodec
from .huf_codec import HufTpuCodec


def get_batch_codec(codec: str, mesh: int = 0):
    """Returns (BatchCompressor, BatchDecompressor) for the frame layer."""
    if codec == "fse":
        c = FseTpuCodec(mesh=mesh)
    elif codec == "huf":
        c = HufTpuCodec(mesh=mesh)
    else:
        raise ValueError(f"no TPU codec for {codec!r}")
    return c.compress_blocks, c.decompress_blocks
