"""Codec pipelines ("model families"): FSE, Huff0, FSE_U16, auto-select.

FSE / Huff0 / auto expose the batch interface consumed by the frame layer:
  compress_blocks(list[bytes]) -> list[BlockResult]
  decompress_blocks(list[(payload, regenerated_size)]) -> list[bytes]
The TPU codecs cross the host->device boundary once per batch.  FSE_U16 is
stream-oriented (no frame format exists for 16-bit symbols, reference
fseU16.h:40-55) — see u16_codec.U16Codec.
"""
from .fse_codec import FseTpuCodec
from .huf_codec import HufTpuCodec
from .select import choose_codec
from .u16_codec import U16Codec


class AutoTpuCodec:
    """Frame-level auto-select: picks FSE or Huff0 from block histograms
    (select.choose_codec) at compress time and delegates; `chosen` records
    the decision so callers can write the matching frame magic."""

    def __init__(self, block_size: int = 32768, mesh: int = 0):
        self.block_size = block_size
        self.mesh = mesh
        self.chosen: str | None = None

    def compress_blocks(self, blocks):
        self.chosen = choose_codec(blocks)
        inner = (FseTpuCodec if self.chosen == "fse" else HufTpuCodec)(
            block_size=self.block_size, mesh=self.mesh)
        return inner.compress_blocks(blocks)

    def decompress_blocks(self, items):
        # decode side: auto-select is a compress-time decision — the frame
        # magic names the codec, so decompression must come through
        # get_batch_codec('fse'|'huf') (the CLI reads the magic and does
        # exactly that).  Guessing here would silently mis-decode.
        if self.chosen is None:
            raise ValueError(
                "AutoTpuCodec cannot decompress without a compress-time "
                "decision; read the frame magic and use the named codec "
                "(get_batch_codec('fse') or get_batch_codec('huf'))")
        inner = (FseTpuCodec if self.chosen == "fse" else HufTpuCodec)(
            block_size=self.block_size, mesh=self.mesh)
        return inner.decompress_blocks(items)


def get_batch_codec(codec: str, mesh: int = 0):
    """Returns (BatchCompressor, BatchDecompressor) for the frame layer."""
    if codec == "fse":
        c = FseTpuCodec(mesh=mesh)
    elif codec == "huf":
        c = HufTpuCodec(mesh=mesh)
    elif codec == "auto":
        c = AutoTpuCodec(mesh=mesh)
    else:
        raise ValueError(f"no TPU codec for {codec!r}")
    return c.compress_blocks, c.decompress_blocks
