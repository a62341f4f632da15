"""Bit-exact host twin of the reference entropy codecs.

This sub-package is the *specification in executable form*: every byte it
produces matches the reference C library (verified against the reference CLI
in tests/).  It serves as (a) the differential-testing oracle for the JAX and
Pallas device kernels in ``..ops`` and (b) the host fallback codec.

It is a clean-room re-expression in Python/numpy of the algorithms described
by the reference sources cited in each docstring — not a transliteration.
"""

from .blocktypes import BlockResult, Kind
from .fse import fse_compress, fse_decompress

try:  # populated as the build progresses
    from .huf import huf_compress, huf_decompress
except ImportError:  # pragma: no cover
    pass
try:
    from .fseu16 import fse_compress_u16, fse_decompress_u16
except ImportError:  # pragma: no cover
    pass
