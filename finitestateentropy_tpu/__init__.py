"""finitestateentropy_tpu — a TPU-native FSE / Huff0 entropy-codec framework.

A from-scratch re-design of the capabilities of Cyan4973/FiniteStateEntropy
(tANS "FSE" coder, canonical-Huffman "Huff0" coder, 16-bit-symbol FSE variant,
block frame format, CLI, benchmarks and fuzz tests) for TPU hardware:

  * wire format is bit-identical to the reference (`lib/fse.h`, `lib/huf.h`,
    `programs/fileio.c:267-285` define the frozen contract);
  * the compute path is batched JAX/XLA/Pallas — thousands of independent
    <=64KB blocks are processed data-parallel across TPU lanes and chips
    instead of the reference's single-threaded pointer loops;
  * scale-out is `jax.sharding.Mesh` + `shard_map` data parallelism over the
    block batch (the reference has no distributed layer at all).

Package layout:
  refimpl/   bit-exact host (numpy/python) twin of the reference codec; the
             correctness oracle for every device kernel, and the host fallback.
  ops/       JAX + Pallas device kernels (histogram, normalize, table build,
             tANS encode/decode, Huffman encode/decode, bit-packing).
  models/    codec pipelines: FSE, Huff0, FSE_U16, auto-select.
  parallel/  device mesh construction and sharded batch compression.
  io/        frame format (fileio.c-compatible) and file compression.
  utils/     xxhash32, probaGenerator twin, config.
"""

from .config import (
    FSE_MAX_TABLELOG,
    FSE_DEFAULT_TABLELOG,
    FSE_MIN_TABLELOG,
    FSE_MAX_SYMBOL_VALUE,
    HUF_TABLELOG_MAX,
    HUF_TABLELOG_DEFAULT,
    HUF_SYMBOLVALUE_MAX,
    CodecConfig,
)

__version__ = "0.1.0"
