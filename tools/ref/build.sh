#!/bin/sh
# Build the upstream reference binaries (read-only tree at /root/reference) into
# tools/ref/bin/. These serve purely as *test oracles* for byte-exactness tests;
# no reference code ships in the framework itself.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF:-/root/reference}"
mkdir -p "$HERE/bin"
gcc -O2 -I"$REF/lib" \
    "$REF/programs/bench.c" "$REF/programs/commandline.c" "$REF/programs/fileio.c" \
    "$REF/programs/xxhash.c" "$REF/programs/zlibh.c" \
    "$REF/lib/entropy_common.c" "$REF/lib/hist.c" \
    "$REF/lib/fse_decompress.c" "$REF/lib/fse_compress.c" "$REF/lib/fseU16.c" \
    "$REF/lib/huf_compress.c" "$REF/lib/huf_decompress.c" \
    -o "$HERE/bin/fse"
gcc -O2 "$REF/programs/probaGenerator.c" -o "$HERE/bin/probagen" -lm
gcc -O2 -I"$REF/lib" "$HERE/u16_oracle.c" \
    "$REF/lib/entropy_common.c" "$REF/lib/hist.c" \
    "$REF/lib/fse_decompress.c" "$REF/lib/fse_compress.c" "$REF/lib/fseU16.c" \
    -o "$HERE/bin/u16_oracle"
echo "built: $HERE/bin/fse $HERE/bin/probagen $HERE/bin/u16_oracle"
