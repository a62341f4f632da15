/* Minimal stdin/stdout driver over the reference FSE_compressU16 /
 * FSE_decompressU16, used only as a byte-exactness test oracle.
 *   u16_oracle c < raw_u16le > compressed
 *   u16_oracle d <n_symbols> < compressed > raw_u16le
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "fse.h"
#include "fseU16.h"

static size_t read_all(unsigned char **out) {
    size_t cap = 1 << 20, n = 0;
    unsigned char *buf = malloc(cap);
    size_t r;
    while ((r = fread(buf + n, 1, cap - n, stdin)) > 0) {
        n += r;
        if (n == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *out = buf;
    return n;
}

int main(int argc, char **argv) {
    unsigned char *in;
    size_t n = read_all(&in);
    if (argc >= 2 && argv[1][0] == 'c') {
        size_t nsym = n / 2;
        size_t cap = FSE_compressBound(nsym * 2) + 1024;
        unsigned char *out = malloc(cap);
        size_t c = FSE_compressU16(out, cap, (const unsigned short *)in, nsym, 0, 0);
        if (FSE_isError(c)) { fprintf(stderr, "err %zu\n", c); return 1; }
        /* report mode on stderr: 0=raw 1=rle else size */
        fprintf(stderr, "%zu\n", c);
        if (c > 1) fwrite(out, 1, c, stdout);
        return 0;
    } else if (argc >= 3 && argv[1][0] == 'd') {
        size_t nsym = strtoul(argv[2], NULL, 10);
        unsigned short *out = malloc((nsym + 16) * 2);
        size_t d = FSE_decompressU16(out, nsym, in, n);
        if (FSE_isError(d)) { fprintf(stderr, "err\n"); return 1; }
        fwrite(out, 2, d, stdout);
        return 0;
    }
    fprintf(stderr, "usage: u16_oracle c|d [nsym]\n");
    return 2;
}
