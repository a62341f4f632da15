"""Batched Huff0 device kernels.

Encode is embarrassingly parallel on TPU: per-symbol (val, nbBits) gathers +
a prefix-sum bit pack per stream — no loop-carried state at all (the
reference's 4-stream split, huf_compress.c:552-603, maps to a 4x wider batch
axis).  Decode X1 is a per-stream serial nbBits chain (huf_decompress.c:
194-237) run as a fori_loop vectorized over 4*B streams.

Wire-format invariants: per-stream symbols are emitted in strictly
descending position order (the reference's mod-4 prologue + 4-per-flush loop
reduces to exactly that), endMark closes each stream, jumpTable is 3xLE16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitio import bytes_to_words, initial_bitpos, pack_fields, read_bits


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(4, 5))
def huf_encode_4x_batch(src_u8, n, val_table, nb_table, max_block: int, out_seg_bytes: int):
    """4-stream Huff0 encode.

    src_u8[B, max_block] uint8, n[B] block lengths,
    val_table[B, 256] uint16, nb_table[B, 256] uint8.
    Returns (stream_words[B, 4, W] uint32, stream_sizes[B, 4] int32).
    The caller assembles jumpTable + concatenation (host or gather pass).
    """
    B = src_u8.shape[0]
    seg_cap = (max_block + 3) // 4

    seg = (n + 3) // 4  # per-block segment size (first 3 streams)

    def fields_for_stream(src, nloc, segloc, val, nb, k):
        # stream k covers positions [k*segloc, min((k+1)*segloc, nloc))
        start = k * segloc
        seg_len = jnp.where(k < 3, segloc, nloc - 3 * segloc)
        seg_len = jnp.maximum(seg_len, 0)
        # field e encodes position start + seg_len-1-e (descending order);
        # field seg_len is the endMark
        e = jnp.arange(seg_cap + 1, dtype=jnp.int32)
        p = start + seg_len - 1 - e
        active = e < seg_len
        sym = src[jnp.clip(p, 0, src.shape[0] - 1)].astype(jnp.int32)
        vals = jnp.where(active, val[sym].astype(jnp.int32),
                         jnp.where(e == seg_len, 1, 0))
        nbs = jnp.where(active, nb[sym].astype(jnp.int32),
                        jnp.where(e == seg_len, 1, 0))
        return vals, nbs

    def per_block(src, nloc, segloc, val, nb):
        vs, bs = [], []
        for k in range(4):
            v, b = fields_for_stream(src, nloc, segloc, val, nb, k)
            vs.append(v)
            bs.append(b)
        return jnp.stack(vs), jnp.stack(bs)

    vals, nbs = jax.vmap(per_block)(src_u8, n, seg, val_table, nb_table)
    # pack all 4*B streams
    F = vals.shape[-1]
    out_words = (out_seg_bytes + 3) // 4
    words, total_bits = pack_fields(vals.reshape(B * 4, F), nbs.reshape(B * 4, F), out_words)
    csize = (total_bits + 7) >> 3
    return words.reshape(B, 4, out_words), csize.reshape(B, 4)


# ---------------------------------------------------------------------------
# DTableX1 build (vectorized)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def build_dtables_x1(weights, table_log, max_table_log: int = 12):
    """weights[B, 256] int32 (0 = absent, padded with -1 beyond nbSymbols),
    table_log[B] -> (byte[B, 2^max_table_log] uint8, nb[B, ...] uint8).

    Mirrors HUF_readDTableX1_wksp's fill (huf_decompress.c:151-183): cells
    ordered by ascending weight, within weight by symbol index.
    """
    max_size = 1 << max_table_log

    def one(w, tlog):
        nsym = w.shape[0]
        present = w > 0
        length = jnp.where(present, (1 << jnp.maximum(w, 0)) >> 1, 0).astype(jnp.int32)
        # order symbols by (weight, index): stable argsort of weight
        order = jnp.argsort(jnp.where(present, w, 99999), stable=True)
        len_sorted = length[order]
        cum = jnp.cumsum(len_sorted)
        cell = jnp.arange(max_size, dtype=jnp.int32)
        k = jnp.searchsorted(cum, cell, side="right").astype(jnp.int32)
        k = jnp.minimum(k, nsym - 1)
        sym = order[k].astype(jnp.uint8)
        nb = (tlog + 1 - w[order[k]]).astype(jnp.uint8)
        live = cell < (1 << tlog)
        return jnp.where(live, sym, 0), jnp.where(live, nb, 0)

    return jax.vmap(one)(weights, table_log)


# ---------------------------------------------------------------------------
# Decode X1 (4 streams per block, batched)
# ---------------------------------------------------------------------------


def _decode_stream_x1(words, bitpos0, n_out, table_log, byte_tbl, nb_tbl, max_out: int):
    """One Huffman stream: serial nbBits chain, symbols front-to-back."""
    dt_log = table_log.astype(jnp.int32)

    def body(i, carry):
        bitpos, out, err = carry
        active = i < n_out
        # lookBitsFast with zero-fill when fewer than dtLog bits remain
        avail = jnp.minimum(dt_log, jnp.maximum(bitpos, 0))
        raw = read_bits(words, bitpos - avail, avail.astype(jnp.uint32)).astype(jnp.int32)
        v = raw << (dt_log - avail)
        sym = byte_tbl[v]
        nb = nb_tbl[v].astype(jnp.int32)
        out = out.at[i].set(jnp.where(active, sym, 0).astype(jnp.uint8))
        bitpos = jnp.where(active, bitpos - nb, bitpos)
        return bitpos, out, err

    out0 = jnp.zeros(max_out, dtype=jnp.uint8)
    bitpos, out, _ = jax.lax.fori_loop(0, max_out, body, (bitpos0, out0, False))
    err = (bitpos != 0) & (n_out > 0)  # endOfDStream equivalent
    return out, err


@functools.partial(jax.jit, static_argnums=(5,))
def huf_decode_4x1_batch(streams_u8, csize, n_out, table_log, dtable, max_seg: int):
    """streams_u8[B4, S] (4 streams per block, flattened), csize[B4],
    n_out[B4] segment lengths, table_log[B4], dtable = (byte[B4, T], nb[B4, T]).
    Returns (out[B4, max_seg] uint8, err[B4])."""
    byte_tbl, nb_tbl = dtable
    words = bytes_to_words(streams_u8)
    bitpos0, bad = initial_bitpos(streams_u8, csize)
    f = lambda w, bp, n, tl, bt, nt: _decode_stream_x1(w, bp, n, tl, bt, nt, max_seg)
    out, err = jax.vmap(f)(words, bitpos0, n_out, table_log, byte_tbl, nb_tbl)
    return out, err | (bad & (n_out > 0))


# ---------------------------------------------------------------------------
# Decode X2 (double-symbol entries, huf_decompress.c:454-953)
# ---------------------------------------------------------------------------


def pack_dtable_x2(dt) -> "np.ndarray":
    """Pack a host-built DTableX2 (refimpl.huf.huf_read_dtable_x2 — the
    build is 4096-entry host work like the tree build) into one int32 table:
    entry = seq_lo | seq_hi<<8 | nb_bits<<16 | (length-1)<<22."""
    import numpy as np

    e = (dt.seq_lo.astype(np.int32)
         | (dt.seq_hi.astype(np.int32) << 8)
         | (dt.nb_bits.astype(np.int32) << 16)
         | ((dt.length.astype(np.int32) - 1) << 22))
    out = np.zeros(4096, np.int32)
    out[: len(e)] = e
    return out


def _decode_stream_x2(words, bitpos0, n_out, table_log, tbl, max_seg: int):
    """One X2 stream: each lookup writes 1-2 bytes (entry-packed table).

    Mirrors HUF_decodeStreamX2 (huf_decompress.c:696-720) including the
    last-symbol rule: a length-2 entry at the final position writes only
    its first byte and consumes the remaining bits (the reference clamps
    bitsConsumed to the register width there, huf_decompress.c:668-682)."""
    dt_log = table_log.astype(jnp.int32)

    def body(i, carry):
        bitpos, p, out = carry
        active = p < n_out
        avail = jnp.minimum(dt_log, jnp.maximum(bitpos, 0))
        raw = read_bits(words, bitpos - avail, avail.astype(jnp.uint32)).astype(jnp.int32)
        v = raw << (dt_log - avail)
        e = tbl[v]
        sl = (e & 0xFF).astype(jnp.uint8)
        sh = ((e >> 8) & 0xFF).astype(jnp.uint8)
        nb = (e >> 16) & 0x3F
        two = ((e >> 22) & 1) == 1
        is_last = two & (p == n_out - 1)
        out = out.at[p].set(jnp.where(active, sl, out[p]))
        p1 = jnp.minimum(p + 1, out.shape[0] - 1)
        wr2 = active & two & ~is_last
        out = out.at[p1].set(jnp.where(wr2, sh, out[p1]))
        new_bitpos = jnp.where(is_last, jnp.maximum(bitpos - nb, 0), bitpos - nb)
        bitpos = jnp.where(active, new_bitpos, bitpos)
        step = jnp.where(is_last, 1, jnp.where(two, 2, 1))
        p = jnp.where(active, p + step, p)
        return bitpos, p, out

    out0 = jnp.zeros(max_seg + 1, dtype=jnp.uint8)  # +1: 2-byte write slack
    bitpos, p, out = jax.lax.fori_loop(0, max_seg, body,
                                       (bitpos0, jnp.int32(0), out0))
    err = ((bitpos != 0) | (p != n_out)) & (n_out > 0)
    return out[:max_seg], err


@functools.partial(jax.jit, static_argnums=(5,))
def huf_decode_4x2_batch(streams_u8, csize, n_out, table_log, tbl, max_seg: int):
    """X2 analogue of huf_decode_4x1_batch; tbl[B4, 4096] int32 packed by
    pack_dtable_x2.  Wire-identical output to the X1 path (the selector is
    a speed heuristic, huf_decompress.c:1029-1051, with no format effect)."""
    words = bytes_to_words(streams_u8)
    bitpos0, bad = initial_bitpos(streams_u8, csize)
    f = lambda w, bp, n, tl, t: _decode_stream_x2(w, bp, n, tl, t, max_seg)
    out, err = jax.vmap(f)(words, bitpos0, n_out, table_log, tbl)
    return out, err | (bad & (n_out > 0))
