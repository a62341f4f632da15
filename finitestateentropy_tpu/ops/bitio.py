"""Vectorized bit-level I/O on byte buffers.

Replaces the reference's BIT_CStream/BIT_DStream register machinery
(lib/bitstream.h) with array programs:

* reading: the stream is viewed as little-endian u32 words; an arbitrary
  <=25-bit field at bit offset p is two gathered words funnel-shifted —
  no loop-carried register, so reads vectorize across blocks;
* writing: a stream is the concatenation of (value, nbBits) fields in
  emission order; field bit offsets are a prefix sum and the bytes are
  produced by a scatter-add of non-overlapping word contributions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bytes_to_words(buf_u8):
    """[..., 4*W] uint8 -> [..., W] uint32 little-endian."""
    b = buf_u8.astype(jnp.uint32)
    return (
        b[..., 0::4]
        | (b[..., 1::4] << 8)
        | (b[..., 2::4] << 16)
        | (b[..., 3::4] << 24)
    )


def words_to_bytes(words_u32):
    """[..., W] uint32 -> [..., 4*W] uint8 little-endian."""
    w = words_u32
    parts = jnp.stack(
        [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1
    )
    return parts.reshape(*w.shape[:-1], w.shape[-1] * 4).astype(jnp.uint8)


def read_bits(words, bitpos, nb):
    """Read `nb` (<=25, may be traced) bits at absolute bit offset `bitpos`.

    words: [W] uint32 (one block's stream); bitpos, nb: scalars (traced).
    Out-of-range offsets are clamped (never OOB) — corrupt streams yield
    garbage values plus an error flag downstream, mirroring the reference's
    "never overread, detect later" contract (bitstream.h:416-440).
    """
    bitpos = jnp.maximum(bitpos, 0)
    word = bitpos >> 5
    sh = (bitpos & 31).astype(jnp.uint32)
    w0 = words[jnp.minimum(word, words.shape[0] - 1)]
    w1 = words[jnp.minimum(word + 1, words.shape[0] - 1)]
    lo = w0 >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh))
    window = lo | hi
    mask = (jnp.uint32(1) << nb.astype(jnp.uint32)) - jnp.uint32(1)
    return window & mask


def pack_fields(values, nbbits, out_words: int):
    """Pack per-field (value, nbBits) into a little-endian bitstream.

    values, nbbits: [B, F] (uint32 / int32); fields are emitted in order,
    padding fields must have nbBits == 0.  Returns (words[B, out_words]
    uint32, total_bits[B] int32).
    """
    B, F = values.shape
    nb = nbbits.astype(jnp.int32)
    vals = values.astype(jnp.uint32) & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
    offs = jnp.cumsum(nb, axis=1) - nb          # exclusive prefix sum
    total_bits = offs[:, -1] + nb[:, -1]

    word = offs >> 5
    sh = (offs & 31).astype(jnp.uint32)
    lo = vals << sh
    hi = jnp.where(sh == 0, jnp.uint32(0), vals >> (jnp.uint32(32) - sh))

    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, F))
    flat_lo = (bidx * (out_words + 1) + jnp.minimum(word, out_words)).ravel()
    flat_hi = (bidx * (out_words + 1) + jnp.minimum(word + 1, out_words)).ravel()
    acc = jnp.zeros(B * (out_words + 1), dtype=jnp.uint32)
    acc = acc.at[flat_lo].add(lo.ravel())
    acc = acc.at[flat_hi].add(hi.ravel())
    words = acc.reshape(B, out_words + 1)[:, :out_words]
    return words, total_bits


def initial_bitpos(stream_u8, csize):
    """Absolute bit offset of the endMark (== payload bit count).

    stream_u8: [B, S]; csize: [B]. Mirrors BIT_initDStream's
    last-byte-highbit rule (bitstream.h:282-284).
    """
    B = stream_u8.shape[0]
    last = jnp.take_along_axis(
        stream_u8, jnp.maximum(csize - 1, 0)[:, None], axis=1, mode="clip"
    )[:, 0].astype(jnp.uint32)
    hb = 31 - jax.lax.clz(jnp.maximum(last, 1))
    bitpos = (csize - 1) * 8 + hb.astype(jnp.int32)
    bad = last == 0  # endMark missing
    return jnp.where(csize > 0, bitpos, 0), bad
