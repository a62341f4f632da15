"""Batched FSE (tANS) encode/decode device kernels.

The reference's per-block serial loops (fse_compress.c:554-611,
fse_decompress.c:178-238) become `lax.scan` chains over the symbol index
whose per-step state is only the coder states + bit positions of every
block; per-step outputs stream out through scan's stacked `ys`, so there is
no large loop-carried buffer (a fori_loop carrying the output array forces
XLA to copy it every step).  Each step performs a handful of *batched*
dynamic gathers across the whole block batch — the TPU's vector gather
sustains hundreds of G-lookups/s, so throughput scales with batch width.

Wire-format invariants preserved exactly: 2-state interleave (state1 on even
symbol indices), backward traversal, initCState2 free first symbols, field
emission order j = n-3..0 followed by state2/state1 flushes and the endMark.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitio import bytes_to_words, initial_bitpos, pack_fields

_UNROLL = 8


def _gather1(tbl, idx):
    """tbl[B, T], idx[B] -> tbl[b, idx[b]]  (clamped)."""
    idx = jnp.clip(idx, 0, tbl.shape[1] - 1)
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def _read_bits_batch(words, bitpos, nb):
    """Batched bit-field read.

    words[B, W] uint32 LE; bitpos[B] absolute bit offsets (clamped at 0);
    nb[B] field widths (<=25).  Mirrors bitstream.h:345 lookBits semantics.
    """
    bp = jnp.maximum(bitpos, 0)
    word = bp >> 5
    sh = (bp & 31).astype(jnp.uint32)
    wmax = words.shape[1] - 1
    idx = jnp.stack([jnp.minimum(word, wmax), jnp.minimum(word + 1, wmax)], axis=1)
    w = jnp.take_along_axis(words, idx, axis=1)
    lo = w[:, 0] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), w[:, 1] << (jnp.uint32(32) - sh))
    mask = (jnp.uint32(1) << nb.astype(jnp.uint32)) - jnp.uint32(1)
    return (lo | hi) & mask


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(6,))
def fse_decode_batch(streams_u8, csize, n_out, table_log, dtables, bad_init_mask=None,
                     max_out: int = 32768):
    """streams_u8[B, S], csize[B], n_out[B], table_log[B],
    dtables = (new_state[B, T], symbol[B, T], nb_bits[B, T]).
    Returns (out[B, max_out] uint8, err[B] bool)."""
    new_state, symbol, nb_bits = dtables
    B = streams_u8.shape[0]
    words = bytes_to_words(streams_u8)
    bitpos0, bad = initial_bitpos(streams_u8, csize)

    # one gather per state: newState(16) | nbBits(8) | symbol(8)
    packed = (
        (new_state.astype(jnp.uint32) << 16)
        | (nb_bits.astype(jnp.uint32) << 8)
        | symbol.astype(jnp.uint32)
    )

    tl = table_log.astype(jnp.uint32)
    bitpos = bitpos0 - table_log
    s1 = _read_bits_batch(words, bitpos, tl).astype(jnp.int32)
    bitpos = bitpos - table_log
    s2 = _read_bits_batch(words, bitpos, tl).astype(jnp.int32)

    steps = max_out // 2

    # The last two symbols are reconstructed from the encoder's initial
    # states, which emitted no bits (FSE_initCState2); their transition
    # reads run past the stream start, exactly like the reference's
    # overflow-tail reads.  Bit accounting is validated at the checkpoint
    # after n-2 reads (bitpos must be exactly 0 there).
    def body(carry, t):
        s1, s2, bitpos, bp_check = carry
        i0 = 2 * t
        i1 = i0 + 1
        a0 = i0 < n_out
        a1 = i1 < n_out

        e1 = _gather1(packed, s1)           # even symbol index -> state1
        sym0 = (e1 & 0xFF).astype(jnp.uint8)
        nb0 = ((e1 >> 8) & 0xFF).astype(jnp.int32)
        bp0 = bitpos - nb0
        low0 = _read_bits_batch(words, bp0, nb0).astype(jnp.int32)
        ns1 = (e1 >> 16).astype(jnp.int32) + low0

        e2 = _gather1(packed, s2)
        sym1 = (e2 & 0xFF).astype(jnp.uint8)
        nb1 = ((e2 >> 8) & 0xFF).astype(jnp.int32)
        bp1 = bp0 - nb1
        low1 = _read_bits_batch(words, bp1, nb1).astype(jnp.int32)
        ns2 = (e2 >> 16).astype(jnp.int32) + low1

        s1 = jnp.where(a0, ns1, s1)
        s2 = jnp.where(a1, ns2, s2)
        bp_check = jnp.where(i0 == n_out - 3, bp0, bp_check)
        bp_check = jnp.where(i1 == n_out - 3, bp1, bp_check)
        bitpos = jnp.where(a1, bp1, jnp.where(a0, bp0, bitpos))
        ys = jnp.stack(
            [jnp.where(a0, sym0, 0), jnp.where(a1, sym1, 0)], axis=1
        )  # [B, 2]
        return (s1, s2, bitpos, bp_check), ys

    init = (s1, s2, bitpos, jnp.full((B,), -1, jnp.int32))
    (s1, s2, bitpos, bp_check), ys = jax.lax.scan(
        body, init, jnp.arange(steps, dtype=jnp.int32), unroll=_UNROLL
    )
    # ys: [steps, B, 2] -> [B, steps*2]
    out = jnp.transpose(ys, (1, 0, 2)).reshape(B, max_out)
    err = (bp_check != 0) & (n_out > 2)
    err = err | bad
    if bad_init_mask is not None:
        err = err | bad_init_mask
    return out, err


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(5, 6))
def fse_encode_batch(src_u8, n, table_log, ctables, _unused=None,
                     max_syms: int = 32768, out_bytes: int = 36000):
    """src_u8[B, S], n[B], table_log[B],
    ctables = (state_table[B, T], dfs[B, nsym], dnb[B, nsym]).
    Returns (payload_words[B, W] uint32, csize[B] int32).
    Payload bytes = first csize[b] bytes of the LE word stream."""
    state_table, dfs, dnb = ctables
    B = src_u8.shape[0]
    src_i = src_u8.astype(jnp.int32)

    def sym_at(j):
        return _gather1(src_i, j)

    def init_state(sym):
        # FSE_initCState2 (lib/fse.h:500-512)
        d = _gather1(dnb, sym)
        nb = (d + (1 << 15)) >> 16
        v = (nb << 16) - d
        return _gather1(state_table, (v >> nb) + _gather1(dfs, sym))

    # last two symbols absorbed by state init: even index -> state1
    j_last = n - 1
    j_prev = n - 2
    s_last = init_state(sym_at(j_last))
    s_prev = init_state(sym_at(j_prev))
    last_even = (j_last & 1) == 0
    c1 = jnp.where(last_even, s_last, s_prev)
    c2 = jnp.where(last_even, s_prev, s_last)

    m = jnp.maximum(n - 2, 0)  # chain fields
    steps = (max_syms + 1) // 2

    def enc(state, sym):
        nb = (state + _gather1(dnb, sym)) >> 16
        nxt = _gather1(state_table, (state >> nb) + _gather1(dfs, sym))
        return nxt, state, nb  # (next, emitted value, nb)

    def step(c1, c2, j, active):
        sym = sym_at(j)
        odd = (j & 1) == 1
        state = jnp.where(odd, c2, c1)
        nstate, val, nb = enc(state, sym)
        c1n = jnp.where(odd, c1, nstate)
        c2n = jnp.where(odd, nstate, c2)
        c1 = jnp.where(active, c1n, c1)
        c2 = jnp.where(active, c2n, c2)
        return c1, c2, jnp.where(active, val, 0), jnp.where(active, nb, 0)

    def body(carry, t):
        c1, c2 = carry
        e0 = 2 * t
        e1 = e0 + 1
        c1, c2, v0, nb0 = step(c1, c2, n - 3 - e0, e0 < m)
        c1, c2, v1, nb1 = step(c1, c2, n - 3 - e1, e1 < m)
        # pack (value, nbBits) in one i32: val in low 16 bits, nb in high
        ys = jnp.stack([(nb0 << 16) | v0, (nb1 << 16) | v1], axis=1)
        return (c1, c2), ys

    (c1, c2), ys = jax.lax.scan(
        body, (c1, c2), jnp.arange(steps, dtype=jnp.int32), unroll=_UNROLL
    )
    fields = jnp.transpose(ys, (1, 0, 2)).reshape(B, 2 * steps)
    vals = fields & 0xFFFF
    nbs = fields >> 16

    # tail: flush state2, state1, endMark (fse_compress.c:608-610) — append
    # 3 slots and scatter at the per-block boundary m.
    pad = jnp.zeros((B, 3), jnp.int32)
    vals = jnp.concatenate([vals, pad], axis=1)
    nbs = jnp.concatenate([nbs, pad], axis=1)
    rows = jnp.arange(B, dtype=jnp.int32)
    vals = vals.at[rows, m].set(c2).at[rows, m + 1].set(c1).at[rows, m + 2].set(1)
    tlog = table_log.astype(jnp.int32)
    nbs = nbs.at[rows, m].set(tlog).at[rows, m + 1].set(tlog).at[rows, m + 2].set(1)

    out_words = (out_bytes + 3) // 4
    words, total_bits = pack_fields(vals, nbs, out_words)
    csize = (total_bits + 7) >> 3
    return words, csize
