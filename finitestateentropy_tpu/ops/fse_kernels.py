"""Batched FSE (tANS) encode/decode device kernels.

The reference's per-block serial loops (fse_compress.c:554-611,
fse_decompress.c:178-238) become lax.fori_loop chains whose bodies are
vmapped across the block batch: per chain step every block advances its two
interleaved coder states, so throughput scales with batch width.

Wire-format invariants preserved exactly: 2-state interleave (state1 on even
symbol indices), backward traversal, initCState2 free first symbols, field
emission order j = n-3..0 followed by state2/state1 flushes and the endMark.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitio import bytes_to_words, initial_bitpos, pack_fields, read_bits


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_block(words, bitpos0, n_out, table_log, new_state, symbol, nb_bits, max_out: int):
    """One block's 2-state decode; vmapped over the batch.

    words: [W] uint32 stream; n_out: symbols to produce; tables: [max_size].
    Returns (out[max_out] uint8, err flag).
    """
    tl = table_log.astype(jnp.uint32)
    bitpos = bitpos0 - table_log
    s1 = read_bits(words, bitpos, tl).astype(jnp.int32)
    bitpos = bitpos - table_log
    s2 = read_bits(words, bitpos, tl).astype(jnp.int32)

    steps = max_out // 2

    # The last two symbols are reconstructed from the encoder's initial
    # states, which emitted no bits (FSE_initCState2); their transition
    # reads run past the stream start, exactly like the reference's
    # overflow-tail reads. Bit accounting is therefore validated at the
    # checkpoint after n-2 reads (bitpos must be exactly 0 there).
    def body(t, carry):
        s1, s2, bitpos, bp_check, out = carry
        i0 = 2 * t
        i1 = i0 + 1
        a0 = i0 < n_out
        a1 = i1 < n_out

        tmax = symbol.shape[0] - 1
        e1 = jnp.clip(s1, 0, tmax)  # even symbol index -> state1 (clamped: corrupt
        sym0 = symbol[e1]           # streams must never gather out of bounds)
        nb0 = nb_bits[e1]
        bp0 = bitpos - nb0
        low0 = read_bits(words, bp0, nb0.astype(jnp.uint32)).astype(jnp.int32)
        ns1 = new_state[e1] + low0

        e2 = jnp.clip(s2, 0, tmax)
        sym1 = symbol[e2]
        nb1 = nb_bits[e2]
        bp1 = bp0 - nb1
        low1 = read_bits(words, bp1, nb1.astype(jnp.uint32)).astype(jnp.int32)
        ns2 = new_state[e2] + low1

        out = jax.lax.dynamic_update_slice(
            out,
            jnp.stack([
                jnp.where(a0, sym0, 0).astype(jnp.uint8),
                jnp.where(a1, sym1, 0).astype(jnp.uint8),
            ])[None, :],
            (t, 0),
        )
        s1 = jnp.where(a0, ns1, s1)
        s2 = jnp.where(a1, ns2, s2)
        bp_check = jnp.where(i0 == n_out - 3, bp0, bp_check)
        bp_check = jnp.where(i1 == n_out - 3, bp1, bp_check)
        bitpos = jnp.where(a1, bp1, jnp.where(a0, bp0, bitpos))
        return s1, s2, bitpos, bp_check, out

    out0 = jnp.zeros((steps, 2), dtype=jnp.uint8)
    s1, s2, bitpos, bp_check, out = jax.lax.fori_loop(
        0, steps, body, (s1, s2, bitpos, jnp.int32(-1), out0)
    )
    err = (bp_check != 0) & (n_out > 2)
    return out.reshape(max_out), err


@functools.partial(jax.jit, static_argnums=(6,))
def fse_decode_batch(streams_u8, csize, n_out, table_log, dtables, bad_init_mask=None,
                     max_out: int = 32768):
    """streams_u8[B, S], csize[B], n_out[B], table_log[B],
    dtables = (new_state[B, T], symbol[B, T], nb_bits[B, T]).
    Returns (out[B, max_out] uint8, err[B] bool)."""
    new_state, symbol, nb_bits = dtables
    words = bytes_to_words(streams_u8)
    bitpos0, bad = initial_bitpos(streams_u8, csize)
    f = lambda w, bp, n, tl, ns, sym, nb: _decode_block(
        w, bp, n, tl, ns, sym, nb, max_out
    )
    out, err = jax.vmap(f)(words, bitpos0, n_out, table_log, new_state, symbol, nb_bits)
    err = err | bad
    if bad_init_mask is not None:
        err = err | bad_init_mask
    return out, err


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _encode_block(src, n, table_log, state_table, dfs, dnb, max_syms: int):
    """One block's 2-state chain; emits (value, nbBits) fields in order.

    Returns (field_vals[max_syms+3], field_nbs[max_syms+3]).
    """
    tsize_max = state_table.shape[0]

    def sym_at(j):
        return src[jnp.clip(j, 0, src.shape[0] - 1)].astype(jnp.int32)

    def init_state(sym):
        # FSE_initCState2 (lib/fse.h:500-512)
        d = dnb[sym]
        nb = (d + (1 << 15)) >> 16
        v = (nb << 16) - d
        idx = jnp.clip((v >> nb) + dfs[sym], 0, tsize_max - 1)
        return state_table[idx]

    # last two symbols absorbed by state init: even index -> state1
    j_last = n - 1
    j_prev = n - 2
    sym_last = sym_at(j_last)
    sym_prev = sym_at(j_prev)
    last_even = (j_last & 1) == 0
    c1 = jnp.where(last_even, init_state(sym_last), init_state(sym_prev))
    c2 = jnp.where(last_even, init_state(sym_prev), init_state(sym_last))

    m = jnp.maximum(n - 2, 0)  # chain fields
    steps = (max_syms + 1) // 2

    vals0 = jnp.zeros(max_syms + 3, dtype=jnp.int32)
    nbs0 = jnp.zeros(max_syms + 3, dtype=jnp.int32)

    def enc(state, sym):
        nb = (state + dnb[sym]) >> 16
        idx = jnp.clip((state >> nb) + dfs[sym], 0, tsize_max - 1)
        return state_table[idx], state, nb  # (next, emitted value, nb)

    def body(t, carry):
        c1, c2, vals, nbs = carry
        e0 = 2 * t
        e1 = e0 + 1
        j0 = n - 3 - e0
        j1 = n - 3 - e1
        a0 = e0 < m
        a1 = e1 < m

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

        c1, c2, v0, nb0 = step(c1, c2, j0, a0)
        c1, c2, v1, nb1 = step(c1, c2, j1, a1)
        vals = jax.lax.dynamic_update_slice(vals, jnp.stack([v0, v1]), (e0,))
        nbs = jax.lax.dynamic_update_slice(nbs, jnp.stack([nb0, nb1]), (e0,))
        return c1, c2, vals, nbs

    c1, c2, vals, nbs = jax.lax.fori_loop(0, steps, body, (c1, c2, vals0, nbs0))

    # tail: flush state2, state1, endMark (fse_compress.c:608-610)
    bidx = m
    vals = vals.at[bidx].set(c2).at[bidx + 1].set(c1).at[bidx + 2].set(1)
    nbs = nbs.at[bidx].set(table_log).at[bidx + 1].set(table_log).at[bidx + 2].set(1)
    return vals, nbs


@functools.partial(jax.jit, static_argnums=(5, 6))
def fse_encode_batch(src_u8, n, table_log, ctables, _unused=None,
                     max_syms: int = 32768, out_bytes: int = 36000):
    """src_u8[B, S], n[B], table_log[B],
    ctables = (state_table[B, T], dfs[B, nsym], dnb[B, nsym]).
    Returns (payload_words[B, W] uint32, csize[B] int32).
    Payload bytes = first csize[b] bytes of the LE word stream."""
    state_table, dfs, dnb = ctables
    f = lambda s, nn, tl, st, d1, d2: _encode_block(s, nn, tl, st, d1, d2, max_syms)
    vals, nbs = jax.vmap(f)(src_u8, n, table_log, state_table, dfs, dnb)
    out_words = (out_bytes + 3) // 4
    words, total_bits = pack_fields(vals, nbs, out_words)
    csize = (total_bits + 7) >> 3
    return words, csize
