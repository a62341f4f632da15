"""Pallas TPU kernels for TurboRANS (lane-interleaved rANS, 16-bit renorm).

Both kernels advance 1024 rANS chains per inner-loop step:

* decode: 16-chunk lane-gather resolves the 2048-slot table; renorm lanes
  read one halfword each from a dynamic 16-row window of the VMEM-resident
  (halfword-expanded) stream at positions cursor - rank, rank from an MXU
  within-row prefix sum + scalar row offsets.
* encode: runs steps in reverse; renorm emissions are placed by a pull
  (each output slot binary-searches the lane whose rank owns it), so the
  packing needs no scatter primitive at all.  Division by freq uses a
  mulhi magic-multiply with two branchless corrections.

The coder math matches rans.py's host twin bit for bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .format import TURBO_LANES
from .rans import RANS_L, RANS_TABLELOG, rans_decode_table, rans_freqs

TSIZE = 1 << RANS_TABLELOG
TCHUNKS = TSIZE // 128

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left
_SIGN = np.int32(np.uint32(0x80000000))


def _chunk_gather(rows, idx, n_chunks, shape):
    hi = _srl(idx, 7)
    lo = idx & 127
    acc = jnp.zeros(shape, jnp.int32)
    for h in range(n_chunks):
        row = jnp.broadcast_to(rows[h : h + 1, :], shape)
        v = jnp.take_along_axis(row, lo, axis=1)
        acc = jnp.where(hi == h, v, acc)
    return acc


def _uge(a, b):
    """Unsigned a >= b on int32 bit patterns."""
    return (a ^ _SIGN) >= (b ^ _SIGN)


def _mulhi32(a, b):
    """High 32 bits of the unsigned 64-bit product of two u32 bit patterns."""
    al = a & 0xFFFF
    ah = _srl(a, 16)
    bl = b & 0xFFFF
    bh = _srl(b, 16)
    albl = al * bl
    albh = al * bh
    ahbl = ah * bl
    ahbh = ah * bh
    mid = _srl(albl, 16) + (albh & 0xFFFF) + (ahbl & 0xFFFF)
    return ahbh + _srl(albh, 16) + _srl(ahbl, 16) + _srl(mid, 16)


def _flat_prefix(nb, tria, scr_ref, shape):
    """Inclusive prefix over row-major [8,128] + scalar total.

    nb values must be bf16-exact (<= 255).  Returns (prefix, total_scalar).
    """
    aug = jax.lax.dot_general(
        nb.astype(jnp.bfloat16), tria, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    within = aug[:, :128].astype(jnp.int32)
    scr_ref[0:8, 0:1] = aug[:, 128:129].astype(jnp.int32)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    offs = []
    acc = 0
    for r in range(8):
        offs.append(acc)
        acc = acc + scr_ref[r, 0]
    rowoff = jnp.zeros(shape, jnp.int32)
    for r in range(1, 8):
        rowoff = jnp.where(rows8 == r, offs[r], rowoff)
    return within + rowoff, acc


def _make_tria():
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 129), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 129), 1)
    return (c_iota >= r_iota).astype(jnp.bfloat16)


def _make_tril8():
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    return (c_iota < r_iota).astype(jnp.bfloat16)


def _flag_prefix(flags, tria, tril8, scr_ref, shape):
    """Inclusive flat prefix of 0/1 flags: two bf16 matmuls (row totals
    <= 128 are bf16-exact), one scalar round-trip for the total."""
    aug = jax.lax.dot_general(
        flags.astype(jnp.bfloat16), tria, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    within = aug[:, :128]
    rowtot = aug[:, 128:129]
    rowpre = jax.lax.dot_general(
        tril8, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    prefix = (within + rowpre).astype(jnp.int32)
    scr_ref[0:1, 0:1] = (rowpre[7:8] + rowtot[7:8]).astype(jnp.int32)
    rowtot_b = jnp.broadcast_to(rowtot, flags.shape).astype(jnp.int32)
    return prefix, scr_ref[0, 0], rowtot_b



def _sym_advance(table_row_fn, tchunks, shape, thi, tlo, slot, x, tlog,
                 u16, u16x, pair=False):
    """Table lookup + state advance for one decode step.

    u16x (symbols 1024..4095): split tables — rows [0, tchunks) hold
    e1 = (freq << 13) | j  (j = slot - cumul, precomputed), rows
    [tchunks, 2*tchunks) hold the 12-bit symbol.  The symbol gather is off
    the serial path (x depends only on e1).

    pair (order-1 byte pairs, turbo/pair.py): one-word entries
    (pair_id << 2*tlog) | (freq << tlog) | (slot - cumul) in rows
    [0, tchunks), plus a 256-entry pair-value LUT in rows [tchunks,
    tchunks+2) gathered by pair_id OFF the serial path — 2 extra chunks
    per step buys 2 output bytes/step (the HUF X2 move,
    lib/huf_decompress.c:454-649, applied to rANS)."""
    def gather(off):
        acc = jnp.zeros(shape, jnp.int32)
        for h in range(tchunks):
            row = jnp.broadcast_to(table_row_fn(off + h), shape)
            acc = jnp.where(thi == h, jnp.take_along_axis(row, tlo, axis=1), acc)
        return acc

    if pair:
        tmask = (1 << tlog) - 1
        e = gather(0)
        j = e & tmask
        f = _srl(e, tlog) & tmask
        sid = _srl(e, 2 * tlog)
        x = f * _srl(x, tlog) + j
        phi = _srl(sid, 7)
        plo = sid & 127
        pv = jnp.zeros(shape, jnp.int32)
        for h in range(2):
            row = jnp.broadcast_to(table_row_fn(tchunks + h), shape)
            pv = jnp.where(phi == h, jnp.take_along_axis(row, plo, axis=1), pv)
        return pv, x
    if u16x:
        e1 = gather(0)
        j = e1 & 0x1FFF                 # slot - cumul, < 2^13 (tlog <= 13)
        f = _srl(e1, 13)
        x = f * _srl(x, tlog) + j
        sym = gather(tchunks)
        return sym, x
    e = gather(0)
    if u16:  # (cumul << 21) | (freq << 10) | sym, rans16.py
        sym = e & 0x3FF
        f = _srl(e, 10) & 0x7FF
        c = _srl(e, 21)
    else:    # (cumul << 20) | (freq << 8) | sym, rans.py
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        c = _srl(e, 20)
    return sym, f * _srl(x, tlog) + slot - c


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _rans_decode_kernel(csize_ref, table_ref, init_ref, stream_ref,
                        out_ref, scr_ref, *, t4_count, srows, u16=False,
                        tlog=RANS_TABLELOG, u16x=False, pair=False):
    shape = (8, 128)
    g = pl.program_id(0)
    cursor0 = csize_ref[g]
    tria = _make_tria()
    tril8 = _make_tril8()

    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)

    def step(x, cursor):
        slot = x & (tsize - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        sym, x = _sym_advance(lambda h: table_ref[0, h : h + 1, :], tchunks,
                              shape, thi, tlo, slot, x, tlog, u16, u16x, pair)
        flag = _srl(x, 16) == 0
        rank, total = _flat_prefix(flag.astype(jnp.int32), tria, scr_ref, shape)
        pos = cursor - rank
        # packed window (2 halfwords/word): rows [base, base+5) of 128
        # words always contain the word span of [cursor-1024, cursor)
        wpos = _srl(pos, 1)
        parity = pos & 1
        base_row = jnp.clip(_srl(jnp.maximum(cursor - 1024, 0), 8), 0,
                            srows - 8)
        relw = jnp.clip(wpos - base_row * 128, 0, 639)
        hi = _srl(relw, 7)
        lo = relw & 127
        v32 = jnp.zeros(shape, jnp.int32)
        for h in range(5):
            row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
            v32 = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v32)
        v = jnp.where(parity == 1, _srl(v32, 16), v32) & 0xFFFF
        x = jnp.where(flag, _sll(x, 16) | v, x)
        return sym, x, cursor - total

    def body(t4, carry):
        x, cursor = carry
        if u16:  # 2 u16 symbols per output word
            sym0, x, cursor = step(x, cursor)
            sym1, x, cursor = step(x, cursor)
            tile = sym0 | _sll(sym1, 16)
        else:    # 4 bytes per output word
            sym0, x, cursor = step(x, cursor)
            sym1, x, cursor = step(x, cursor)
            sym2, x, cursor = step(x, cursor)
            sym3, x, cursor = step(x, cursor)
            tile = sym0 | _sll(sym1, 8) | _sll(sym2, 16) | _sll(sym3, 24)
        out_ref[pl.ds(t4 * 8, 8), :] = tile
        return x, cursor

    x0 = init_ref[0]
    x, cursor = jax.lax.fori_loop(0, t4_count, body, (x0, cursor0))
    # trailer: residue tiles — all-zero iff stream well-formed
    out_ref[pl.ds(t4_count * 8, 8), :] = x ^ RANS_L
    out_ref[pl.ds(t4_count * 8 + 8, 8), :] = jnp.full(shape, cursor, jnp.int32)


def stream_word_rows(hrows: int) -> int:
    """Packed-stream row count for a given halfword-row geometry: the wire
    payload packs 2 LE halfwords per i32 word (the kernels' native layout;
    the payload BYTES are exactly these words little-endian)."""
    return ((hrows + 1) // 2 + 8 + 7) // 8 * 8


def pack_stream_words(payload: bytes, srows: int) -> np.ndarray:
    """Stage a wire payload into the packed [srows,128] i32 word layout the
    decode kernels consume — a pure numpy view, no per-halfword work."""
    out = np.zeros(srows * 128, np.int32)
    w = np.frombuffer(payload + b"\0" * (-len(payload) % 4), "<u4")
    out[: len(w)] = w.view(np.int32)
    return out.reshape(srows, 128)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def rans_decode(csize_hw, tables, init_states, streams,
                t4_count: int, hrows: int, interpret: bool = False,
                u16: bool = False, tlog: int = RANS_TABLELOG,
                u16x: bool = False, pair: bool = False):
    """csize_hw[G] i32; tables[G,16,128] i32; init_states[G,8,128] i32 (u32
    bits); streams[G, stream_word_rows(hrows), 128] i32 (PACKED payload
    words, 2 LE halfwords each — see pack_stream_words).
    Returns (out[G, t4_count*8, 128] i32 bytes, err[G] i32, 0 = ok)."""
    G = tables.shape[0]
    rows = t4_count * 8 + 16
    srows = stream_word_rows(hrows)
    assert streams.shape[1] == srows, (streams.shape, srows)
    kern = functools.partial(_rans_decode_kernel, t4_count=t4_count,
                             srows=srows, u16=u16, tlog=tlog, u16x=u16x,
                             pair=pair)
    tch = tables.shape[1]
    pk = streams.reshape(G, srows * 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, tch, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((srows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32),
        interpret=interpret,
    )(csize_hw, tables, init_states, pk.reshape(G * srows, 128))
    out = out.reshape(G, rows, 128)
    err = jnp.abs(out[:, t4_count * 8 :, :]).max(axis=(1, 2))
    return out[:, : t4_count * 8, :], err


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _rans_encode_kernel(fc_ref, magic_ref, src_ref, out_ref, scr_ref,
                        *, t4_count, hrows_cap, u16=False,
                        tlog=RANS_TABLELOG, steptots=True):
    shape = (8, 128)
    tria = _make_tria()
    tril8 = _make_tril8()
    thresh_shift = 32 - tlog
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    spc = 2 if u16 else 4            # steps per supercycle
    tiles_span = 128 // spc          # supercycles per steptot tile

    def div(x, f, m):
        q = _mulhi32(x, m)
        r = x - q * f
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        return q, r

    n_sym_chunks = fc_ref.shape[1]   # 2 (bytes), 8 (u16<=1023), 32 (u16 4k)

    def step(x, cursor, tile, t, word, p):
        if u16:
            sym = _srl(word, 16 * p) & 0xFFFF
        else:
            sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(n_sym_chunks):
            frow = jnp.broadcast_to(fc_ref[0, h : h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[0, h : h + 1, :], shape)
            hit = shi == h
            e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
            m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
        if n_sym_chunks == 32:     # wide u16 tables: 14-bit fields
            f = e & 0x3FFF
            c = _srl(e, 14)
        else:
            f = e & 0xFFF
            c = _srl(e, 12) & 0xFFF

        flag = _uge(x, _sll(f, thresh_shift))
        emit = x & 0xFFFF
        x = jnp.where(flag, _srl(x, 16), x)
        q, r = div(x, f, m)
        x = _sll(q, tlog) + c + r

        rank, total, rowtot_b = _flag_prefix(flag.astype(jnp.int32), tria,
                                             tril8, scr_ref, shape)
        if steptots:
            tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)

        # pull: output halfword at absolute position pos in [cursor,
        # cursor+total) holds the lane with rank = cursor + total - pos.
        # Main pass covers slots [base*128, base*128+1024); a predicated
        # spill pass handles the rare (cursor&127)+total > 1024 overflow.
        def pull_pass(base_row):
            pos = base_row * 128 \
                + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            want = cursor + total - pos        # rank wanted at this slot
            valid = (want >= 1) & (want <= total) & (pos >= cursor)
            # binary search: first flat lane whose inclusive rank >= want
            lo = jnp.zeros(shape, jnp.int32)
            hi_b = jnp.full(shape, TURBO_LANES - 1, jnp.int32)
            for _ in range(10):
                mid = _srl(lo + hi_b, 1)
                rv = _chunk_gather(rank, mid, 8, shape)
                ge = rv >= want
                hi_b = jnp.where(ge, mid, hi_b)
                lo = jnp.where(ge, lo, mid + 1)
            val = _chunk_gather(emit, hi_b, 8, shape)
            old = out_ref[pl.ds(base_row, 8), :]
            out_ref[pl.ds(base_row, 8), :] = jnp.where(valid, val, old)

        base_row = jnp.clip(_srl(cursor, 7), 0, hrows_cap - 16)
        pull_pass(base_row)
        pull_pass(base_row + 8)
        return x, cursor + total, tile

    def body(i, carry):
        x, cursor, tile = carry
        t4 = t4_count - 1 - i
        # entering a new steptot tile region (descending t4): reset
        tile = jnp.where((t4 % tiles_span) == tiles_span - 1,
                         jnp.zeros(shape, jnp.int32), tile)
        word = src_ref[pl.ds(t4 * 8, 8), :]
        if u16:
            x, cursor, tile = step(x, cursor, tile, 2 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 2 * t4, word, 0)
        else:
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 3, word, 3)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 2, word, 2)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 4 * t4, word, 0)
        if steptots:
            # unconditional flush: the last (smallest-t4) write per region wins
            out_ref[pl.ds(hrows_cap + 16 + (t4 // tiles_span) * 8, 8), :] = tile
        return x, cursor, tile

    x0 = jnp.full(shape, RANS_L, jnp.int32)
    x, cursor, _ = jax.lax.fori_loop(
        0, t4_count, body, (x0, jnp.int32(0), jnp.zeros(shape, jnp.int32)))
    out_ref[pl.ds(hrows_cap, 8), :] = x
    out_ref[pl.ds(hrows_cap + 8, 8), :] = jnp.full(shape, cursor, jnp.int32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def rans_encode(fc_tables, magic_tables, src_words,
                t4_count: int, hrows_cap: int, interpret: bool = False,
                u16: bool = False, tlog: int = RANS_TABLELOG,
                steptots: bool = True):
    """fc_tables[G,nch,128] i32 ((cumul<<12)|freq); magic_tables[G,nch,128]
    i32 (floor(2^32/freq) bits); src_words[G, t4_count*8, 128] i32.
    nch = 2 (byte symbols) or 8 (u16 symbols <= 1023).
    Returns (stream[G,hrows_cap,128] i32 halfword-expanded, final_states
    [G,8,128] i32, csize_hw[G] i32)."""
    G = fc_tables.shape[0]
    nch = fc_tables.shape[1]
    spc = 2 if u16 else 4
    T = t4_count * spc
    sect_rows = (((t4_count + (128 // spc) - 1) // (128 // spc)) * 8
                 if steptots else 0)
    rows = hrows_cap + 16 + sect_rows
    kern = functools.partial(_rans_encode_kernel, t4_count=t4_count,
                             hrows_cap=hrows_cap, u16=u16, tlog=tlog,
                             steptots=steptots)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, nch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        interpret=interpret,
    )(fc_tables, magic_tables, src_words.reshape(G * t4_count * 8, 128))
    out = out.reshape(G, rows, 128)
    if steptots:
        sect = out[:, hrows_cap + 16 :, :]              # [G, tiles*8, 128]
        stots = (
            sect.reshape(G, sect_rows // 8, 8, 128)
            .transpose(0, 1, 3, 2)
            .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :]
        )
    else:
        stots = None
    return (out[:, :hrows_cap, :], out[:, hrows_cap : hrows_cap + 8, :],
            out[:, hrows_cap + 8, 0], stots)


# ---------------------------------------------------------------------------
# Encode v2: packed output words + src chunked over a second grid dim.
# Packing the stream 2 halfwords/word turns the two pull passes into ONE
# (a 1024-word window covers the whole <= 1279-halfword step span) and
# halves the out buffer; chunking the src reads lets one coder chain span
# multi-MiB groups (x/cursor persist in scratch across sequential grid
# steps), which amortizes the 4 KiB init-state section for ratio parity.
# Wire is identical to _rans_encode_kernel's.
# ---------------------------------------------------------------------------


def _rans_encode2_kernel(fc_ref, magic_ref, src_ref, out_ref, tail_ref,
                         sect_ref, scr_ref, xs_ref, cv_ref, tile_ref,
                         *, chunk_t4, n_chunks, hcap_p, u16=False,
                         tlog=RANS_TABLELOG, steptots=True, quad=False):
    shape = (8, 128)
    tria = _make_tria()
    tril8 = _make_tril8()
    thresh_shift = 32 - tlog
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    # steps per supercycle: quad (turbo/quad.py) codes ONE id per lane
    # word, so the byte extraction at p=0 reads it directly
    spc = 1 if quad else 2 if u16 else 4
    tiles_span = 128 // spc          # supercycles per steptot tile
    c = pl.program_id(1)
    t4_count = chunk_t4 * n_chunks

    @pl.when(c == 0)
    def _init():
        xs_ref[...] = jnp.full(shape, RANS_L, jnp.int32)
        cv_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)
        tile_ref[...] = jnp.zeros(shape, jnp.int32)

    def div(x, f, m):
        q = _mulhi32(x, m)
        r = x - q * f
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        return q, r

    n_sym_chunks = fc_ref.shape[1]   # 2 (bytes), 8 (u16<=1023), 32 (u16 4k)

    def step(x, cursor, tile, t, word, p):
        if u16:
            sym = _srl(word, 16 * p) & 0xFFFF
        else:
            sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(n_sym_chunks):
            frow = jnp.broadcast_to(fc_ref[0, h : h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[0, h : h + 1, :], shape)
            hit = shi == h
            e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
            m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
        if n_sym_chunks == 32:     # wide u16 tables: 14-bit fields
            f = e & 0x3FFF
            cu = _srl(e, 14)
        else:
            f = e & 0xFFF
            cu = _srl(e, 12) & 0xFFF

        flag = _uge(x, _sll(f, thresh_shift))
        emit = x & 0xFFFF
        x = jnp.where(flag, _srl(x, 16), x)
        q, r = div(x, f, m)
        x = _sll(q, tlog) + cu + r

        rank, total, rowtot_b = _flag_prefix(flag.astype(jnp.int32), tria,
                                             tril8, scr_ref, shape)
        if steptots:
            tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)

        # single packed pull pass: word w holds halfwords 2w | 2w+1 << 16;
        # window [base*128, base*128+1024) words = 2048 halfwords always
        # covers [cursor, cursor+total] (misalign < 256, total <= 1024)
        base_w = jnp.clip(_srl(cursor, 8), 0, hcap_p - 8)
        posw = base_w * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        want0 = cursor + total - 2 * posw
        want1 = want0 - 1

        def search(want):
            lo = jnp.zeros(shape, jnp.int32)
            hi_b = jnp.full(shape, TURBO_LANES - 1, jnp.int32)
            for _ in range(10):
                mid = _srl(lo + hi_b, 1)
                rv = _chunk_gather(rank, mid, 8, shape)
                ge = rv >= want
                hi_b = jnp.where(ge, mid, hi_b)
                lo = jnp.where(ge, lo, mid + 1)
            return _chunk_gather(emit, hi_b, 8, shape)

        v0 = search(want0)
        v1 = search(want1)
        valid0 = (want0 >= 1) & (want0 <= total)
        valid1 = (want1 >= 1) & (want1 <= total)
        old = out_ref[pl.ds(base_w, 8), :]
        lo16 = jnp.where(valid0, v0, old & 0xFFFF)
        hi16 = jnp.where(valid1, v1, _srl(old, 16))
        out_ref[pl.ds(base_w, 8), :] = lo16 | _sll(hi16, 16)
        return x, cursor + total, tile

    def body(i, carry):
        x, cursor, tile = carry
        lt4 = chunk_t4 - 1 - i                       # local, descending
        t4 = (n_chunks - 1 - c) * chunk_t4 + lt4     # global supercycle
        tile = jnp.where((t4 % tiles_span) == tiles_span - 1,
                         jnp.zeros(shape, jnp.int32), tile)
        word = src_ref[pl.ds(lt4 * 8, 8), :]
        if quad:
            x, cursor, tile = step(x, cursor, tile, t4, word, 0)
        elif u16:
            x, cursor, tile = step(x, cursor, tile, 2 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 2 * t4, word, 0)
        else:
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 3, word, 3)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 2, word, 2)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 4 * t4, word, 0)
        if steptots:
            # sect block is whole-group (revisited): write at the GLOBAL
            # region row, so chunk boundaries need not align to regions
            sect_ref[pl.ds((t4 // tiles_span) * 8, 8), :] = tile
        return x, cursor, tile

    x0 = xs_ref[...]
    cursor0 = cv_ref[0, 0]
    x, cursor, tile_f = jax.lax.fori_loop(
        0, chunk_t4, body, (x0, cursor0, tile_ref[...]))
    xs_ref[...] = x
    cv_ref[0:1, 0:1] = jnp.full((1, 1), cursor, jnp.int32)
    tile_ref[...] = tile_f
    # final states + csize live in the tail block; last chunk's write wins
    tail_ref[0:8, :] = x
    tail_ref[8:16, :] = jnp.full(shape, cursor, jnp.int32)


def _rans_encode_rl_kernel(fc_ref, magic_ref, src_ref, out_ref, tail_ref,
                           sect_ref, scr_ref, xs_ref, cv_ref, tile_ref,
                           *, chunk_t4, n_chunks, hcap_p, u16=False,
                           tlog=RANS_TABLELOG, steptots=True, quad=False):
    """Row-local placement variant of _rans_encode2_kernel.

    Same wire, different placement: the packed-stream placement rule
    (halfword cursor+total-k holds the lane with flat rank k, ranks
    row-major) makes each sublane ROW's step emissions CONTIGUOUS in the
    stream — row r owns halfwords [cursor+total-offs[r]-rowtot[r],
    cursor+total-offs[r]).  So instead of two 10-iteration binary searches
    over the flat 1024-lane rank (each iteration an 8-chunk cross-row
    gather, ~500 vreg ops/step — the issue-bound part of the shipped
    kernel, PERFORMANCE.md), place each row independently: a (16,128)
    slot grid (subrow sr = window word-row sr//8 of source row sr%8)
    where slot row == searched row, so the 7-iteration within-row binary
    search needs ONE plain take_along_axis per iteration and no chunk
    select.  The price: 16 read-modify-write [1,128] stores per step and
    8 row-offset scalar reads.  Byte-identical to _rans_encode2_kernel
    on all corpora (tests/test_turbo.py)."""
    shape = (8, 128)
    tria = _make_tria()
    thresh_shift = 32 - tlog
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    spc = 1 if quad else 2 if u16 else 4
    tiles_span = 128 // spc
    c = pl.program_id(1)
    n_sym_chunks = fc_ref.shape[1]

    @pl.when(c == 0)
    def _init():
        xs_ref[...] = jnp.full(shape, RANS_L, jnp.int32)
        cv_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)
        tile_ref[...] = jnp.zeros(shape, jnp.int32)

    def div(x, f, m):
        q = _mulhi32(x, m)
        r = x - q * f
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        return q, jnp.where(big, r - f, r)

    shape16 = (16, 128)
    lanes16 = jax.lax.broadcasted_iota(jnp.int32, shape16, 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, shape16, 0)
    row16 = sub16 & 7          # source row of this subrow
    wrow16 = _srl(sub16, 3)    # window word-row (0 or 1)

    def step(x, cursor, tile, t, word, p):
        if u16:
            sym = _srl(word, 16 * p) & 0xFFFF
        else:
            sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(n_sym_chunks):
            frow = jnp.broadcast_to(fc_ref[0, h : h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[0, h : h + 1, :], shape)
            hit = shi == h
            e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
            m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
        if n_sym_chunks == 32:     # wide u16 tables: 14-bit fields
            f = e & 0x3FFF
            cu = _srl(e, 14)
        else:
            f = e & 0xFFF
            cu = _srl(e, 12) & 0xFFF

        flag = _uge(x, _sll(f, thresh_shift))
        emit = x & 0xFFFF
        x = jnp.where(flag, _srl(x, 16), x)
        q, r = div(x, f, m)
        x = _sll(q, tlog) + cu + r

        # within-row inclusive rank: ONE matmul; row totals -> scratch
        aug = jax.lax.dot_general(
            flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        within = aug[:, :128].astype(jnp.int32)
        scr_ref[0:8, 0:1] = aug[:, 128:129].astype(jnp.int32)
        if steptots:
            rowtot_b = jnp.broadcast_to(aug[:, 128:129], shape).astype(jnp.int32)
            tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)
        offs = []
        acc = 0
        for rr in range(8):
            offs.append(acc)
            acc = acc + scr_ref[rr, 0]
        total = acc

        # per-row 2-word-row windows; spans <= 128 hw + misalign < 256 hw
        ct = cursor + total
        kvec = jnp.zeros(shape16, jnp.int32)
        bvec = jnp.zeros(shape16, jnp.int32)
        bws = []
        for rr in range(8):
            k_r = ct - offs[rr]
            start_r = k_r - scr_ref[rr, 0]          # first halfword written
            bw_r = jnp.clip(_srl(start_r, 8), 0, hcap_p - 2)
            bws.append(bw_r)
            hit = row16 == rr
            kvec = jnp.where(hit, k_r, kvec)
            bvec = jnp.where(hit, bw_r, bvec)
        posw = (bvec + wrow16) * 128 + lanes16       # word index
        want0 = kvec - 2 * posw                      # rank wanted at lo hw
        want1 = want0 - 1
        rt16 = jnp.zeros(shape16, jnp.int32)
        for rr in range(8):
            rt16 = jnp.where(row16 == rr, scr_ref[rr, 0], rt16)

        w2 = jnp.concatenate([within, within], axis=0)    # (16,128)
        e2 = jnp.concatenate([emit, emit], axis=0)

        def search(want):
            lo = jnp.zeros(shape16, jnp.int32)
            hi = jnp.full(shape16, 127, jnp.int32)
            for _ in range(7):
                mid = _srl(lo + hi, 1)
                rv = jnp.take_along_axis(w2, mid, axis=1)
                ge = rv >= want
                hi = jnp.where(ge, mid, hi)
                lo = jnp.where(ge, lo, mid + 1)
            return jnp.take_along_axis(e2, hi, axis=1)

        v0 = search(want0)
        v1 = search(want1)
        valid0 = (want0 >= 1) & (want0 <= rt16)
        valid1 = (want1 >= 1) & (want1 <= rt16)
        for rr in range(8):
            for w in range(2):
                sr = w * 8 + rr
                old = out_ref[pl.ds(bws[rr] + w, 1), :]
                lo16 = jnp.where(valid0[sr : sr + 1, :], v0[sr : sr + 1, :],
                                 old & 0xFFFF)
                hi16 = jnp.where(valid1[sr : sr + 1, :], v1[sr : sr + 1, :],
                                 _srl(old, 16))
                out_ref[pl.ds(bws[rr] + w, 1), :] = lo16 | _sll(hi16, 16)
        return x, cursor + total, tile

    def body(i, carry):
        x, cursor, tile = carry
        lt4 = chunk_t4 - 1 - i
        t4 = (n_chunks - 1 - c) * chunk_t4 + lt4
        tile = jnp.where((t4 % tiles_span) == tiles_span - 1,
                         jnp.zeros(shape, jnp.int32), tile)
        word = src_ref[pl.ds(lt4 * 8, 8), :]
        if quad:
            x, cursor, tile = step(x, cursor, tile, t4, word, 0)
        elif u16:
            x, cursor, tile = step(x, cursor, tile, 2 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 2 * t4, word, 0)
        else:
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 3, word, 3)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 2, word, 2)
            x, cursor, tile = step(x, cursor, tile, 4 * t4 + 1, word, 1)
            x, cursor, tile = step(x, cursor, tile, 4 * t4, word, 0)
        if steptots:
            sect_ref[pl.ds((t4 // tiles_span) * 8, 8), :] = tile
        return x, cursor, tile

    x0 = xs_ref[...]
    cursor0 = cv_ref[0, 0]
    x, cursor, tile_f = jax.lax.fori_loop(
        0, chunk_t4, body, (x0, cursor0, tile_ref[...]))
    xs_ref[...] = x
    cv_ref[0:1, 0:1] = jnp.full((1, 1), cursor, jnp.int32)
    tile_ref[...] = tile_f
    tail_ref[0:8, :] = x
    tail_ref[8:16, :] = jnp.full(shape, cursor, jnp.int32)


def _enc_chunking(t4_count: int, spc: int, force_chunk: int = 0) -> tuple[int, int]:
    """(chunk_t4, n_chunks): chunk src reads when a group exceeds 1 MiB of
    supercycles; chunk must align to the steptot tile span (128//spc)."""
    max_chunk = force_chunk or 256            # ~1 MiB of src per chunk
    if t4_count <= max_chunk:
        return t4_count, 1
    if t4_count % max_chunk:
        raise ValueError(
            f"large groups must be a multiple of {max_chunk} supercycles; "
            f"got t4_count={t4_count} (pad or split the tail group)")
    return max_chunk, t4_count // max_chunk


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def rans_encode2(fc_tables, magic_tables, src_words,
                 t4_count: int, hrows_cap: int, interpret: bool = False,
                 u16: bool = False, tlog: int = RANS_TABLELOG,
                 steptots: bool = True, force_chunk: int = 0,
                 rowloc: bool = False, quad: bool = False):
    """Packed-out encode, groups up to 4 MiB.  Returns (stream_words
    [G, stream_word_rows(hrows_cap), 128] i32 — 2 LE halfwords per word,
    the wire payload is exactly these words' first csize_hw*2 bytes —
    finals, csize_hw, stots).  Keeping the output packed is load-bearing:
    the halfword unpack this replaced (strided .at[0::2] scatter over the
    whole out buffer) cost 7x the kernel itself (0.225 vs 1.64 GB/s).

    rowloc selects the row-local placement kernel (bytes only, identical
    wire; see _rans_encode_rl_kernel).  force_chunk (tests only) shrinks
    the src-chunk span so the multi-chunk path is exercised on small
    interpret-mode groups."""
    G = fc_tables.shape[0]
    nch = fc_tables.shape[1]
    spc = 1 if quad else 2 if u16 else 4
    T = t4_count * spc
    tiles_span = 128 // spc
    chunk_t4, n_chunks = _enc_chunking(t4_count, spc, force_chunk)
    hcap_p = stream_word_rows(hrows_cap)
    sect_rows = ((t4_count + tiles_span - 1) // tiles_span) * 8

    if rowloc:
        kern = functools.partial(_rans_encode_rl_kernel, chunk_t4=chunk_t4,
                                 n_chunks=n_chunks, hcap_p=hcap_p, u16=u16,
                                 tlog=tlog, steptots=steptots, quad=quad)
    else:
        kern = functools.partial(_rans_encode2_kernel, chunk_t4=chunk_t4,
                                 n_chunks=n_chunks, hcap_p=hcap_p, u16=u16,
                                 tlog=tlog, steptots=steptots, quad=quad)
    out, tail, sect = pl.pallas_call(
        kern,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((1, nch, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_t4 * 8, 128),
                         lambda g, c, n=n_chunks: (g * n + (n - 1 - c), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hcap_p, 128), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sect_rows, 128), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * hcap_p, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * 16, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * sect_rows, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)],
        interpret=interpret,
        # multi-MiB groups: the packed-out block (hcap_p rows) plus the
        # pipeline's double buffering exceeds the 16 MiB scoped-vmem
        # default at 4 MiB groups (r3 bench OOM: 18.29M > 16M); v5e has
        # 128 MiB of VMEM, so raise the cap to what this launch needs
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 << 20,
                max(16 << 20,
                    2 * 4 * 128 * (hcap_p + chunk_t4 * 8 + sect_rows
                                   + 2 * nch + 16) + (4 << 20)))),
    )(fc_tables, magic_tables, src_words.reshape(G * t4_count * 8, 128))

    stream = out.reshape(G, hcap_p, 128)
    tail = tail.reshape(G, 16, 128)
    if steptots:
        stots = (sect.reshape(G, sect_rows // 8, 8, 128)
                 .transpose(0, 1, 3, 2)
                 .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])
    else:
        stots = None
    return stream, tail[:, 0:8, :], tail[:, 8, 0], stots


# ---------------------------------------------------------------------------
# Host-side table packing
# ---------------------------------------------------------------------------


def pack_rans_dtable(norm, tlog: int = RANS_TABLELOG) -> np.ndarray:
    """[tchunks,128] i32 decode table for the kernel."""
    t = rans_decode_table(norm, tlog)
    n = max(1 << tlog, 128)
    out = np.zeros(n, np.int32)
    out[: len(t)] = t
    return out.reshape(n // 128, 128)


def pack_rans_ctables(norm) -> tuple[np.ndarray, np.ndarray]:
    """((cumul<<12)|freq)[2,128], magic[2,128] — 256-symbol encode tables."""
    freq, cumul = rans_freqs(np.asarray(norm))
    f = np.zeros(256, np.int64)
    c = np.zeros(256, np.int64)
    f[: len(freq)] = freq
    c[: len(cumul)] = cumul
    f = np.maximum(f, 1)  # unused symbols: avoid div-by-zero magic
    fc = ((c << 12) | f).astype(np.int32)
    magic = np.minimum(2**32 // f, 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return fc.reshape(2, 128), magic.reshape(2, 128)


def pack_rans16_dtable(norm, tlog: int = RANS_TABLELOG) -> np.ndarray:
    """[2^tlog/128,128] i32 u16 decode table ((cumul<<21)|(freq<<10)|sym)."""
    from .rans16 import rans16_decode_table

    t = rans16_decode_table(norm, tlog)
    n = max(1 << tlog, 128)
    out = np.zeros(n, np.int32)
    out[: len(t)] = t
    return out.reshape(n // 128, 128)


def pack_rans16_ctables(norm) -> tuple[np.ndarray, np.ndarray]:
    """((cumul<<12)|freq)[8,128], magic[8,128] — 1024-symbol encode tables."""
    freq, cumul = rans_freqs(np.asarray(norm))
    f = np.ones(1024, np.int64)
    c = np.zeros(1024, np.int64)
    f[: len(freq)] = freq
    c[: len(cumul)] = cumul
    f = np.maximum(f, 1)
    fc = ((c << 12) | f).astype(np.int32)
    magic = np.minimum(2**32 // f, 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return fc.reshape(8, 128), magic.reshape(8, 128)


def pack_pair_dtable(norm, pairs: np.ndarray,
                     tlog: int = RANS_TABLELOG) -> np.ndarray:
    """[(2^tlog/128)+2, 128] i32 pair-wire decode table (turbo/pair.py):
    rows [0, tch) pack (pair_id << 2*tlog) | (freq << tlog) | (slot-cumul)
    — one word since pair_id < 256 and tlog <= 12 — and rows [tch, tch+2)
    hold the 256-entry id -> raw u16 pair-value LUT."""
    assert tlog <= 12, tlog
    freq, cumul = rans_freqs(np.asarray(norm))
    m = 1 << tlog
    tch = max(m // 128, 1)
    bounds = np.concatenate([cumul, [m]])
    slots = np.arange(m)
    sid = np.searchsorted(bounds, slots, side="right") - 1
    e = ((sid << (2 * tlog)) | (freq[sid] << tlog)
         | (slots - cumul[sid])).astype(np.int64)
    main = np.zeros(max(m, 128), np.int64)
    main[:m] = e
    lut = np.zeros(256, np.int32)
    lut[: len(pairs)] = np.asarray(pairs, np.uint16)
    return np.concatenate(
        [main.astype(np.int32).reshape(-1, 128), lut.reshape(2, 128)], axis=0)


def pack_quad_dtable(norm, quads: np.ndarray,
                     tlog: int = RANS_TABLELOG) -> np.ndarray:
    """[(2^tlog/128)+2, 128] i32 quad-wire decode table (turbo/quad.py):
    identical layout to pack_pair_dtable but the 256-entry LUT in rows
    [tch, tch+2) holds raw u32 4-byte groups (stored as i32 bit patterns
    — the decode step's output word IS the LUT value)."""
    assert tlog <= 12, tlog
    freq, cumul = rans_freqs(np.asarray(norm))
    m = 1 << tlog
    tch = max(m // 128, 1)
    bounds = np.concatenate([cumul, [m]])
    slots = np.arange(m)
    sid = np.searchsorted(bounds, slots, side="right") - 1
    e = ((sid << (2 * tlog)) | (freq[sid] << tlog)
         | (slots - cumul[sid])).astype(np.int64)
    main = np.zeros(max(m, 128), np.int64)
    main[:m] = e
    lut = np.zeros(256, "<u4")
    lut[: len(quads)] = np.asarray(quads, np.uint32)
    return np.concatenate(
        [main.astype(np.int32).reshape(-1, 128),
         lut.view(np.int32).reshape(2, 128)], axis=0)


def pack_rans16x_dtable(norm, tlog: int) -> np.ndarray:
    """[2*(2^tlog/128),128] i32 split decode table for symbols up to 4095:
    rows [0, tch) hold e1 = (freq << 13) | (slot - cumul), rows [tch, 2tch)
    the 12-bit symbol (the fields don't fit one 32-bit entry; alphabets
    above 1023 also need tableLog 12-13, fseU16.c:43-48)."""
    freq, cumul = rans_freqs(np.asarray(norm))
    m = 1 << tlog
    tch = m // 128
    bounds = np.concatenate([cumul, [m]])
    slots = np.arange(m)
    sym = np.searchsorted(bounds, slots, side="right") - 1
    j = slots - cumul[sym]
    e1 = ((freq[sym] << 13) | j).astype(np.int32)
    return np.concatenate(
        [e1.reshape(tch, 128), sym.astype(np.int32).reshape(tch, 128)], axis=0)


def pack_rans16x_ctables(norm) -> tuple[np.ndarray, np.ndarray]:
    """((cumul<<14)|freq)[32,128], magic[32,128] — 4096-symbol encode
    tables; 14-bit fields fit tableLog up to 13 (freq/cumul < 2^14)."""
    freq, cumul = rans_freqs(np.asarray(norm))
    f = np.ones(4096, np.int64)
    c = np.zeros(4096, np.int64)
    f[: len(freq)] = freq
    c[: len(cumul)] = cumul
    f = np.maximum(f, 1)
    fc = ((c << 14) | f).astype(np.int32)
    magic = np.minimum(2**32 // f, 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return fc.reshape(32, 128), magic.reshape(32, 128)


# ---------------------------------------------------------------------------
# Decode v2: per-step renorm counts shipped in the stream (FLAG_STEPTOTS)
# move the rank row-offsets and the cursor chain OFF the serial path — they
# are precomputed vectorized in XLA and read as independent VMEM scalars.
# The ablation (PERFORMANCE.md) shows the in-loop prefix costs ~280 of
# ~400 ns/step; this removes ~130 ns of it.
# ---------------------------------------------------------------------------


def _rans_decode_v2_kernel(table_ref, init_ref, stream_ref, roff_ref, cur_ref,
                           out_ref, *, t4_count, srows, nway, u16=False,
                           tlog=RANS_TABLELOG, u16x=False, pair=False,
                           quad=False):
    """N independent groups per kernel instance: their chains interleave,
    hiding each other's lookup/gather/matmul latencies (6-way measured
    ~2.1x one-way; VMEM limits pick nway).

    Round-2 upgrades (probe_decode_v3 measurements, same wire):
    * stream halfwords packed 2-per-word: the renorm window gather needs 5
      row-chunks instead of 9 and the stream block halves in VMEM;
    * cursor scalars at [row t4, lane pp] (pp static per unrolled step):
      the cursor array shrinks 4x (2x u16), buying interleave width.
    Together: 5.7 -> 12.0 GB/s Proba80 on the v5e."""
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    # steps per supercycle (output tile): quad writes one FULL i32 word
    # per lane per step (turbo/quad.py)
    spc = 1 if quad else 2 if u16 else 4
    # rank via ONE matmul: [flags | roff_hi | roff_lo] @ [TRIA ; 16s ; 1s]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)      # [384,128]
    rows_per = t4_count * 8 + 8
    roff_rows = roff_ref.shape[0] // nway
    cur_rows = cur_ref.shape[0] // nway

    def step(x, t4, pp, gg):
        t = spc * t4 + pp
        slot = x & (tsize - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        sym, x = _sym_advance(lambda h: table_ref[gg, h : h + 1, :], tchunks,
                              shape, thi, tlo, slot, x, tlog, u16, u16x,
                              pair or quad)
        flag = _srl(x, 16) == 0
        # rowoff tile: value (t, r) at row (t>>7)*8 + r, lane t & 127 (the
        # encoder's section layout); hi/lo split keeps bf16 exact
        rtile = roff_ref[pl.ds(gg * roff_rows + _srl(t, 7) * 8, 8), :]
        hit = lanes == (t & 127)
        m_hi = jnp.where(hit, _srl(rtile, 4), 0).astype(jnp.bfloat16)
        m_lo = jnp.where(hit, rtile & 15, 0).astype(jnp.bfloat16)
        lhs = jnp.concatenate(
            [flag.astype(jnp.int32).astype(jnp.bfloat16), m_hi, m_lo], axis=1)
        rank = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cursor = cur_ref[gg * cur_rows + t4, pp]
        pos = cursor - rank          # halfword position
        wpos = _srl(pos, 1)
        parity = pos & 1
        # packed window: rows [base, base+5) of 128 words always contain
        # the word span of [cursor-1024, cursor) halfwords
        base_row = jnp.clip(
            _srl(jnp.maximum(cursor - 1024, 0), 8), 0, srows - 8) + gg * srows
        relw = jnp.clip(wpos - (base_row - gg * srows) * 128, 0, 639)
        hi = _srl(relw, 7)
        lo = relw & 127
        v32 = jnp.zeros(shape, jnp.int32)
        for h in range(5):
            row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
            v32 = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v32)
        v = jnp.where(parity == 1, _srl(v32, 16), v32) & 0xFFFF
        return sym, jnp.where(flag, _sll(x, 16) | v, x)

    def body(t4, xs):
        xs = list(xs)
        syms = [[] for _ in range(nway)]
        for pp in range(spc):
            for gg in range(nway):
                sg, xs[gg] = step(xs[gg], t4, pp, gg)
                syms[gg].append(sg)
        for gg in range(nway):
            sa = syms[gg]
            if quad:  # one full word per step (the LUT value IS the word)
                tile = sa[0]
            elif u16:  # 2 u16 symbols per output word
                tile = sa[0] | _sll(sa[1], 16)
            else:    # 4 bytes per output word
                tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[pl.ds(gg * rows_per + t4 * 8, 8), :] = tile
        return tuple(xs)

    xs = jax.lax.fori_loop(0, t4_count, body,
                           tuple(init_ref[g] for g in range(nway)))
    for gg in range(nway):
        out_ref[pl.ds(gg * rows_per + t4_count * 8, 8), :] = xs[gg] ^ RANS_L


def _rans_decode_v2t_kernel(table_ref, init_ref, stream_ref, cur_ref,
                            out_ref, *, t4_count, srows, nway, u16=False,
                            tlog=RANS_TABLELOG, u16x=False, pair=False):
    """Totals-only (FLAG_TOTALS) variant: the wire ships one u16 renorm
    total per step, so cursors still precompute in XLA but the per-ROW
    offsets are recomputed in-kernel with the encode-side 2-matmul prefix
    (no scalar round-trips).  4x smaller wire section than FLAG_STEPTOTS."""
    shape = (8, 128)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    spc = 2 if u16 else 4
    tria = _make_tria()
    tril8 = _make_tril8()
    rows_per = t4_count * 8 + 8
    cur_rows = cur_ref.shape[0] // nway

    def step(x, t4, pp, gg):
        slot = x & (tsize - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        sym, x = _sym_advance(lambda h: table_ref[gg, h : h + 1, :], tchunks,
                              shape, thi, tlo, slot, x, tlog, u16, u16x, pair)
        flag = _srl(x, 16) == 0
        # flat inclusive rank: within-row matmul + tril8 row-offset matmul
        aug = jax.lax.dot_general(
            flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        rowpre = jax.lax.dot_general(
            tril8, aug[:, 128:129].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        rank = (aug[:, :128] + rowpre).astype(jnp.int32)
        cursor = cur_ref[gg * cur_rows + t4, pp]
        pos = cursor - rank
        wpos = _srl(pos, 1)
        parity = pos & 1
        base_row = jnp.clip(
            _srl(jnp.maximum(cursor - 1024, 0), 8), 0, srows - 8) + gg * srows
        relw = jnp.clip(wpos - (base_row - gg * srows) * 128, 0, 639)
        hi = _srl(relw, 7)
        lo = relw & 127
        v32 = jnp.zeros(shape, jnp.int32)
        for h in range(5):
            row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
            v32 = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v32)
        v = jnp.where(parity == 1, _srl(v32, 16), v32) & 0xFFFF
        return sym, jnp.where(flag, _sll(x, 16) | v, x)

    def body(t4, xs):
        xs = list(xs)
        syms = [[] for _ in range(nway)]
        for pp in range(spc):
            for gg in range(nway):
                sg, xs[gg] = step(xs[gg], t4, pp, gg)
                syms[gg].append(sg)
        for gg in range(nway):
            sa = syms[gg]
            if u16:
                tile = sa[0] | _sll(sa[1], 16)
            else:
                tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[pl.ds(gg * rows_per + t4 * 8, 8), :] = tile
        return tuple(xs)

    xs = jax.lax.fori_loop(0, t4_count, body,
                           tuple(init_ref[g] for g in range(nway)))
    for gg in range(nway):
        out_ref[pl.ds(gg * rows_per + t4_count * 8, 8), :] = xs[gg] ^ RANS_L


def _pick_nway(per_group_bytes: int, budget: int = (18 * 2**20 + 700 * 2**10)) -> int:
    """Widest interleave whose double-buffered blocks fit the VMEM budget.

    Measured on the v5e (probe_decode_v3): 4-way 9.9, 6-way 12.0-16.1,
    7-way 17.2 GB/s at tableLog 10; 8-way fails to compile / regresses.
    The 18.7 MiB budget sits exactly at the largest configuration proven to
    compile (7 x ~1.33 MiB groups doubled); intermediate widths serve
    corpora whose larger streams push a group past a boundary; 1-way still
    fits groups up to ~4 MiB (host encoders have no VMEM cap)."""
    for nway in (7, 6, 5, 4, 3, 2):
        if 2 * nway * per_group_bytes < budget:
            return nway
    return 1


def v2_pick_nway(t4_count: int, hrows: int, tlog: int = RANS_TABLELOG,
                 u16: bool = False, totals_only: bool = False,
                 u16x: bool = False, pair: bool = False,
                 quad: bool = False) -> int:
    """The interleave width rans_decode_v2 would pick for this shape —
    exposed so the host dispatch (turbo/api.py) can compare the resident
    kernel's predicted collapse against the HBM-windowed kernel's padding
    waste before choosing a kernel."""
    spc = 1 if quad else 2 if u16 else 4
    T = t4_count * spc
    rows_per = t4_count * 8 + 8
    tch = (max((1 << tlog) // 128, 1) * (2 if u16x else 1)
           + (2 if pair or quad else 0))
    r8 = 0 if totals_only else ((T + 127) // 128) * 8
    rc = ((t4_count + 7) // 8) * 8
    srows = stream_word_rows(hrows)
    per_group = (srows + rows_per + rc + r8 + tch + 8) * 512
    return _pick_nway(per_group)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def rans_decode_v2(csize_hw, tables, init_states, streams, steptots,
                   t4_count: int, hrows: int, interpret: bool = False,
                   tlog: int = RANS_TABLELOG, u16: bool = False,
                   u16x: bool = False, pair: bool = False,
                   quad: bool = False):
    """v2 decode.  steptots is either [G, T, 8] per-row renorm counts
    (FLAG_STEPTOTS wire) or [G, T] per-step totals (FLAG_TOTALS wire — the
    row offsets are then recomputed in-kernel).  streams is the PACKED
    payload-word layout [G, stream_word_rows(hrows), 128] (see
    pack_stream_words).

    Returns (out[G, t4_count*8, 128] i32, err[G] i32 with 0 = ok); err
    covers both corrupt chains (final states != L) and inconsistent
    steptots (total != csize)."""
    G0 = tables.shape[0]
    T = steptots.shape[1]
    totals_only = steptots.ndim == 2
    spc = 1 if quad else 2 if u16 else 4
    rows_per = t4_count * 8 + 8
    tch = tables.shape[1]
    r8 = 0 if totals_only else ((T + 127) // 128) * 8
    rc = ((t4_count + 7) // 8) * 8
    srows = stream_word_rows(hrows)
    assert streams.shape[1] == srows, (streams.shape, srows)

    # pick the interleave width by the double-buffered VMEM budget
    per_group = (srows + rows_per + rc + r8 + tch + 8) * 512
    nway = _pick_nway(per_group)
    pad = (-G0) % nway
    if pad:
        dup = lambda a: jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        csize_hw, tables, init_states, streams, steptots = map(
            dup, (csize_hw, tables, init_states, streams, steptots))
    G = tables.shape[0]

    totals = steptots if totals_only else jnp.sum(steptots, axis=2)  # [G,T]
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    bad = (cursors[:, -1] - totals[:, -1]) != 0

    # cursor scalars: step t = spc*t4 + pp lives at [row t4, lane pp] (lane
    # is static per unrolled step; traced rows are fine for scalar reads)
    curs = jnp.zeros((G, rc, 128), jnp.int32).at[:, :t4_count, :spc].set(
        cursors.reshape(G, t4_count, spc).astype(jnp.int32))

    pk = streams.reshape(G, srows * 128)

    common_specs = [
        pl.BlockSpec((nway, tch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nway, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nway * srows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
    ]
    if totals_only:
        kern = functools.partial(_rans_decode_v2t_kernel, t4_count=t4_count,
                                 srows=srows, nway=nway, u16=u16, tlog=tlog,
                                 u16x=u16x, pair=pair)
        in_specs = common_specs + [
            pl.BlockSpec((nway * rc, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ]
        ins = (tables, init_states, pk.reshape(G * srows, 128),
               curs.reshape(G * rc, 128))
    else:
        # rowoff tiles: value (t, r) at row (t//128)*8 + r, lane t % 128
        rowoff = jnp.cumsum(steptots, axis=2) - steptots             # [G,T,8]
        tpad = ((T + 127) // 128) * 128
        ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))        # [G,tp,8]
        roff = (ro.reshape(G, tpad // 128, 128, 8)
                .transpose(0, 1, 3, 2)
                .reshape(G, (tpad // 128) * 8, 128)).astype(jnp.int32)
        kern = functools.partial(_rans_decode_v2_kernel, t4_count=t4_count,
                                 srows=srows, nway=nway, u16=u16, tlog=tlog,
                                 u16x=u16x, pair=pair, quad=quad)
        in_specs = common_specs + [
            pl.BlockSpec((nway * r8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * rc, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ]
        ins = (tables, init_states, pk.reshape(G * srows, 128),
               roff.reshape(G * r8, 128), curs.reshape(G * rc, 128))
    out = pl.pallas_call(
        kern,
        grid=(G // nway,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nway * rows_per, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows_per, 128), jnp.int32),
        interpret=interpret,
    )(*ins)
    out = out.reshape(G, rows_per, 128)
    err = jnp.abs(out[:, t4_count * 8 :, :]).max(axis=(1, 2))
    err = err + bad.astype(jnp.int32)
    return out[:G0, : t4_count * 8, :], err[:G0]


# ---------------------------------------------------------------------------
# Decode with HBM-streamed windows: breaks the nway <-> group-size coupling.
# rans_decode_v2 holds each group's ENTIRE packed stream in VMEM, so the
# interleave width collapses as groups grow (2-4 MiB) or streams approach
# raw size (proba02).  Stream consumption is monotone (the LIFO cursor only
# decreases) and the per-chunk cursor endpoints are known in XLA before the
# launch, so fixed-size stream windows are DMA'd HBM->VMEM per time-chunk
# at precomputed start rows — double-buffered, no in-loop conditionals.
# Bytes-wire only (rows steptots); grid (G//nway, t4//S).
# ---------------------------------------------------------------------------


def _rans_decode_w_kernel(ws_ref, table_ref, init_ref, stream_hbm, roff_ref,
                          cur_ref, out_ref, res_ref, xs_ref, win_ref, sem,
                          *, S, n_chunks, W, srows, nway, tlog,
                          u16=False, u16x=False, totals=False, pair=False,
                          quad=False):
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    spc = 1 if quad else 2 if u16 else 4
    g = pl.program_id(0)
    c = pl.program_id(1)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)
    tril8 = _make_tril8()
    tria129 = _make_tria()
    tiles_per_chunk = S * spc // 128   # 8-row roff tiles per chunk

    def dma(gg, slot, cc):
        start = ws_ref[g * nway + gg, cc]
        return pltpu.make_async_copy(
            stream_hbm.at[g * nway + gg, pl.ds(start, W), :],
            win_ref.at[pl.ds((gg * 2 + slot) * W, W), :],
            sem.at[gg, slot])

    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _init():
        for gg in range(nway):
            xs_ref[pl.ds(gg * 8, 8), :] = init_ref[gg]
            dma(gg, 0, 0).start()

    @pl.when(c + 1 < n_chunks)
    def _next():
        for gg in range(nway):
            dma(gg, 1 - slot, c + 1).start()

    for gg in range(nway):
        dma(gg, slot, c).wait()

    # loop-invariant per-chunk scalars
    wbase = [ws_ref[g * nway + gg, c] for gg in range(nway)]
    vbase = [(gg * 2) * W + slot * W for gg in range(nway)]

    def step(x, i, pp, gg):
        t = spc * (c * S + i) + pp
        slot_v = x & (tsize - 1)
        thi = _srl(slot_v, 7)
        tlo = slot_v & 127
        sym, x = _sym_advance(lambda h: table_ref[gg, h : h + 1, :], tchunks,
                              shape, thi, tlo, slot_v, x, tlog, u16, u16x,
                              pair or quad)
        flag = _srl(x, 16) == 0
        if totals:
            # totals wire: recompute row offsets in-kernel (2 chained
            # matmuls, as _rans_decode_v2t_kernel)
            aug = jax.lax.dot_general(
                flag.astype(jnp.int32).astype(jnp.bfloat16), tria129,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            rowpre = jax.lax.dot_general(
                tril8, aug[:, 128:129].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            rank = (aug[:, :128] + rowpre).astype(jnp.int32)
        else:
            # rows wire: shipped per-row offsets fold rank into ONE matmul
            ltile = _srl(t, 7) - c * tiles_per_chunk
            rtile = roff_ref[gg, pl.ds(ltile * 8, 8), :]
            hit = lanes == (t & 127)
            m_hi = jnp.where(hit, _srl(rtile, 4), 0).astype(jnp.bfloat16)
            m_lo = jnp.where(hit, rtile & 15, 0).astype(jnp.bfloat16)
            lhs = jnp.concatenate(
                [flag.astype(jnp.int32).astype(jnp.bfloat16), m_hi, m_lo],
                axis=1)
            rank = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        cursor = cur_ref[gg, i, pp]
        pos = cursor - rank
        wpos = _srl(pos, 1)
        parity = pos & 1
        base_abs = jnp.clip(
            _srl(jnp.maximum(cursor - 1024, 0), 8), 0, srows - 8)
        base_rel = jnp.clip(base_abs - wbase[gg], 0, W - 8)
        relw = jnp.clip(wpos - base_abs * 128, 0, 639)
        hi = _srl(relw, 7)
        lo = relw & 127
        v32 = jnp.zeros(shape, jnp.int32)
        for h in range(5):
            row = jnp.broadcast_to(
                win_ref[pl.ds(vbase[gg] + base_rel + h, 1), :], shape)
            v32 = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v32)
        v = jnp.where(parity == 1, _srl(v32, 16), v32) & 0xFFFF
        return sym, jnp.where(flag, _sll(x, 16) | v, x)

    def body(i, xs):
        xs = list(xs)
        syms = [[] for _ in range(nway)]
        for pp in range(spc):
            for gg in range(nway):
                sg, xs[gg] = step(xs[gg], i, pp, gg)
                syms[gg].append(sg)
        for gg in range(nway):
            sa = syms[gg]
            if quad:  # one full word per step (the LUT value IS the word)
                tile = sa[0]
            elif u16:  # 2 u16 symbols per output word
                tile = sa[0] | _sll(sa[1], 16)
            else:    # 4 bytes per output word
                tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[gg, pl.ds(i * 8, 8), :] = tile
        return tuple(xs)

    xs0 = tuple(xs_ref[pl.ds(gg * 8, 8), :] for gg in range(nway))
    xs = jax.lax.fori_loop(0, S, body, xs0)
    for gg in range(nway):
        xs_ref[pl.ds(gg * 8, 8), :] = xs[gg]
        res_ref[gg] = xs[gg] ^ RANS_L     # last chunk's write is kept


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def rans_decode_w(csize_hw, tables, init_states, streams, steptots,
                  t4_count: int, hrows: int, nway: int,
                  tlog: int = RANS_TABLELOG, S: int = 32,
                  interpret: bool = False, u16: bool = False,
                  u16x: bool = False, pair: bool = False,
                  quad: bool = False):
    """HBM-windowed decode: same wire/inputs as rans_decode_v2 (rows
    [G,T,8] or totals [G,T] steptots) but the packed stream stays in HBM
    and only a W = 4*spc*S+16-row window per group is VMEM-resident,
    double-buffered ahead of the monotone cursor.  nway is therefore
    independent of group size / stream size.  t4_count must be a multiple
    of S, and S a multiple of 128//spc (32 bytes / 64 u16).

    Returns (out[G, t4_count*8, 128] i32, err[G])."""
    G0 = tables.shape[0]
    T = steptots.shape[1]
    tch = tables.shape[1]
    spc = 1 if quad else 2 if u16 else 4
    totals_only = steptots.ndim == 2
    assert t4_count % S == 0 and S % (128 // spc) == 0, (t4_count, S)
    n_chunks = t4_count // S
    W = 4 * spc * S + 16
    srows = stream_word_rows(hrows)
    assert streams.shape[1] == srows, (streams.shape, srows)
    if srows < W:
        # stream smaller than one window: pad rows so the fixed-size DMA
        # stays in bounds (small streams are better served by v2, but the
        # windowed path must stay correct for the auto-dispatch seam)
        streams = jnp.pad(streams, ((0, 0), (0, W - srows), (0, 0)))
        srows = W

    pad = (-G0) % nway
    if pad:
        dup = lambda a: jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        csize_hw, tables, init_states, streams, steptots = map(
            dup, (csize_hw, tables, init_states, streams, steptots))
    G = tables.shape[0]

    totals = steptots if totals_only else jnp.sum(steptots, axis=2)  # [G,T]
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    cur_after = cursors - totals
    bad = cur_after[:, -1] != 0

    # per-chunk window start rows (word rows), from the chunk-END cursor
    te = (jnp.arange(n_chunks) + 1) * spc * S - 1
    cur_end = cur_after[:, te]                                    # [G,nc]
    ws = jnp.clip(_srl(jnp.maximum(cur_end - 1024, 0), 8),
                  0, srows - W).astype(jnp.int32)

    r8c = spc * S // 16
    if totals_only:
        # row offsets are recomputed in-kernel; ship a zero placeholder so
        # the input pipeline keeps one shape (r8c rows/chunk of VMEM)
        roff = jnp.zeros((G, n_chunks * r8c, 128), jnp.int32)
    else:
        rowoff = jnp.cumsum(steptots, axis=2) - steptots
        tpad = ((T + 127) // 128) * 128
        ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))
        roff = (ro.reshape(G, tpad // 128, 128, 8)
                .transpose(0, 1, 3, 2)
                .reshape(G, (tpad // 128) * 8, 128)).astype(jnp.int32)
        # pad roff rows to n_chunks * (spc*S//16) so chunk-blocking divides
        roff = jnp.pad(roff,
                       ((0, 0), (0, n_chunks * r8c - roff.shape[1]), (0, 0)))

    curs = jnp.zeros((G, t4_count, 128), jnp.int32).at[:, :, :spc].set(
        cursors.reshape(G, t4_count, spc).astype(jnp.int32))

    kern = functools.partial(_rans_decode_w_kernel, S=S, n_chunks=n_chunks,
                             W=W, srows=srows, nway=nway, tlog=tlog,
                             u16=u16, u16x=u16x, totals=totals_only,
                             pair=pair, quad=quad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // nway, n_chunks),
        in_specs=[
            pl.BlockSpec((nway, tch, 128), lambda g, c, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, 8, 128), lambda g, c, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # stream stays in HBM
            pl.BlockSpec((nway, r8c, 128), lambda g, c, ws: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, S, 128), lambda g, c, ws: (g, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nway, S * 8, 128), lambda g, c, ws: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, 8, 128), lambda g, c, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nway * 8, 128), jnp.int32),
            pltpu.VMEM((nway * 2 * W, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((nway, 2)),
        ],
    )
    out, res = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, t4_count * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(ws, tables, init_states, streams, roff, curs)
    err = jnp.abs(res).max(axis=(1, 2)) + bad.astype(jnp.int32)
    return out[:G0], err[:G0]
