"""Probe: v3 decode kernel variants on the real chip.

Levers vs the shipped v2 kernel (same FLAG_STEPTOTS wire):
  (a) packed stream: 2 halfwords per i32 word -> window gather needs 5
      row-chunks instead of 9 and the stream buffer halves in VMEM.
  (b) packed cursors: cursor scalar for step t at [row t4, lane pp]
      (pp static) -> cur array shrinks 4x (t4_count rows, not T rows).
  (c) nway sweep with the freed VMEM.

Usage: python tools/probe_decode_v3.py [variant ...]
  variants: base, a, ab, ab6, ab8
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import (RANS_L, RANS_TABLELOG,
                                               parse_rans_group, rans_compress)
from finitestateentropy_tpu.turbo.rans_kernels import pack_rans_dtable
from finitestateentropy_tpu.utils import generate_proba

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left


def _round8(x):
    return (x + 7) // 8 * 8


def _v3_kernel(table_ref, init_ref, stream_ref, roff_ref, cur_ref, out_ref,
               *, t4_count, srows, nway, tlog, packed_stream, packed_cursor,
               packed_table=False, gath_roff=False):
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    if packed_table:
        tchunks = max(tsize // 256, 1)
    spc = 4
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)
    rows_per = t4_count * 8 + 8
    roff_rows = roff_ref.shape[0] // nway
    cur_rows = cur_ref.shape[0] // nway

    def step(x, t4, pp, gg):
        t = spc * t4 + pp
        slot = x & (tsize - 1)
        if packed_table:
            # 2 entries per word: (e_hi16 << 16) | e_lo16 is impossible for
            # 32-bit entries, so packed_table splits the entry into a
            # sym|freq word pair laid out even/odd: word w holds entry
            # fields for slots 2w (lo16: freq<<?..) — instead we pack two
            # *narrow* entries: (cumul<<20|freq<<8|sym) needs 32 bits, so
            # pack per-slot entries into two half-tables interleaved:
            # table word w = entry(2w) fields folded is lossy -> use
            # parity-split tables: chunk h covers slots with
            # slot>>1 in [h*128,(h+1)*128), entry chosen by slot&1 from
            # two gathered words (even table rows then odd rows).
            shalf = _srl(slot, 1)
            thi = _srl(shalf, 7)
            tlo = shalf & 127
            par = slot & 1
            e0 = jnp.zeros(shape, jnp.int32)
            e1 = jnp.zeros(shape, jnp.int32)
            for h in range(tchunks):
                row0 = jnp.broadcast_to(table_ref[gg, 2 * h: 2 * h + 1, :], shape)
                row1 = jnp.broadcast_to(table_ref[gg, 2 * h + 1: 2 * h + 2, :], shape)
                hitc = thi == h
                e0 = jnp.where(hitc, jnp.take_along_axis(row0, tlo, axis=1), e0)
                e1 = jnp.where(hitc, jnp.take_along_axis(row1, tlo, axis=1), e1)
            e = jnp.where(par == 1, e1, e0)
        else:
            thi = _srl(slot, 7)
            tlo = slot & 127
            e = jnp.zeros(shape, jnp.int32)
            for h in range(tchunks):
                trow = jnp.broadcast_to(table_ref[gg, h: h + 1, :], shape)
                e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        c = _srl(e, 20)
        x = f * _srl(x, tlog) + slot - c
        flag = _srl(x, 16) == 0
        rtile = roff_ref[pl.ds(gg * roff_rows + _srl(t, 7) * 8, 8), :]
        if gath_roff:
            idx = jnp.full(shape, t & 127, jnp.int32)
            roffb = jnp.take_along_axis(rtile, idx, axis=1)
            rank = jax.lax.dot_general(
                flag.astype(jnp.int32).astype(jnp.bfloat16), tria128,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32) + roffb
        else:
            hit = lanes == (t & 127)
            m_hi = jnp.where(hit, _srl(rtile, 4), 0).astype(jnp.bfloat16)
            m_lo = jnp.where(hit, rtile & 15, 0).astype(jnp.bfloat16)
            lhs = jnp.concatenate(
                [flag.astype(jnp.int32).astype(jnp.bfloat16), m_hi, m_lo], axis=1)
            rank = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        if packed_cursor:
            cursor = cur_ref[gg * cur_rows + t4, pp]
        else:
            cursor = cur_ref[gg * cur_rows + t, 0]
        pos = cursor - rank
        if packed_stream:
            wpos = _srl(pos, 1)
            parity = pos & 1
            base_row = jnp.clip(
                _srl(jnp.maximum(cursor - 1024, 0), 8), 0, srows - 8) \
                + gg * srows
            relw = jnp.clip(wpos - (base_row - gg * srows) * 128, 0, 639)
            hi = _srl(relw, 7)
            lo = relw & 127
            v32 = jnp.zeros(shape, jnp.int32)
            for h in range(5):
                row = jnp.broadcast_to(
                    stream_ref[pl.ds(base_row + h, 1), :], shape)
                v32 = jnp.where(hi == h,
                                jnp.take_along_axis(row, lo, axis=1), v32)
            v = jnp.where(parity == 1, _srl(v32, 16), v32) & 0xFFFF
        else:
            base_row = jnp.clip(
                _srl(jnp.maximum(cursor - 1024, 0), 7), 0, srows - 16) \
                + gg * srows
            rel = jnp.clip(pos - (base_row - gg * srows) * 128, 0, 2047)
            hi = _srl(rel, 7)
            lo = rel & 127
            v = jnp.zeros(shape, jnp.int32)
            for h in range(9):
                row = jnp.broadcast_to(
                    stream_ref[pl.ds(base_row + h, 1), :], shape)
                v = jnp.where(hi == h,
                              jnp.take_along_axis(row, lo, axis=1), v)
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
            tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[pl.ds(gg * rows_per + t4 * 8, 8), :] = tile
        return tuple(xs)

    xs = jax.lax.fori_loop(0, t4_count, body,
                           tuple(init_ref[g] for g in range(nway)))
    for gg in range(nway):
        out_ref[pl.ds(gg * rows_per + t4_count * 8, 8), :] = xs[gg] ^ RANS_L


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11))
def rans_decode_v3(csize_hw, tables, init_states, streams, steptots,
                   t4_count, hrows, nway, tlog, packed_stream, packed_cursor,
                   gath_roff=False):
    """streams: [G, hrows, 128] halfword-expanded (packing happens here)."""
    G0 = tables.shape[0]
    T = steptots.shape[1]
    rows_per = t4_count * 8 + 8
    tch = tables.shape[1]
    r8 = ((T + 127) // 128) * 8

    pad = (-G0) % nway
    if pad:
        dup = lambda a: jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        csize_hw, tables, init_states, streams, steptots = map(
            dup, (csize_hw, tables, init_states, streams, steptots))
    G = tables.shape[0]

    totals = jnp.sum(steptots, axis=2)
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    rowoff = jnp.cumsum(steptots, axis=2) - steptots
    bad = (cursors[:, -1] - totals[:, -1]) != 0

    tpad = ((T + 127) // 128) * 128
    ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))
    roff = (ro.reshape(G, tpad // 128, 128, 8)
            .transpose(0, 1, 3, 2)
            .reshape(G, (tpad // 128) * 8, 128)).astype(jnp.int32)

    if packed_cursor:
        rc = _round8(t4_count)
        curs = jnp.zeros((G, rc, 128), jnp.int32).at[:, :t4_count, :4].set(
            cursors.reshape(G, t4_count, 4).astype(jnp.int32))
    else:
        rc = ((T + 7) // 8) * 8
        curs = jnp.zeros((G, rc, 128), jnp.int32).at[:, :T, 0].set(
            cursors.astype(jnp.int32))

    if packed_stream:
        srows = _round8((hrows + 1) // 2 + 8)
        hw = streams.reshape(G, hrows * 128)
        npairs = hrows * 128 // 2
        packed = (hw[:, 0::2] | _sll(hw[:, 1::2], 16))[:, :npairs]
        pk = jnp.zeros((G, srows * 128), jnp.int32).at[:, :npairs].set(packed)
        sarr = pk.reshape(G * srows, 128)
    else:
        srows = hrows
        sarr = streams.reshape(G * hrows, 128)

    kern = functools.partial(_v3_kernel, t4_count=t4_count, srows=srows,
                             nway=nway, tlog=tlog,
                             packed_stream=packed_stream,
                             packed_cursor=packed_cursor,
                             gath_roff=gath_roff)
    out = pl.pallas_call(
        kern,
        grid=(G // nway,),
        in_specs=[
            pl.BlockSpec((nway, tch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * srows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * r8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * rc, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nway * rows_per, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows_per, 128), jnp.int32),
    )(tables, init_states, sarr, roff.reshape(G * r8, 128),
      curs.reshape(G * rc, 128))
    out = out.reshape(G, rows_per, 128)
    err = jnp.abs(out[:, t4_count * 8:, :]).max(axis=(1, 2))
    err = err + bad.astype(jnp.int32)
    return out[:G0, : t4_count * 8, :], err[:G0]


def _v3c_kernel(table_ref, init_ref, stream_ref, roff_ref, cur_ref, out_ref,
                res_ref, xs_ref, *, chunk_t4, n_chunks, srows, nway, tlog):
    """Out-chunked variant: 2D grid (batch, chunk); x-states carry across
    chunks in scratch (grid iterates chunks sequentially per batch)."""
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    spc = 4
    c = pl.program_id(1)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)
    t4_count = chunk_t4 * n_chunks
    roff_rows = roff_ref.shape[0] // nway
    cur_rows = cur_ref.shape[0] // nway
    chunk_rows = chunk_t4 * 8

    @pl.when(c == 0)
    def _init():
        for gg in range(nway):
            xs_ref[pl.ds(gg * 8, 8), :] = init_ref[gg]

    def step(x, t4, pp, gg):
        t = spc * t4 + pp
        slot = x & (tsize - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        e = jnp.zeros(shape, jnp.int32)
        for h in range(tchunks):
            trow = jnp.broadcast_to(table_ref[gg, h: h + 1, :], shape)
            e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        cum = _srl(e, 20)
        x = f * _srl(x, tlog) + slot - cum
        flag = _srl(x, 16) == 0
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

    def body(i, xs):
        xs = list(xs)
        t4 = c * chunk_t4 + i
        syms = [[] for _ in range(nway)]
        for pp in range(spc):
            for gg in range(nway):
                sg, xs[gg] = step(xs[gg], t4, pp, gg)
                syms[gg].append(sg)
        for gg in range(nway):
            sa = syms[gg]
            tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[pl.ds(gg * chunk_rows + i * 8, 8), :] = tile
        return tuple(xs)

    xs0 = tuple(xs_ref[pl.ds(gg * 8, 8), :] for gg in range(nway))
    xs = jax.lax.fori_loop(0, chunk_t4, body, xs0)
    for gg in range(nway):
        xs_ref[pl.ds(gg * 8, 8), :] = xs[gg]
        res_ref[pl.ds(gg * 8, 8), :] = xs[gg] ^ RANS_L  # final chunk's wins


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def rans_decode_v3c(csize_hw, tables, init_states, streams, steptots,
                    t4_count, hrows, nway, tlog, n_chunks):
    G0 = tables.shape[0]
    T = steptots.shape[1]
    tch = tables.shape[1]
    r8 = ((T + 127) // 128) * 8

    pad = (-G0) % nway
    if pad:
        dup = lambda a: jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        csize_hw, tables, init_states, streams, steptots = map(
            dup, (csize_hw, tables, init_states, streams, steptots))
    G = tables.shape[0]

    totals = jnp.sum(steptots, axis=2)
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    rowoff = jnp.cumsum(steptots, axis=2) - steptots
    bad = (cursors[:, -1] - totals[:, -1]) != 0

    tpad = ((T + 127) // 128) * 128
    ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))
    roff = (ro.reshape(G, tpad // 128, 128, 8)
            .transpose(0, 1, 3, 2)
            .reshape(G, (tpad // 128) * 8, 128)).astype(jnp.int32)

    rc = _round8(t4_count)
    curs = jnp.zeros((G, rc, 128), jnp.int32).at[:, :t4_count, :4].set(
        cursors.reshape(G, t4_count, 4).astype(jnp.int32))

    srows = _round8((hrows + 1) // 2 + 8)
    hw = streams.reshape(G, hrows * 128)
    npairs = hrows * 128 // 2
    packed = (hw[:, 0::2] | _sll(hw[:, 1::2], 16))[:, :npairs]
    pk = jnp.zeros((G, srows * 128), jnp.int32).at[:, :npairs].set(packed)
    sarr = pk.reshape(G * srows, 128)

    assert t4_count % n_chunks == 0
    chunk_t4 = t4_count // n_chunks
    chunk_rows = chunk_t4 * 8
    kern = functools.partial(_v3c_kernel, chunk_t4=chunk_t4,
                             n_chunks=n_chunks, srows=srows, nway=nway,
                             tlog=tlog)
    out, res = pl.pallas_call(
        kern,
        grid=(G // nway, n_chunks),
        in_specs=[
            pl.BlockSpec((nway, tch, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, 8, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * srows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * r8, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * rc, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nway * chunk_rows, 128),
                         lambda g, c, n=n_chunks: (g * n + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * 8, 128), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * n_chunks * chunk_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * 8, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nway * 8, 128), jnp.int32)],
    )(tables, init_states, sarr, roff.reshape(G * r8, 128),
      curs.reshape(G * rc, 128))
    out = (out.reshape(G // nway, n_chunks, nway, chunk_rows, 128)
           .transpose(0, 2, 1, 3, 4)
           .reshape(G, t4_count * 8, 128))
    res = res.reshape(G, 8, 128)
    err = jnp.abs(res).max(axis=(1, 2)) + bad.astype(jnp.int32)
    return out[:G0], err[:G0]


def build_inputs(G):
    data = generate_proba(80)[: 1 << 20]
    blob = rans_compress(bytes(data), steptots=True)
    (n, csize_hw, tlog, flags, norm, max_sv, init, payload,
     stots), _ = parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hrows = _round8((csize_hw + 127) // 128 + 16)
    tbl = pack_rans_dtable(norm, tlog)
    hw = np.frombuffer(payload, "<u2").astype(np.int32)
    hws = np.zeros((hrows, 128), np.int32)
    hws.reshape(-1)[: len(hw)] = hw
    T = n_pad // 1024
    args = (np.full(G, csize_hw, np.int32),
            np.broadcast_to(tbl, (G,) + tbl.shape).copy(),
            np.broadcast_to(init.view(np.int32).reshape(8, 128), (G, 8, 128)).copy(),
            np.broadcast_to(hws, (G, hrows, 128)).copy(),
            np.broadcast_to(stots.astype(np.int32), (G, T, 8)).copy())
    return [jnp.asarray(a) for a in args], t4, hrows, data, n, tlog


def run_variant(name, nway, ps, pc, n_chunks=0, reps=6):
    # compute must exceed the ~28 ms tunnel RPC window or the slope hides
    # it (bench.py sizing): 32 vs 128-160 MiB
    G_small = ((32 + nway - 1) // nway) * nway
    G_big = ((128 + nway - 1) // nway) * nway
    args_s, t4, hrows, data, n, tlog = build_inputs(G_small)
    args_b = build_inputs(G_big)[0]

    def call(args):
        if n_chunks:
            return rans_decode_v3c(*args, t4, hrows, nway, tlog,
                                   n_chunks)
        return rans_decode_v3(*args, t4, hrows, nway, tlog, ps, pc,
                              gath_roff=GATH_ROFF)

    def timeit(args, G):
        out, err = call(args)
        e = np.asarray(err)
        assert not e.any(), f"{name}: err {e}"
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out, err = call(args)
            np.asarray(err)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_s, out = timeit(args_s, G_small)
    ob = np.asarray(out)[0].astype("<i4").tobytes()[:n]
    assert ob == data, f"{name}: decode bytes wrong"
    t_b, _ = timeit(args_b, G_big)
    gbs = (G_big - G_small) * (1 << 20) / (t_b - t_s) / 1e9
    print(f"{name}: nway={nway} ps={int(ps)} pc={int(pc)} nc={n_chunks}  "
          f"{gbs:.2f} GB/s  (t_small {t_s*1e3:.1f} ms, t_big {t_b*1e3:.1f} ms)")
    return gbs


VARIANTS = {
    "base": (4, False, False, 0),
    "a": (4, True, False, 0),
    "ab": (4, True, True, 0),
    "ab6": (6, True, True, 0),
    "ab8": (8, True, True, 0),
    "c6": (6, True, True, 8),
    "c8": (8, True, True, 8),
    "c10": (10, True, True, 8),
    "c12": (12, True, True, 8),
    "c8x16": (8, True, True, 16),
    "abr6": (6, True, True, 0),   # run with GATH_ROFF
    "abr4": (4, True, True, 0),
    "ab7": (7, True, True, 0),
}

GATH_ROFF = False

if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "a", "ab", "ab6", "ab8"]
    print("devices:", jax.devices())
    for nm in names:
        nway, ps, pc, nc = VARIANTS[nm]
        GATH_ROFF = nm.startswith("abr")
        try:
            run_variant(nm, nway, ps, pc, nc)
        except Exception as ex:
            print(f"{nm}: FAILED: {type(ex).__name__}: {str(ex)[:300]}")
