"""Probe: two-phase encode (VERDICT r1 item 2, sort-free).

K1 (chain): pure coder chain, no placement — emits per-step
    (emit | rank<<16) tiles + per-step row totals + final states.  The
    serial path is just the chain; rank needs two matmuls but no scratch
    round-trip (no scalar total is ever needed in-loop).
XLA middle: reverse-cumsum row totals -> per-step cursor scalars (the same
    math the v2 decoder uses, in the encode direction).
K3 (placement): per step, one pull pass over packed word slots — binary
    search over the rank field of K1's tiles; no chain, no serial
    dependency, positions from precomputed cursor scalars.

Wire is unchanged (v2 FLAG_STEPTOTS groups, byte-identical to the twin).
Usage: python tools/probe_encode3.py [group_kib] [reps]
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
from finitestateentropy_tpu.turbo.rans_kernels import (_make_tria, _make_tril8,
                                                       _mulhi32, _uge,
                                                       pack_rans_ctables)
from finitestateentropy_tpu.utils import generate_proba

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left


def _round8(x):
    return (x + 7) // 8 * 8


# ---------------------------------------------------------------------------
# K1: chain kernel
# ---------------------------------------------------------------------------


def _chain_kernel(fc_ref, magic_ref, src_ref, er_ref, fin_ref, st_ref,
                  *, t4_count, tlog, nway=1):
    shape = (8, 128)
    tria = _make_tria()
    tril8 = _make_tril8()
    thresh_shift = 32 - tlog
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    spc = 4
    tiles_span = 128 // spc

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

    src_rows = t4_count * 8
    er_rows_per = t4_count * 4 * 8
    sect_rows = ((t4_count + 31) // 32) * 8

    def step(x, tile, t, word, p, gg):
        sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(2):
            frow = jnp.broadcast_to(fc_ref[gg, h: h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[gg, h: h + 1, :], shape)
            hit = shi == h
            e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
            m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
        f = e & 0xFFF
        c = _srl(e, 12) & 0xFFF

        flag = _uge(x, _sll(f, thresh_shift))
        emit = x & 0xFFFF
        x = jnp.where(flag, _srl(x, 16), x)
        q, r = div(x, f, m)
        x = _sll(q, tlog) + c + r

        # flat inclusive rank: 2 matmuls, NO scalar round-trip
        aug = jax.lax.dot_general(
            flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        within = aug[:, :128]
        rowtot = aug[:, 128:129]
        rowpre = jax.lax.dot_general(
            tril8, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rank = (within + rowpre).astype(jnp.int32)

        er_ref[pl.ds(gg * er_rows_per + t * 8, 8), :] = emit | _sll(rank, 16)
        rowtot_b = jnp.broadcast_to(rowtot, shape).astype(jnp.int32)
        tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)
        return x, tile

    def body(i, carry):
        xs, tiles = list(carry[0]), list(carry[1])
        t4 = t4_count - 1 - i
        zero = jnp.zeros(shape, jnp.int32)
        reset = (t4 % tiles_span) == tiles_span - 1
        words = [src_ref[pl.ds(gg * src_rows + t4 * 8, 8), :]
                 for gg in range(nway)]
        for gg in range(nway):
            tiles[gg] = jnp.where(reset, zero, tiles[gg])
        for p in (3, 2, 1, 0):
            for gg in range(nway):
                xs[gg], tiles[gg] = step(xs[gg], tiles[gg], 4 * t4 + p,
                                         words[gg], p, gg)
        for gg in range(nway):
            st_ref[pl.ds(gg * sect_rows + (t4 // tiles_span) * 8, 8), :] = \
                tiles[gg]
        return tuple(xs), tuple(tiles)

    x0 = jnp.full(shape, RANS_L, jnp.int32)
    zero = jnp.zeros(shape, jnp.int32)
    xs, _ = jax.lax.fori_loop(
        0, t4_count, body,
        (tuple(x0 for _ in range(nway)), tuple(zero for _ in range(nway))))
    for gg in range(nway):
        fin_ref[pl.ds(gg * 8, 8), :] = xs[gg]


# ---------------------------------------------------------------------------
# K3: placement kernel
# ---------------------------------------------------------------------------


def _place_kernel(er_ref, cur_ref, out_ref, *, t4_count, hcap_p, nway=1):
    shape = (8, 128)
    spc = 4
    rc = _round8(t4_count)
    er_rows_per = t4_count * 4 * 8

    def pull(t4, pp, gg):
        ca = cur_ref[gg * rc + t4, pp]           # C(t) = cursor + total
        cb = cur_ref[gg * rc + t4, 8 + pp]       # C(t+1) = cursor
        er = er_ref[pl.ds(gg * er_rows_per + (spc * t4 + pp) * 8, 8), :]
        rank = _srl(er, 16)
        base_loc = jnp.clip(_srl(cb, 8), 0, hcap_p - 8)
        base = base_loc + gg * hcap_p
        wpos = base_loc * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        total = ca - cb

        def search(want):
            lo = jnp.zeros(shape, jnp.int32)
            hi_b = jnp.full(shape, 1023, jnp.int32)
            for _ in range(10):
                mid = _srl(lo + hi_b, 1)
                mhi = _srl(mid, 7)
                mlo = mid & 127
                rv = jnp.zeros(shape, jnp.int32)
                for h in range(8):
                    row = jnp.broadcast_to(rank[h: h + 1, :], shape)
                    rv = jnp.where(mhi == h,
                                   jnp.take_along_axis(row, mlo, axis=1), rv)
                ge = rv >= want
                hi_b = jnp.where(ge, mid, hi_b)
                lo = jnp.where(ge, lo, mid + 1)
            ehi = _srl(hi_b, 7)
            elo = hi_b & 127
            ev = jnp.zeros(shape, jnp.int32)
            for h in range(8):
                row = jnp.broadcast_to(er[h: h + 1, :], shape)
                ev = jnp.where(ehi == h,
                               jnp.take_along_axis(row, elo, axis=1), ev)
            return ev & 0xFFFF

        want0 = ca - 2 * wpos          # halfword 2w
        want1 = want0 - 1              # halfword 2w+1
        v0 = search(want0)
        v1 = search(want1)
        valid0 = (want0 >= 1) & (want0 <= total)
        valid1 = (want1 >= 1) & (want1 <= total)
        old = out_ref[pl.ds(base, 8), :]
        lo16 = jnp.where(valid0, v0, old & 0xFFFF)
        hi16 = jnp.where(valid1, v1, _srl(old, 16))
        out_ref[pl.ds(base, 8), :] = lo16 | _sll(hi16, 16)

    def body(t4, _):
        for pp in range(spc):
            for gg in range(nway):
                pull(t4, pp, gg)
        return 0

    jax.lax.fori_loop(0, t4_count, body, 0)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def encode2(fc, mg, srcw, t4_count, tlog, nway1=2, nway3=4):
    """fc[G,2,128], mg[G,2,128], srcw[G,t4*8,128] ->
    (packed stream[G,hcap_p,128], finals[G,8,128], csize[G], stots[G,T,8])"""
    G = fc.shape[0]
    T = t4_count * 4
    sect_rows = ((t4_count + 31) // 32) * 8
    er_rows = T * 8
    assert G % nway1 == 0 and G % nway3 == 0
    k1 = functools.partial(_chain_kernel, t4_count=t4_count, tlog=tlog,
                           nway=nway1)
    er, fin, st = pl.pallas_call(
        k1,
        grid=(G // nway1,),
        in_specs=[
            pl.BlockSpec((nway1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway1 * t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nway1 * er_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway1 * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway1 * sect_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * er_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * sect_rows, 128), jnp.int32),
        ],
    )(fc, mg, srcw.reshape(G * t4_count * 8, 128))

    # stots section layout -> [G, T, 8] (same transpose as rans_encode)
    st = st.reshape(G, sect_rows // 8, 8, 128)
    stots = (st.transpose(0, 1, 3, 2)
             .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])

    totals = jnp.sum(stots, axis=2)                       # [G,T]
    # C(t) = sum_{s >= t} totals[s]  (encode cursor grows as t descends)
    crev = jnp.flip(jnp.cumsum(jnp.flip(totals, 1), axis=1), 1)
    csize = crev[:, 0]
    ca = crev                                             # C(t)
    cb = crev - totals                                    # C(t+1)
    rc = _round8(t4_count)
    cur = jnp.zeros((G, rc, 128), jnp.int32)
    cur = cur.at[:, :t4_count, :4].set(ca.reshape(G, t4_count, 4))
    cur = cur.at[:, :t4_count, 8:12].set(cb.reshape(G, t4_count, 4))

    n_pad = t4_count * TURBO_STEP_SYMS
    hcap_p = _round8(n_pad // 256 + 16)
    k3 = functools.partial(_place_kernel, t4_count=t4_count, hcap_p=hcap_p,
                           nway=nway3)
    out = pl.pallas_call(
        k3,
        grid=(G // nway3,),
        in_specs=[
            pl.BlockSpec((nway3 * er_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nway3 * rc, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nway3 * hcap_p, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * hcap_p, 128), jnp.int32),
    )(er, cur.reshape(G * rc, 128))
    return out.reshape(G, hcap_p, 128), fin.reshape(G, 8, 128), csize, stots


@functools.partial(jax.jit, static_argnums=(3, 4))
def k1_only(fc, mg, srcw, t4_count, tlog):
    G = fc.shape[0]
    T = t4_count * 4
    sect_rows = ((t4_count + 31) // 32) * 8
    er_rows = T * 8
    k1 = functools.partial(_chain_kernel, t4_count=t4_count, tlog=tlog)
    er, fin, st = pl.pallas_call(
        k1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((er_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sect_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * er_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * sect_rows, 128), jnp.int32),
        ],
    )(fc, mg, srcw.reshape(G * t4_count * 8, 128))
    return er, fin, st, jnp.sum(fin)  # tiny dependent sync scalar


def _place_kernel_c(er_ref, cur_ref, out_ref, *, chunk_t4, n_chunks,
                    hcap_p, nway):
    """er-chunked placement: grid (batch, chunk), er block holds only
    chunk_t4 supercycles per group; out/cur blocks whole (revisited)."""
    shape = (8, 128)
    spc = 4
    t4_count = chunk_t4 * n_chunks
    rc = _round8(t4_count)
    er_rows_per = chunk_t4 * 4 * 8
    c = pl.program_id(1)

    def pull(i, pp, gg):
        t4 = c * chunk_t4 + i
        ca = cur_ref[gg * rc + t4, pp]
        cb = cur_ref[gg * rc + t4, 8 + pp]
        er = er_ref[pl.ds(gg * er_rows_per + (spc * i + pp) * 8, 8), :]
        rank = _srl(er, 16)
        base_loc = jnp.clip(_srl(cb, 8), 0, hcap_p - 8)
        base = base_loc + gg * hcap_p
        wpos = base_loc * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        total = ca - cb

        def search(want):
            lo = jnp.zeros(shape, jnp.int32)
            hi_b = jnp.full(shape, 1023, jnp.int32)
            for _ in range(10):
                mid = _srl(lo + hi_b, 1)
                mhi = _srl(mid, 7)
                mlo = mid & 127
                rv = jnp.zeros(shape, jnp.int32)
                for h in range(8):
                    row = jnp.broadcast_to(rank[h: h + 1, :], shape)
                    rv = jnp.where(mhi == h,
                                   jnp.take_along_axis(row, mlo, axis=1), rv)
                ge = rv >= want
                hi_b = jnp.where(ge, mid, hi_b)
                lo = jnp.where(ge, lo, mid + 1)
            ehi = _srl(hi_b, 7)
            elo = hi_b & 127
            ev = jnp.zeros(shape, jnp.int32)
            for h in range(8):
                row = jnp.broadcast_to(er[h: h + 1, :], shape)
                ev = jnp.where(ehi == h,
                               jnp.take_along_axis(row, elo, axis=1), ev)
            return ev & 0xFFFF

        want0 = ca - 2 * wpos
        want1 = want0 - 1
        v0 = search(want0)
        v1 = search(want1)
        valid0 = (want0 >= 1) & (want0 <= total)
        valid1 = (want1 >= 1) & (want1 <= total)
        old = out_ref[pl.ds(base, 8), :]
        lo16 = jnp.where(valid0, v0, old & 0xFFFF)
        hi16 = jnp.where(valid1, v1, _srl(old, 16))
        out_ref[pl.ds(base, 8), :] = lo16 | _sll(hi16, 16)

    def body(i, _):
        for pp in range(spc):
            for gg in range(nway):
                pull(i, pp, gg)
        return 0

    jax.lax.fori_loop(0, chunk_t4, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def k3_only(er, cur, t4_count, hcap_p, nway=1, n_chunks=1):
    GR = er.shape[0]
    T = t4_count * 4
    er_rows = T * 8
    G = GR // er_rows
    rc = _round8(t4_count)
    assert t4_count % n_chunks == 0
    chunk_t4 = t4_count // n_chunks
    er_blk = chunk_t4 * 4 * 8
    # reorder er to (batch, chunk)-major so each grid cell's block is
    # contiguous: [Gb, nway, nc, er_blk, :] -> [Gb, nc, nway, er_blk, :]
    er = (er.reshape(G // nway, nway, n_chunks, er_blk, 128)
          .transpose(0, 2, 1, 3, 4).reshape(G * er_rows, 128))
    k3 = functools.partial(_place_kernel_c, chunk_t4=chunk_t4,
                           n_chunks=n_chunks, hcap_p=hcap_p, nway=nway)
    out = pl.pallas_call(
        k3,
        grid=(G // nway, n_chunks),
        in_specs=[
            pl.BlockSpec((nway * er_blk, 128),
                         lambda g, c, n=n_chunks: (g * n + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway * rc, 128), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nway * hcap_p, 128), lambda g, c: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * hcap_p, 128), jnp.int32),
    )(er, cur)
    return out, jnp.sum(out[:8])  # tiny dependent sync scalar


def stage_attribution(args_s, args_b, G_small, G_big, t4, gsz, reps=6):
    def slope(fn, mk):
        ts = {}
        for args, G in ((args_s, G_small), (args_b, G_big)):
            ins = mk(args, G)
            fn(*ins)
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                r = fn(*ins)
                np.asarray(r[-1])  # tiny sync scalar (last element)
                best = min(best, time.perf_counter() - t0)
            ts[G] = best
        return (G_big - G_small) * gsz / (ts[G_big] - ts[G_small]) / 1e9

    k1_gbs = slope(lambda fc, mg, srcw: k1_only(fc, mg, srcw, t4, RANS_TABLELOG),
                   lambda a, G: a)
    print(f"K1 (chain) alone: {k1_gbs:.2f} GB/s")

    n_pad = t4 * TURBO_STEP_SYMS
    hcap_p = _round8(n_pad // 256 + 16)
    rc = _round8(t4)

    def mk_k3(args, G):
        er, fin, st, _ = k1_only(*args, t4, RANS_TABLELOG)
        sect_rows = ((t4 + 31) // 32) * 8
        T = t4 * 4
        stv = st.reshape(G, sect_rows // 8, 8, 128)
        stots = (stv.transpose(0, 1, 3, 2)
                 .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])
        totals = jnp.sum(stots, axis=2)
        crev = jnp.flip(jnp.cumsum(jnp.flip(totals, 1), axis=1), 1)
        cur = jnp.zeros((G, rc, 128), jnp.int32)
        cur = cur.at[:, :t4, :4].set(crev.reshape(G, t4, 4))
        cur = cur.at[:, :t4, 8:12].set((crev - totals).reshape(G, t4, 4))
        return jax.block_until_ready(er), \
            jax.block_until_ready(cur.reshape(G * rc, 128))

    for nway3, nc in ((2, 1), (4, 4), (8, 8)):
        try:
            k3_gbs = slope(lambda er, cur: k3_only(er, cur, t4, hcap_p,
                                                   nway3, nc), mk_k3)
            print(f"K3 (placement) nway={nway3} nc={nc}: {k3_gbs:.2f} GB/s")
        except Exception as ex:
            print(f"K3 nway={nway3} nc={nc}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}")


def main():
    gkib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    gsz = gkib << 10
    data = generate_proba(80)[:gsz]
    if len(data) < gsz:
        data = (data * (gsz // len(data) + 1))[:gsz]

    # twin reference wire
    blob = rans_compress(bytes(data), steptots=True)
    (n, csize_hw, tlog, flags, norm, max_sv, init, payload,
     stots_ref), _ = parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS

    fc1, mg1 = pack_rans_ctables(norm)
    mfs = int(np.bincount(np.frombuffer(data, np.uint8), minlength=256).argmax())
    pad = np.full(n_pad, mfs, np.uint8)
    pad[:n] = np.frombuffer(data, np.uint8)
    srcw1 = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)

    def build(G):
        return (jnp.asarray(np.broadcast_to(fc1, (G, 2, 128)).copy()),
                jnp.asarray(np.broadcast_to(mg1, (G, 2, 128)).copy()),
                jnp.asarray(np.broadcast_to(srcw1, (G, t4 * 8, 128)).copy()))

    G_small = max(32 * 1024 * 1024 // gsz, 1)
    G_big = max(128 * 1024 * 1024 // gsz, 2)
    args_s, args_b = build(G_small), build(G_big)

    out, fin, csize, stots = encode2(*args_s, t4, RANS_TABLELOG)
    cs = int(np.asarray(csize)[0])
    hw = np.asarray(out)[0].reshape(-1).view(np.uint32)
    got = np.zeros(2 * hw.size, np.uint16)
    got[0::2] = hw & 0xFFFF
    got[1::2] = hw >> 16
    ref_hw = np.frombuffer(payload, "<u2")
    print(f"csize: got {cs} ref {csize_hw}")
    assert cs == csize_hw, "csize mismatch"
    assert np.array_equal(got[:cs], ref_hw), \
        f"stream mismatch at {np.nonzero(got[:cs] != ref_hw)[0][:8]}"
    assert np.array_equal(np.asarray(stots)[0].astype(np.uint8), stots_ref)
    assert np.asarray(fin)[0].reshape(-1).view(np.uint32).tobytes() == \
        init.astype("<u4").tobytes()
    print("byte-exact vs twin OK")

    def timeit(args, G):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o, f, c, s = encode2(*args, t4, RANS_TABLELOG)
            np.asarray(c)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s = timeit(args_s, G_small)
    t_b = timeit(args_b, G_big)
    gbs = (G_big - G_small) * gsz / (t_b - t_s) / 1e9
    print(f"two-phase encode ({gkib} KiB groups): {gbs:.2f} GB/s  "
          f"(t_small {t_s*1e3:.1f} ms, t_big {t_b*1e3:.1f} ms)")
    stage_attribution(args_s, args_b, G_small, G_big, t4, gsz)


if __name__ == "__main__":
    main()
