"""Probe: two-pass encoder experiment (pass-1 pure chain, XLA middle,
pass-2 placement) — byte-exact but SLOWER than the fused rans_encode.

Measured on chip (1 MiB groups, p80):
    fused  rans_encode : 1.75 GB/s  (t16 36 ms, t96  84 ms)
    two-pass (this)    : 1.31 GB/s  (t16 37 ms, t96 101 ms)
    pass1 + cumsum only: 8.43 GB/s  (t16 25 ms, t96  35 ms)
    pass1 + sort middle: 2.22 GB/s  (t16 35 ms, t96  73 ms)

The pure chain is ~3.4x faster than the fused serial path, but the XLA
sort_key_val over [G,T,1024] (~28 ms / 80 MiB) and the pass-2 placement
(~26 ms / 80 MiB) each cost about as much as the savings.  A sort-free
variant (binary-search placement in pass 2) would just move the sort cost
into pass 2, so the fused single-pass encoder remains production.
Kept as a standalone probe; not part of the package.
"""
import functools
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.rans_kernels import (  # noqa: E402
    RANS_L, RANS_TABLELOG, _srl, _sll, _uge, _mulhi32)





def _rans_chain_kernel(fc_ref, magic_ref, src_ref, out_ref,
                       *, t4_count, tlog=RANS_TABLELOG):
    """Pass 1: per step emit/flag records; trailer = final states."""
    shape = (8, 128)
    thresh_shift = 32 - tlog

    def step(x, word, p):
        sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(2):
            frow = jnp.broadcast_to(fc_ref[0, h : h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[0, h : h + 1, :], shape)
            hit = shi == h
            e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
            m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
        f = e & 0xFFF
        c = _srl(e, 12) & 0xFFF
        flag = _uge(x, _sll(f, thresh_shift))
        rec = (x & 0xFFFF) | jnp.where(flag, 1 << 16, 0)
        x = jnp.where(flag, _srl(x, 16), x)
        q = _mulhi32(x, m)
        r = x - q * f
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        big = _uge(r, f)
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - f, r)
        return _sll(q, tlog) + c + r, rec

    def body(i, x):
        t4 = t4_count - 1 - i
        word = src_ref[pl.ds(t4 * 8, 8), :]
        for p in (3, 2, 1, 0):
            x, rec = step(x, word, p)
            out_ref[pl.ds((4 * t4 + p) * 8, 8), :] = rec
        return x

    x = jax.lax.fori_loop(0, t4_count, body, jnp.full(shape, RANS_L, jnp.int32))
    out_ref[pl.ds(t4_count * 32, 8), :] = x


def _rans_place_kernel(emit_ref, meta_ref, out_ref,
                       *, t4_count, wrows_cap):
    """Pass 2: place emissions as packed u16 pairs.

    emit_ref rows [t*8, t*8+8): the step's emissions sorted by rank;
    meta row t: lane 0 = E_t (emissions before step t), lane 1 = c_t.
    Positions ascend as rank descends, so position E_t + j holds the
    emission with rank c_t - j."""
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    def place(t, _):
        e_t = meta_ref[t, 0]
        c_t = meta_ref[t, 1]
        emittile = emit_ref[pl.ds(t * 8, 8), :]

        def half(j):
            valid = (j >= 0) & (j < c_t)
            jc = jnp.clip(c_t - 1 - j, 0, 1023)
            jhi = _srl(jc, 7)
            jlo = jc & 127
            val = jnp.zeros(shape, jnp.int32)
            for h in range(8):
                erow = jnp.broadcast_to(emittile[h : h + 1, :], shape)
                val = jnp.where(jhi == h,
                                jnp.take_along_axis(erow, jlo, axis=1), val)
            return jnp.where(valid, val & 0xFFFF, 0), valid

        # one [8,128] word tile covers 2048 halfword positions; the step's
        # span is < 128 + 1024 + 1 positions, so a single pass suffices
        base_row = jnp.clip(_srl(e_t, 8), 0, wrows_cap - 8)
        w = base_row * 128 + rows8 * 128 + lanes
        lo_v, lo_ok = half(2 * w - e_t)
        hi_v, hi_ok = half(2 * w + 1 - e_t)
        word = lo_v | _sll(hi_v, 16)
        keep = ~(lo_ok | hi_ok)
        partial = lo_ok ^ hi_ok
        old = out_ref[pl.ds(base_row, 8), :]
        merged = jnp.where(
            partial,
            word | jnp.where(lo_ok, old & ~0xFFFF & -1, old & 0xFFFF),
            word)
        out_ref[pl.ds(base_row, 8), :] = jnp.where(keep, old, merged)
        return 0

    jax.lax.fori_loop(0, t4_count * 4, place, 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def rans_encode2(fc_tables, magic_tables, src_words,
                 t4_count: int, hrows_cap: int, interpret: bool = False,
                 u16: bool = False, tlog: int = RANS_TABLELOG,
                 steptots: bool = True):
    """Two-pass encoder; byte-identical output to rans_encode/the twin.

    Same signature/returns as rans_encode (u16 unsupported here — the
    callers keep rans_encode for u16)."""
    assert not u16
    G = fc_tables.shape[0]
    T = t4_count * 4

    # pass 1: chain -> records [G, T*8 + 8, 128]
    kern1 = functools.partial(_rans_chain_kernel, t4_count=t4_count, tlog=tlog)
    rows1 = T * 8 + 8
    recs = pl.pallas_call(
        kern1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows1, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows1, 128), jnp.int32),
        interpret=interpret,
    )(fc_tables, magic_tables, src_words.reshape(G * t4_count * 8, 128))
    recs = recs.reshape(G, rows1, 128)
    fin = recs[:, T * 8 :, :]
    recs = recs[:, : T * 8, :]

    # XLA middle: ranks, cursors, emissions sorted by rank
    flags = (_srl(recs, 16) & 1).reshape(G, T, 1024)
    emit = (recs & 0xFFFF).reshape(G, T, 1024)
    rank = jnp.cumsum(flags, axis=2)                         # inclusive
    totals = rank[:, :, -1]                                  # [G,T]
    csize = jnp.sum(totals, axis=1)                          # [G]
    e_t = jnp.cumsum(totals[:, ::-1], axis=1)[:, ::-1] - totals  # before step t
    stots = flags.reshape(G, T, 8, 128).sum(axis=3) if steptots else None

    # sort emissions into rank order (flagged lanes first, lane-ascending)
    key = jnp.where(flags == 1, rank - 1, 1024 + jnp.arange(1024))
    _, emit_sorted = jax.lax.sort_key_val(key, emit, dimension=2)
    emit_tiles = emit_sorted.astype(jnp.int32).reshape(G, T * 8, 128)

    # meta row t: lane 0 = E_t, lane 1 = c_t (static-lane scalar reads)
    mrows = ((T + 7) // 8) * 8
    meta = jnp.zeros((G, mrows, 128), jnp.int32)
    meta = meta.at[:, :T, 0].set(e_t.astype(jnp.int32))
    meta = meta.at[:, :T, 1].set(totals.astype(jnp.int32))

    wrows_cap = (((hrows_cap + 1) // 2 + 7) // 8) * 8        # packed u16 pairs
    kern2 = functools.partial(_rans_place_kernel, t4_count=t4_count,
                              wrows_cap=wrows_cap)
    packed = pl.pallas_call(
        kern2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mrows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wrows_cap, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * wrows_cap, 128), jnp.int32),
        interpret=interpret,
    )(emit_tiles.reshape(G * T * 8, 128), meta.reshape(G * mrows, 128))
    packed = packed.reshape(G, wrows_cap, 128)
    return packed, fin, csize.astype(jnp.int32), stots

if __name__ == "__main__":
    from bench import _prep, _time
    from finitestateentropy_tpu.turbo.rans_kernels import rans_encode

    p = _prep(1 << 20, 80)
    fc, mg = p["fc_mg"]
    t4, hcap = p["t4"], p["hcap"]
    times = {"fused": {}, "2pass": {}}
    for G in (16, 96):
        a = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
             jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
             jnp.asarray(np.broadcast_to(p["srcw"], (G, t4 * 8, 128)).copy()))
        s1, f1, c1, st1 = rans_encode(*a, t4, hcap)
        s2, f2, c2, st2 = rans_encode2(*a, t4, hcap)
        if G == 16:
            cs = int(np.asarray(c1)[0])
            hw1 = np.asarray(s1)[0].reshape(-1)[:cs].astype(np.uint16)
            pk = np.asarray(s2)[0].reshape(-1)
            hw2 = np.stack([pk & 0xFFFF, pk >> 16], 1).reshape(-1)[:cs]
            print("byte-exact:", np.array_equal(hw1, hw2.astype(np.uint16)),
                  np.array_equal(np.asarray(f1), np.asarray(f2)),
                  np.array_equal(np.asarray(st1), np.asarray(st2)))
        times["fused"][G] = _time(lambda a2=a: rans_encode(*a2, t4, hcap)[2],
                                  lambda x: np.asarray(x))
        times["2pass"][G] = _time(lambda a2=a: rans_encode2(*a2, t4, hcap)[2],
                                  lambda x: np.asarray(x))
    for k, tt in times.items():
        print(f"{k}: slope {80*1.048576/((tt[96]-tt[16])*1e3):.2f} GB/s "
              f"(t16 {tt[16]*1e3:.0f} ms, t96 {tt[96]*1e3:.0f} ms)")
