"""Probe: row-local pull placement for the TurboRANS encode kernel.

The shipped encode2 kernel is issue-bound on its pull placement: every
step runs TWO 10-iteration binary searches over the FLAT 1024-lane rank
array, each iteration paying an 8-chunk lane-gather (~24 vreg ops), i.e.
~480 vreg ops per step just for placement.

Observation: the wire's placement rule (position p holds the lane with
flat rank cursor+total-p) makes each sublane ROW's emissions CONTIGUOUS
in the stream: row r's step emissions occupy halfwords
[cursor + total - off_r - rt_r, cursor + total - off_r), where off_r is
the exclusive prefix of per-row renorm counts.  So placement decomposes
into 8 row-local problems, each a 7-iteration binary search over ONE
128-lane row (plain take_along_axis, no chunk select), batched as one
(16,128) computation (subrow sr = window word-row sr//8 of row sr%8).
The price: 16 read-modify-write [1,128] stores per step instead of 1
[8,128] store.  Wire bytes are IDENTICAL.

Usage:
  JAX_PLATFORMS=cpu python tools/probe_encode4.py --check   (byte equality)
  python tools/probe_encode4.py --time                      (TPU slope)
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from finitestateentropy_tpu.turbo.rans import RANS_L
from finitestateentropy_tpu.turbo.rans_kernels import (
    _make_tria, _mulhi32, _sll, _srl, _uge)

TURBO_LANES = 1024


def _rans_encode4_kernel(fc_ref, magic_ref, src_ref, out_ref, tail_ref,
                         sect_ref, scr_ref, xs_ref, cv_ref, tile_ref,
                         *, chunk_t4, n_chunks, hcap_p,
                         tlog=10, steptots=True):
    shape = (8, 128)
    tria = _make_tria()
    thresh_shift = 32 - tlog
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    tiles_span = 32
    c = pl.program_id(1)

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

        # per-row windows: row r's emissions land at halfwords
        # [cursor+total-offs[r]-rt_r, cursor+total-offs[r]) — contiguous.
        # Window = 2 word-rows at bw_r = (start >> 8 floor via end) ... use
        # base from the span END going down: bw_r = clip((end_r-1)>>8 - 1)?
        # Simpler: base from span start bw_r = clip(srl(start,8)); span
        # <= 128 hw + misalign < 256 hw -> 2 rows always cover it.
        ct = cursor + total
        # constants per subrow: k_r = ct - offs[r]; base rows bw_r
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def rans_encode4(fc_tables, magic_tables, src_words,
                 t4_count: int, hrows_cap: int, interpret: bool = False,
                 tlog: int = 10, steptots: bool = True, force_chunk: int = 0):
    from finitestateentropy_tpu.turbo.rans_kernels import _enc_chunking

    G = fc_tables.shape[0]
    T = t4_count * 4
    tiles_span = 32
    chunk_t4, n_chunks = _enc_chunking(t4_count, 4, force_chunk)
    hcap_p = ((hrows_cap + 1) // 2 + 8 + 7) // 8 * 8
    sect_rows = ((t4_count + tiles_span - 1) // tiles_span) * 8

    kern = functools.partial(_rans_encode4_kernel, chunk_t4=chunk_t4,
                             n_chunks=n_chunks, hcap_p=hcap_p,
                             tlog=tlog, steptots=steptots)
    out, tail, sect = pl.pallas_call(
        kern,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_t4 * 8, 128),
                         lambda g, c, n=n_chunks: (g * n + (n - 1 - c), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hcap_p, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sect_rows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
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
    )(fc_tables, magic_tables, src_words.reshape(G * t4_count * 8, 128))

    w = out.reshape(G, hcap_p * 128)
    hw = jnp.zeros((G, hrows_cap * 128), jnp.int32)
    hw = hw.at[:, 0::2].set((w & 0xFFFF)[:, : (hrows_cap * 128 + 1) // 2])
    hw = hw.at[:, 1::2].set(_srl(w, 16)[:, : hrows_cap * 128 // 2])
    stream = hw.reshape(G, hrows_cap, 128)
    tail = tail.reshape(G, 16, 128)
    if steptots:
        stots = (sect.reshape(G, sect_rows // 8, 8, 128)
                 .transpose(0, 1, 3, 2)
                 .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])
    else:
        stots = None
    return stream, tail[:, 0:8, :], tail[:, 8, 0], stots


def _inputs(group_bytes, G, proba, tlog):
    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import pack_rans_ctables
    from finitestateentropy_tpu.utils import generate_proba

    base = generate_proba(proba)
    data = (base * ((group_bytes // len(base)) + 1))[:group_bytes]
    src = np.frombuffer(data, np.uint8)
    norm, max_sv, ncount, mfs = _prep_group(src, tlog)
    n_pad = _pad_n(group_bytes)
    t4 = n_pad // TURBO_STEP_SYMS
    pad = np.full(n_pad, mfs, np.uint8)
    pad[:group_bytes] = src
    fc, mg = pack_rans_ctables(norm)
    srcw = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)
    return (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
            jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
            jnp.asarray(np.broadcast_to(srcw, (G, t4 * 8, 128)).copy()),
            t4, _hrows_cap(n_pad))


def check():
    from finitestateentropy_tpu.turbo.rans_kernels import rans_encode2

    for proba, nbytes, force in ((80, 16384, 0), (80, 16384, 2), (14, 8192, 0),
                                 (2, 8192, 0)):
        fc, mg, srcw, t4, hcap = _inputs(nbytes, 1, proba, 10)
        s1, f1, c1, st1 = rans_encode2(fc, mg, srcw, t4, hcap, True, False,
                                       10, True, force)
        s2, f2, c2, st2 = rans_encode4(fc, mg, srcw, t4, hcap, True,
                                       10, True, force)
        cs = int(np.asarray(c1)[0])
        assert int(np.asarray(c2)[0]) == cs, (proba, force)
        # encode2 returns PACKED words (2 LE halfwords each); encode4's
        # wrapper unpacks to one halfword per element — unpack before diff
        w1 = np.asarray(s1)[0].reshape(-1)
        hw1 = np.zeros(2 * len(w1), np.int64)
        hw1[0::2] = w1 & 0xFFFF
        hw1[1::2] = (w1 >> 16) & 0xFFFF
        ok_s = np.array_equal(np.asarray(s2)[0].reshape(-1)[:cs], hw1[:cs])
        ok_f = np.array_equal(np.asarray(f2), np.asarray(f1))
        ok_t = np.array_equal(np.asarray(st2), np.asarray(st1))
        print(f"p{proba:02d} force={force}: stream={ok_s} fin={ok_f} "
              f"stots={ok_t} cs={cs}")
        assert ok_s and ok_f and ok_t


def timeit():
    from finitestateentropy_tpu.turbo.rans_kernels import rans_encode2

    gb = 1 << 20
    for name, fn in (("encode2(base)", rans_encode2), ("encode4(rowloc)",
                                                       rans_encode4)):
        ts = {}
        for G in (8, 32):
            fc, mg, srcw, t4, hcap = _inputs(gb, G, 80, 10)
            if fn is rans_encode2:
                r = fn(fc, mg, srcw, t4, hcap, False, False, 10, True)
            else:
                r = fn(fc, mg, srcw, t4, hcap, False, 10, True)
            np.asarray(r[2])
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                if fn is rans_encode2:
                    r = fn(fc, mg, srcw, t4, hcap, False, False, 10, True)
                else:
                    r = fn(fc, mg, srcw, t4, hcap, False, 10, True)
                np.asarray(r[2])
                best = min(best, time.perf_counter() - t0)
            ts[G] = best
        gbps = (32 - 8) * gb / (ts[32] - ts[8]) / 1e9
        print(f"{name}: {gbps:.3f} GB/s  (t8 {ts[8]*1e3:.1f} ms, "
              f"t32 {ts[32]*1e3:.1f} ms)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", action="store_true")
    a = ap.parse_args()
    if a.check:
        check()
    if a.time:
        timeit()
