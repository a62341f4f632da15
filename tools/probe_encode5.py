"""Probe: two-level (row-local) pull placement for the encode kernel.

VERDICT (r3): UNSOUND AS DESIGNED — kept as a lab note.  The "pre-gather
row rr's within-row ranks" trick builds wrow[slot] = within[rr[slot],
slot.lane], but the binary search then gathers wrow at lane `mid`, which
reads within[rr[OTHER slot], mid] — the rr of whichever slot sits at lane
`mid`, not this slot's row.  It only coincides when every slot in a
sublane shares one rr (localized via tools/dbg_rl.py: first emitting step,
wants 4..1 all returned lane of the wrong row).  Fixing it requires the
row-select back inside the loop (7x8-chunk selects ~= the flat search's
10x8, no win).  The sound decomposition is probe_encode4.py: place each
ROW's emissions via its own (16,128) subrow window, where slot row ==
searched row and take_along_axis needs no chunk select at all — that
probe is byte-identical to the shipped wire on all corpora.

The shipped encode is issue-bound by the placement searches: each packed
out word runs TWO 10-iteration binary searches over the FLAT 1024-lane
rank, and every iteration pays an 8-chunk cross-row gather (~24 vector
ops) — ~500 ops/step just for placement (VERDICT r2 #3; three earlier
byte-exact restructurings all measured slower, see PERFORMANCE.md).

This variant keeps the wire byte-identical and decomposes the search:
  1. row find: want's row r(s) from the 8 row-prefix values (7 sublane
     broadcasts + compares; rowpre is already an MXU by-product)
  2. pre-gather row r(s)'s within-row ranks (8 broadcast+selects, ONCE)
  3. 7-iteration binary search per want with single take_along_axis
     iterations (within-row rank is lane-monotone)
  4. emit value via the same pre-gathered-row trick
~160 ops per step for both wants vs ~530 flat — placement leaves the
issue-bound path if the decomposition's extra latency doesn't eat it.

Usage: python tools/probe_encode5.py [base|rl|rls] ...
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

from finitestateentropy_tpu.turbo.format import TURBO_LANES, TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import RANS_L, RANS_SPEED_TABLELOG
from finitestateentropy_tpu.turbo.rans_kernels import (
    _chunk_gather, _make_tria, _make_tril8, _mulhi32, _srl, _sll, _uge,
    pack_rans_ctables, rans_encode2, stream_word_rows)
from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
from finitestateentropy_tpu.refimpl.hist import hist_count
from finitestateentropy_tpu.utils import generate_proba


def _round8(x):
    return (x + 7) // 8 * 8


def _rl_encode_kernel(fc_ref, magic_ref, src_ref, out_ref, tail_ref,
                      sect_ref, scr_ref, *, t4_count, hcap_p, tlog,
                      scalar_rowpre=False):
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

    n_sym_chunks = fc_ref.shape[1]

    def step(x, cursor, tile, t, word, p):
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
        f = e & 0xFFF
        cu = _srl(e, 12) & 0xFFF

        flag = _uge(x, _sll(f, thresh_shift))
        emit = x & 0xFFFF
        x = jnp.where(flag, _srl(x, 16), x)
        q, r = div(x, f, m)
        x = _sll(q, tlog) + cu + r

        # rank pieces: within-row inclusive prefix + exclusive row prefix
        aug = jax.lax.dot_general(
            flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        within = aug[:, :128].astype(jnp.int32)          # [8,128]
        rowtot = aug[:, 128:129]                          # [8,1] f32
        rowpre = jax.lax.dot_general(
            tril8, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [8,1] exclusive
        scr_ref[0:1, 0:1] = (rowpre[7:8] + rowtot[7:8]).astype(jnp.int32)
        rowtot_b = jnp.broadcast_to(rowtot, shape).astype(jnp.int32)
        total = scr_ref[0, 0]
        tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)

        # sublane-broadcast tiles of the 8 row-prefix values
        if scalar_rowpre:
            scr_ref[0:8, 1:2] = rowpre.astype(jnp.int32)
            rp_t = [jnp.full(shape, scr_ref[h, 1], jnp.int32)
                    for h in range(8)]
        else:
            rowpre_b = jnp.broadcast_to(rowpre.astype(jnp.int32), shape)
            rp_t = [jnp.broadcast_to(rowpre_b[h : h + 1, :], shape)
                    for h in range(8)]

        base_w = jnp.clip(_srl(cursor, 8), 0, hcap_p - 8)
        posw = base_w * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        want0 = cursor + total - 2 * posw
        want1 = want0 - 1

        def search(want):
            # level 1: row = #{h : rowpre_h < want} - 1  (monotone rowpre)
            rr = jnp.zeros(shape, jnp.int32)
            for h in range(1, 8):
                rr = rr + (want > rp_t[h]).astype(jnp.int32)
            # pre-gather row rr's within-row ranks, row prefix, emits
            wrow = jnp.zeros(shape, jnp.int32)
            erow = jnp.zeros(shape, jnp.int32)
            rp_s = jnp.zeros(shape, jnp.int32)
            for h in range(8):
                hit = rr == h
                wrow = jnp.where(
                    hit, jnp.broadcast_to(within[h : h + 1, :], shape), wrow)
                erow = jnp.where(
                    hit, jnp.broadcast_to(emit[h : h + 1, :], shape), erow)
                if h:
                    rp_s = jnp.where(hit, rp_t[h], rp_s)
            wantr = want - rp_s
            # level 2: 7-iteration lane-local binary search
            lo = jnp.zeros(shape, jnp.int32)
            hi_b = jnp.full(shape, 127, jnp.int32)
            for _ in range(7):
                mid = _srl(lo + hi_b, 1)
                rv = jnp.take_along_axis(wrow, mid, axis=1)
                ge = rv >= wantr
                hi_b = jnp.where(ge, mid, hi_b)
                lo = jnp.where(ge, lo, mid + 1)
            return jnp.take_along_axis(erow, hi_b, axis=1)

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
        t4 = t4_count - 1 - i
        tile = jnp.where((t4 % tiles_span) == tiles_span - 1,
                         jnp.zeros(shape, jnp.int32), tile)
        word = src_ref[pl.ds(t4 * 8, 8), :]
        x, cursor, tile = step(x, cursor, tile, 4 * t4 + 3, word, 3)
        x, cursor, tile = step(x, cursor, tile, 4 * t4 + 2, word, 2)
        x, cursor, tile = step(x, cursor, tile, 4 * t4 + 1, word, 1)
        x, cursor, tile = step(x, cursor, tile, 4 * t4, word, 0)
        sect_ref[pl.ds((t4 // tiles_span) * 8, 8), :] = tile
        return x, cursor, tile

    x0 = jnp.full(shape, RANS_L, jnp.int32)
    x, cursor, _ = jax.lax.fori_loop(
        0, t4_count, body,
        (x0, jnp.int32(0), jnp.zeros(shape, jnp.int32)))
    tail_ref[0:8, :] = x
    tail_ref[8:16, :] = jnp.full(shape, cursor, jnp.int32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def rl_encode(fc_tables, magic_tables, src_words, t4_count, hrows_cap,
              tlog, scalar_rowpre=False, interpret=False):
    G = fc_tables.shape[0]
    nch = fc_tables.shape[1]
    tiles_span = 32
    hcap_p = stream_word_rows(hrows_cap)
    sect_rows = ((t4_count + tiles_span - 1) // tiles_span) * 8
    kern = functools.partial(_rl_encode_kernel, t4_count=t4_count,
                             hcap_p=hcap_p, tlog=tlog,
                             scalar_rowpre=scalar_rowpre)
    out, tail, sect = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, nch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hcap_p, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sect_rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * hcap_p, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * 16, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * sect_rows, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        interpret=interpret,
    )(fc_tables, magic_tables, src_words.reshape(G * t4_count * 8, 128))
    stream = out.reshape(G, hcap_p, 128)
    tail = tail.reshape(G, 16, 128)
    T = t4_count * 4
    stots = (sect.reshape(G, sect_rows // 8, 8, 128)
             .transpose(0, 1, 3, 2)
             .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])
    return stream, tail[:, 0:8, :], tail[:, 8, 0], stots


def build_inputs(G, proba=80, tlog=RANS_SPEED_TABLELOG):
    data = generate_proba(proba)[: 1 << 20]
    src = np.frombuffer(data, np.uint8)
    n = len(src)
    count, max_sv, _mc = hist_count(src, 255)
    norm, tlog = fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv)
    fc, mg = pack_rans_ctables(norm)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _round8((n_pad + 127) // 128 + 16)
    pad = np.full(n_pad, int(np.argmax(count)), np.uint8)
    pad[:n] = src
    srcw = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)
    args = (np.broadcast_to(fc, (G, 2, 128)).copy(),
            np.broadcast_to(mg, (G, 2, 128)).copy(),
            np.broadcast_to(srcw, (G, t4 * 8, 128)).copy())
    return [jnp.asarray(a) for a in args], t4, hcap, tlog


def run_variant(name, reps=6):
    nwayG_s, nwayG_b = 32, 128
    args_s, t4, hcap, tlog = build_inputs(nwayG_s)
    args_b = build_inputs(nwayG_b)[0]

    def call(args):
        if name == "base":
            return rans_encode2(*args, t4, hcap, False, False, tlog)
        return rl_encode(*args, t4, hcap, tlog, name == "rls")

    # correctness: byte-identical stream + identical stots/csize vs shipped
    sb, fb, cb, tb = rans_encode2(*args_s, t4, hcap, False, False, tlog)
    s, f, c, t = call(args_s)
    if name != "base":
        assert int(c[0]) == int(cb[0]), (int(c[0]), int(cb[0]))
        cs = int(cb[0])
        w = np.ascontiguousarray(np.asarray(s)[0]).tobytes()[: 2 * cs]
        wb = np.ascontiguousarray(np.asarray(sb)[0]).tobytes()[: 2 * cs]
        assert w == wb, "stream bytes diverge"
        assert np.array_equal(np.asarray(f), np.asarray(fb))
        assert np.array_equal(np.asarray(t), np.asarray(tb))
        print(f"{name}: wire byte-identical to shipped encode2")

    def timeit(args):
        call(args)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(call(args)[2])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s = timeit(args_s)
    t_b = timeit(args_b)
    gbs = (nwayG_b - nwayG_s) * (1 << 20) / (t_b - t_s) / 1e9
    print(f"{name}: {gbs:.3f} GB/s  (t_small {t_s*1e3:.1f} ms, "
          f"t_big {t_b*1e3:.1f} ms)")
    return gbs


if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "rl"]
    print("devices:", jax.devices())
    for nm in names:
        try:
            run_variant(nm)
        except Exception as ex:
            print(f"{nm}: FAILED: {type(ex).__name__}: {str(ex)[:300]}")
