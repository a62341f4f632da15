"""Probe: HBM-windowed decode — break the nway <-> group-size coupling.

The v2/v3c kernels hold each group's ENTIRE packed stream in VMEM, so the
interleave width collapses as groups grow (2-4 MiB) or streams approach raw
size (proba02).  Stream consumption is monotone (the LIFO cursor only
decreases), and the per-chunk cursor endpoints are known in XLA ahead of the
launch, so fixed-size stream windows can be DMA'd HBM->VMEM per time-chunk
with precomputed start rows — double-buffered, no in-loop conditionals:

  * grid (G//nway, n_chunks); chunk c covers t4 in [c*S, (c+1)*S)
  * window W = 16*S + 16 word rows >= worst-case chunk consumption
    (<= 1024 renorms/step = 4 rows/step = 16 rows/t4) + gather slack
  * ws[g, c] = clip((cursor_after_chunk - 1024) >> 8, 0, srows - W)
    computed in XLA from the FLAG_STEPTOTS totals (scalar-prefetched)
  * out / cursors / roffs are chunk-blocked (auto-pipelined by Pallas);
    states carry across chunks in scratch (persists across grid steps)

Usage: python tools/probe_decode_w.py [variant ...]
  variants like w7s32, w8s64, w7s64g4 (nway 7, S=64, 4 MiB groups),
  w7s32p02 (proba02 corpus), base7 (shipped v2 for comparison)
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
from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_dtable,
                                                       rans_decode_v2,
                                                       stream_word_rows)
from finitestateentropy_tpu.utils import generate_proba

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left


def _round8(x):
    return (x + 7) // 8 * 8


def _vw_kernel(ws_ref, table_ref, init_ref, stream_hbm, roff_ref, cur_ref,
               out_ref, res_ref, xs_ref, win_ref, sem,
               *, S, n_chunks, W, srows, nway, tlog):
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)
    spc = 4
    g = pl.program_id(0)
    c = pl.program_id(1)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)
    tiles_per_chunk = S // 32          # 8-row roff tiles per chunk

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
        e = jnp.zeros(shape, jnp.int32)
        for h in range(tchunks):
            trow = jnp.broadcast_to(table_ref[gg, h: h + 1, :], shape)
            e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        cum = _srl(e, 20)
        x = f * _srl(x, tlog) + slot_v - cum
        flag = _srl(x, 16) == 0
        # roff tile local to this chunk's block
        ltile = _srl(t, 7) - c * tiles_per_chunk
        rtile = roff_ref[gg, pl.ds(ltile * 8, 8), :]
        hit = lanes == (t & 127)
        m_hi = jnp.where(hit, _srl(rtile, 4), 0).astype(jnp.bfloat16)
        m_lo = jnp.where(hit, rtile & 15, 0).astype(jnp.bfloat16)
        lhs = jnp.concatenate(
            [flag.astype(jnp.int32).astype(jnp.bfloat16), m_hi, m_lo], axis=1)
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
            tile = sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24)
            out_ref[gg, pl.ds(i * 8, 8), :] = tile
        return tuple(xs)

    xs0 = tuple(xs_ref[pl.ds(gg * 8, 8), :] for gg in range(nway))
    xs = jax.lax.fori_loop(0, S, body, xs0)
    for gg in range(nway):
        xs_ref[pl.ds(gg * 8, 8), :] = xs[gg]
        res_ref[gg] = xs[gg] ^ RANS_L     # last chunk's write is kept


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def rans_decode_w(csize_hw, tables, init_states, streams, steptots,
                  t4_count, hrows, nway, tlog, S, interpret=False):
    G0 = tables.shape[0]
    T = steptots.shape[1]
    tch = tables.shape[1]
    assert t4_count % S == 0 and S % 32 == 0
    n_chunks = t4_count // S
    W = 16 * S + 16
    srows = stream_word_rows(hrows)
    assert streams.shape[1] == srows and srows >= W, (srows, W)

    pad = (-G0) % nway
    if pad:
        dup = lambda a: jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        csize_hw, tables, init_states, streams, steptots = map(
            dup, (csize_hw, tables, init_states, streams, steptots))
    G = tables.shape[0]

    totals = jnp.sum(steptots, axis=2)                            # [G,T]
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    cur_after = cursors - totals
    bad = cur_after[:, -1] != 0

    # per-chunk window start rows (word rows), from the chunk-END cursor
    te = (jnp.arange(n_chunks) + 1) * 4 * S - 1
    cur_end = cur_after[:, te]                                    # [G,nc]
    ws = jnp.clip(_srl(jnp.maximum(cur_end - 1024, 0), 8),
                  0, srows - W).astype(jnp.int32)

    rowoff = jnp.cumsum(steptots, axis=2) - steptots
    tpad = ((T + 127) // 128) * 128
    ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))
    roff = (ro.reshape(G, tpad // 128, 128, 8)
            .transpose(0, 1, 3, 2)
            .reshape(G, (tpad // 128) * 8, 128)).astype(jnp.int32)
    # pad roff rows to n_chunks * (S//4)
    r8c = S // 4
    r8pad = n_chunks * r8c
    roff = jnp.pad(roff, ((0, 0), (0, r8pad - roff.shape[1]), (0, 0)))

    curs = jnp.zeros((G, t4_count, 128), jnp.int32).at[:, :, :4].set(
        cursors.reshape(G, t4_count, 4).astype(jnp.int32))

    kern = functools.partial(_vw_kernel, S=S, n_chunks=n_chunks, W=W,
                             srows=srows, nway=nway, tlog=tlog)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // nway, n_chunks),
        in_specs=[
            pl.BlockSpec((nway, tch, 128), lambda g, c, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nway, 8, 128), lambda g, c, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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


def build_inputs(G, mib=1, proba=80):
    nbytes = int(mib * (1 << 20))
    data = generate_proba(proba)
    while len(data) < nbytes:
        data = data + data
    data = data[:nbytes]
    blob = rans_compress(bytes(data), steptots=True)
    (n, csize_hw, tlog, flags, norm, max_sv, init, payload,
     stots), _ = parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hrows = _round8((csize_hw + 127) // 128 + 16)
    tbl = pack_rans_dtable(norm, tlog)
    T = n_pad // 1024
    srows = stream_word_rows(hrows)
    hw = np.frombuffer(payload, "<u2").astype(np.uint32)
    pk = np.zeros(srows * 128, np.uint32)
    full = len(hw) // 2
    pk[:full] = hw[0 : 2 * full : 2] | (hw[1 : 2 * full + 1 : 2] << 16)
    if len(hw) & 1:
        pk[full] = hw[-1]
    args = (np.full(G, csize_hw, np.int32),
            np.broadcast_to(tbl, (G,) + tbl.shape).copy(),
            np.broadcast_to(init.view(np.int32).reshape(8, 128),
                            (G, 8, 128)).copy(),
            np.broadcast_to(pk.view(np.int32).reshape(srows, 128),
                            (G, srows, 128)).copy(),
            np.broadcast_to(stots.astype(np.int32), (G, T, 8)).copy())
    return [jnp.asarray(a) for a in args], t4, hrows, data, n, tlog


def run_variant(name, nway, S, mib=1, proba=80, reps=6):
    base_groups = max(1, int(32 // mib))
    G_small = ((base_groups + nway - 1) // nway) * nway
    G_big = ((4 * base_groups + nway - 1) // nway) * nway
    args_s, t4, hrows, data, n, tlog = build_inputs(G_small, mib, proba)
    args_b = build_inputs(G_big, mib, proba)[0]

    def call(args):
        if S == 0:   # shipped v2 baseline
            return rans_decode_v2(*args, t4, hrows, False, tlog)
        return rans_decode_w(*args, t4, hrows, nway, tlog, S)

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
    gbs = (G_big - G_small) * int(mib * (1 << 20)) / (t_b - t_s) / 1e9
    print(f"{name}: nway={nway} S={S} {mib}MiB p{proba:02d}  "
          f"{gbs:.2f} GB/s  (t_small {t_s*1e3:.1f} ms, t_big {t_b*1e3:.1f} ms)")
    return gbs


VARIANTS = {
    "base7": (7, 0, 1, 80),
    "base1g4": (1, 0, 4, 80),     # v2 picks nway itself; label only
    "base1p02": (1, 0, 1, 2),
    "w7s32": (7, 32, 1, 80),
    "w7s64": (7, 64, 1, 80),
    "w8s32": (8, 32, 1, 80),
    "w10s32": (10, 32, 1, 80),
    "w7s64g2": (7, 64, 2, 80),
    "w7s64g4": (7, 64, 4, 80),
    "w8s64g4": (8, 64, 4, 80),
    "w7s32p02": (7, 32, 1, 2),
    "w8s32p02": (8, 32, 1, 2),
    "w10s32p02": (10, 32, 1, 2),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["w7s32"]
    print("devices:", jax.devices())
    for nm in names:
        nway, S, mib, proba = VARIANTS[nm]
        try:
            run_variant(nm, nway, S, mib, proba)
        except Exception as ex:
            print(f"{nm}: FAILED: {type(ex).__name__}: {str(ex)[:300]}")
