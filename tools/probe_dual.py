"""Probe: 2 independent groups interleaved in one decode kernel instance.

If the step cost is latency-bound, two independent chains should overlap and
per-byte cost should drop well below 2x-groups-sequential.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group, _round8
from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import RANS_L, RANS_TABLELOG
from finitestateentropy_tpu.turbo.rans_kernels import (
    TCHUNKS, TSIZE, _flat_prefix, _make_tria, _srl, _sll,
    pack_rans_ctables, pack_rans_dtable, rans_decode, rans_encode)
from finitestateentropy_tpu.utils import generate_proba

GROUP = 1 << 20

base = generate_proba(80)
data = (base * ((GROUP // len(base)) + 1))[:GROUP]
src = np.frombuffer(data, np.uint8)
norm, max_sv, ncount, mfs = _prep_group(src)
n_pad = _pad_n(GROUP)
t4 = n_pad // TURBO_STEP_SYMS
hcap = _hrows_cap(n_pad)
fc, mg = pack_rans_ctables(norm)
pad = np.full(n_pad, mfs, np.uint8); pad[:GROUP] = src
srcw1 = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)

# produce a stream once
stream, fin, csize, _st = rans_encode(jnp.asarray(fc[None]), jnp.asarray(mg[None]),
                                 jnp.asarray(srcw1[None]), t4, hcap)
cs = int(np.asarray(csize)[0])
hw = np.asarray(stream)[0].reshape(-1)[:cs]
fin0 = np.asarray(fin)[0]
hrows = _round8((cs + 127) // 128 + 16)
dtbl = pack_rans_dtable(norm)


def dual_decode_kernel(csize_ref, table_ref, init_ref, stream_ref, out_ref,
                       scr_ref, scr2_ref, *, t4_count, hrows):
    shape = (8, 128)
    tria = _make_tria()

    def step(x, cursor, toff, soff, scr):
        slot = x & (TSIZE - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        e = jnp.zeros(shape, jnp.int32)
        for h in range(TCHUNKS):
            trow = jnp.broadcast_to(table_ref[toff, h:h+1, :], shape)
            e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        c = _srl(e, 20)
        x = f * _srl(x, RANS_TABLELOG) + slot - c
        flag = _srl(x, 16) == 0
        rank, total = _flat_prefix(flag.astype(jnp.int32), tria, scr, shape)
        pos = cursor - rank
        base_row = jnp.clip(_srl(jnp.maximum(cursor - 1024, 0), 7), 0, hrows - 16) + soff
        rel = jnp.clip(pos - (base_row - soff) * 128, 0, 2047)
        hi = _srl(rel, 7)
        lo = rel & 127
        v = jnp.zeros(shape, jnp.int32)
        for h in range(9):
            row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
            v = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v)
        x = jnp.where(flag, _sll(x, 16) | v, x)
        return sym, x, cursor - total

    rows_per = t4_count * 8 + 16

    def body(t4i, carry):
        xa, ca, xb, cb = carry
        syms_a, syms_b = [], []
        for p in range(4):
            sa, xa, ca = step(xa, ca, 0, 0, scr_ref)
            sb, xb, cb = step(xb, cb, 1, hrows, scr2_ref)
            syms_a.append(sa)
            syms_b.append(sb)
        ta = syms_a[0] | _sll(syms_a[1], 8) | _sll(syms_a[2], 16) | _sll(syms_a[3], 24)
        tb = syms_b[0] | _sll(syms_b[1], 8) | _sll(syms_b[2], 16) | _sll(syms_b[3], 24)
        out_ref[pl.ds(t4i * 8, 8), :] = ta
        out_ref[pl.ds(rows_per + t4i * 8, 8), :] = tb
        return xa, ca, xb, cb

    g = pl.program_id(0)
    xa = init_ref[0]
    xb = init_ref[1]
    c0 = csize_ref[2 * g]
    c1 = csize_ref[2 * g + 1]
    xa, ca, xb, cb = jax.lax.fori_loop(0, t4_count, body, (xa, c0, xb, c1))
    out_ref[pl.ds(t4_count * 8, 8), :] = xa ^ RANS_L
    out_ref[pl.ds(t4_count * 8 + 8, 8), :] = jnp.full(shape, ca, jnp.int32)
    out_ref[pl.ds(rows_per + t4_count * 8, 8), :] = xb ^ RANS_L
    out_ref[pl.ds(rows_per + t4_count * 8 + 8, 8), :] = jnp.full(shape, cb, jnp.int32)


def dual_decode(csize_hw, tables, init_states, streams, t4_count, hrows):
    G2 = tables.shape[0]  # total groups (must be even)
    G = G2 // 2
    rows_per = t4_count * 8 + 16
    import functools
    kern = functools.partial(dual_decode_kernel, t4_count=t4_count, hrows=hrows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, 16, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hrows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * rows_per, 128), lambda g, c: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * 2 * rows_per, 128), jnp.int32),
    )(csize_hw, tables, init_states, streams.reshape(G * 2 * hrows, 128))
    out = out.reshape(G2, rows_per, 128)
    err = jnp.abs(out[:, t4_count * 8:, :]).max(axis=(1, 2))
    return out[:, : t4_count * 8, :], err


def timeit(fn, iters=4):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


for G2 in (32, 160):
    tbl = jnp.asarray(np.broadcast_to(dtbl, (G2, 16, 128)).copy())
    init = jnp.asarray(np.broadcast_to(fin0, (G2, 8, 128)).copy())
    hws = np.zeros((G2, hrows, 128), np.int32)
    hws.reshape(G2, -1)[:, :cs] = hw
    hws = jnp.asarray(hws)
    csd = jnp.asarray(np.full(G2, cs, np.int32))

    outw, err = dual_decode(csd, tbl, init, hws, t4, hrows)
    e = np.asarray(err)
    if G2 == 32:
        assert not e.any(), e[:8]
        ob = np.asarray(outw)[1].astype("<i4").tobytes()[:GROUP]
        print("dual decode correct:", ob == data)
    t = timeit(lambda: np.asarray(dual_decode(csd, tbl, init, hws, t4, hrows)[1]))
    print(f"G2={G2}: {t*1e3:.1f} ms")
    globals()[f"t{G2}"] = t

print(f"dual-interleave decode: {(160-32)*GROUP/(t160-t32)/1e9:.3f} GB/s (single was ~2.6)")
