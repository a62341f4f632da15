"""Probe: 2 independent groups interleaved per kernel instance on the v2 path.

v2 removed the scratch round-trips (rank = one matmul, cursor = VMEM scalar
read of precomputed data), so two independent chains may now overlap.
"""
import functools
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.rans_kernels import (
    RANS_L, RANS_TABLELOG, _make_tria, _srl, _sll)
NWAY = 4

TLOG = RANS_TABLELOG
TSIZE = 1 << TLOG


def dual_v2_kernel(table_ref, init_ref, stream_ref, roff_ref, cur_ref,
                   out_ref, *, t4_count, hrows):
    shape = (8, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tria128 = (c_i >= r_i).astype(jnp.bfloat16)
    rhs = jnp.concatenate(
        [tria128, jnp.full((128, 128), 16, jnp.bfloat16),
         jnp.ones((128, 128), jnp.bfloat16)], axis=0)
    rows_per = t4_count * 8 + 8
    roff_rows = roff_ref.shape[0] // NWAY
    cur_rows = cur_ref.shape[0] // NWAY

    def step(x, t, gg):
        slot = x & (TSIZE - 1)
        thi = _srl(slot, 7)
        tlo = slot & 127
        e = jnp.zeros(shape, jnp.int32)
        for h in range(16):
            trow = jnp.broadcast_to(table_ref[gg, h:h+1, :], shape)
            e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        c = _srl(e, 20)
        x = f * _srl(x, TLOG) + slot - c
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
        cursor = cur_ref[gg * cur_rows + t, 0]
        pos = cursor - rank
        base_row = jnp.clip(_srl(jnp.maximum(cursor - 1024, 0), 7), 0, hrows - 16) \
            + gg * hrows
        rel = jnp.clip(pos - (base_row - gg * hrows) * 128, 0, 2047)
        hi = _srl(rel, 7)
        lo = rel & 127
        v = jnp.zeros(shape, jnp.int32)
        for h in range(9):
            row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
            v = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v)
        return sym, jnp.where(flag, _sll(x, 16) | v, x)

    def body(t4, xs):
        syms = [[] for _ in range(NWAY)]
        xs = list(xs)
        for p in range(4):
            for gg in range(NWAY):
                sg, xs[gg] = step(xs[gg], 4 * t4 + p, gg)
                syms[gg].append(sg)
        for gg in range(NWAY):
            sa = syms[gg]
            out_ref[pl.ds(gg * rows_per + t4 * 8, 8), :] = (
                sa[0] | _sll(sa[1], 8) | _sll(sa[2], 16) | _sll(sa[3], 24))
        return tuple(xs)

    xs = jax.lax.fori_loop(0, t4_count, body,
                           tuple(init_ref[g] for g in range(NWAY)))
    for gg in range(NWAY):
        out_ref[pl.ds(gg * rows_per + t4_count * 8, 8), :] = xs[gg] ^ RANS_L


@functools.partial(jax.jit, static_argnums=(5, 6))
def dual_decode_v2(csize_hw, tables, init_states, streams, steptots,
                   t4_count, hrows):
    G2 = tables.shape[0]
    G = G2 // NWAY
    T = steptots.shape[1]
    rows_per = t4_count * 8 + 8

    totals = jnp.sum(steptots, axis=2)
    cursors = csize_hw[:, None] - (jnp.cumsum(totals, axis=1) - totals)
    rowoff = jnp.cumsum(steptots, axis=2) - steptots
    tpad = ((T + 127) // 128) * 128
    ro = jnp.pad(rowoff, ((0, 0), (0, tpad - T), (0, 0)))
    roff = (ro.reshape(G2, tpad // 128, 128, 8).transpose(0, 1, 3, 2)
            .reshape(G2, (tpad // 128) * 8, 128)).astype(jnp.int32)
    cpad = ((T + 7) // 8) * 8
    curs = jnp.zeros((G2, cpad, 128), jnp.int32).at[:, :T, 0].set(
        cursors.astype(jnp.int32))
    r8 = roff.shape[1]
    rc = curs.shape[1]

    kern = functools.partial(dual_v2_kernel, t4_count=t4_count, hrows=hrows)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((NWAY, 16, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NWAY, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NWAY * hrows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NWAY * r8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NWAY * rc, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NWAY * rows_per, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * NWAY * rows_per, 128), jnp.int32),
    )(tables, init_states, streams.reshape(G2 * hrows, 128),
      roff.reshape(G2 * r8, 128), curs.reshape(G2 * rc, 128))
    out = out.reshape(G2, rows_per, 128)
    err = jnp.abs(out[:, t4_count * 8:, :]).max(axis=(1, 2))
    return out[:, : t4_count * 8, :], err


from bench import _prep, _time
from finitestateentropy_tpu.turbo.rans_kernels import rans_encode

p = _prep(1 << 20, 80)
fc, mg = p["fc_mg"]
t4, hcap = p["t4"], p["hcap"]
a = (jnp.asarray(np.broadcast_to(fc, (8, 2, 128)).copy()),
     jnp.asarray(np.broadcast_to(mg, (8, 2, 128)).copy()),
     jnp.asarray(np.broadcast_to(p["srcw"], (8, t4 * 8, 128)).copy()))
stream, fin, csize, stots = rans_encode(*a, t4, hcap)
cs = int(np.asarray(csize)[0])
hw = np.asarray(stream)[0].reshape(-1)[:cs]
fin0 = np.asarray(fin)[0]
st0 = np.asarray(stots)[0]
hrows = p["round8"]((cs + 127) // 128 + 16)

times = {}
for G2 in (16, 48, 96, 160):
    hws = np.zeros((G2, hrows, 128), np.int32)
    hws.reshape(G2, -1)[:, :cs] = hw
    args = (jnp.asarray(np.full(G2, cs, np.int32)),
            jnp.asarray(np.broadcast_to(p["dtbl"], (G2, 16, 128)).copy()),
            jnp.asarray(np.broadcast_to(fin0.reshape(8, 128), (G2, 8, 128)).copy()),
            jnp.asarray(hws),
            jnp.asarray(np.broadcast_to(st0, (G2,) + st0.shape).copy()))
    out, err = dual_decode_v2(*args, t4, hrows)
    if G2 == 16:
        e = np.asarray(err)
        assert not e.any(), e[:4]
        ob = np.asarray(out)[1].astype("<i4").tobytes()[: 1 << 20]
        print("dual-v2 correct:", ob == p["data"])
    times[G2] = _time(lambda a2=args: dual_decode_v2(*a2, t4, hrows)[1],
                      lambda x: np.asarray(x))
    print(f"G2={G2}: {times[G2]*1e3:.1f} ms")
ks = sorted(times)
for i in range(len(ks) - 1):
    x, y = ks[i], ks[i + 1]
    print(f"slope {x}->{y}: {(y-x)*1.048576/((times[y]-times[x])*1e3):.2f} GB/s")
