"""Probe: software-pipelined fused encode (same wire, restructured kernel).

The shipped fused encoder's serial stall is the same-step scratch
round-trip that scalarizes the per-step total (write vector -> read scalar
immediately, ~140 ns dead time per step).  Pipelined variant:

* the pull passes need only CURSOR as a scalar — `want` uses the total as
  a broadcast VECTOR (want = cursor + total_vec - pos), so the total never
  becomes a scalar at all;
* the next step's cursor is written to a rotating scratch slot right after
  the prefix matmuls, BEFORE this step's pull passes issue (~230 ns of
  slack before the next step reads it), hiding the round trip.

Usage: python tools/probe_encode_pipe.py [group_kib]
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
from finitestateentropy_tpu.turbo.rans_kernels import (_chunk_gather,
                                                       _make_tria, _make_tril8,
                                                       _mulhi32, _uge,
                                                       pack_rans_ctables)
from finitestateentropy_tpu.utils import generate_proba

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left
TURBO_LANES = 1024


def _round8(x):
    return (x + 7) // 8 * 8


def _hrows_cap(n_pad):
    return _round8((n_pad + 127) // 128 + 16)


def _enc_pipe_kernel(fc_ref, magic_ref, src_ref, out_ref, scr_ref,
                     *, t4_count, hrows_cap, tlog, steptots=True):
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

    def step(x, tile, t, word, p, k):
        """k = global step counter (ascending), selects scratch parity."""
        sym = _srl(word, 8 * p) & 0xFF
        shi = _srl(sym, 7)
        slo = sym & 127
        e = jnp.zeros(shape, jnp.int32)
        m = jnp.zeros(shape, jnp.int32)
        for h in range(2):
            frow = jnp.broadcast_to(fc_ref[0, h: h + 1, :], shape)
            mrow = jnp.broadcast_to(magic_ref[0, h: h + 1, :], shape)
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

        # prefix: 2 matmuls, totals stay vectors
        aug = jax.lax.dot_general(
            flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        within = aug[:, :128]
        rowtot = aug[:, 128:129]
        rowpre = jax.lax.dot_general(
            tril8, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rank = (within + rowpre).astype(jnp.int32)
        # total in ALL rows via ones-matmul ([1,1]->(8,128) broadcasts are
        # unsupported; an [8,1] column lane-broadcasts fine)
        ones8 = jnp.ones((8, 8), jnp.bfloat16)
        total_c = jax.lax.dot_general(
            ones8, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)  # [8,1]
        total_v = total_c[0:1, 0:1]

        if steptots:
            rowtot_b = jnp.broadcast_to(rowtot, shape).astype(jnp.int32)
            tile = jnp.where(lanes8 == (t & 127), rowtot_b, tile)

        # cursor scalar written one step ago (slack = that step's pulls)
        cursor = scr_ref[k & 1, 0]
        # write NEXT step's cursor before this step's pulls issue
        scr_ref[pl.ds((k + 1) & 1, 1), 0:1] = cursor + total_v
        total_b = jnp.broadcast_to(total_c, shape)

        def pull_pass(base_row):
            pos = base_row * 128 \
                + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            want = cursor + total_b - pos
            valid = (want >= 1) & (want <= total_b) & (pos >= cursor)
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
        return x, tile

    def body(i, carry):
        x, tile = carry
        t4 = t4_count - 1 - i
        tile = jnp.where((t4 % tiles_span) == tiles_span - 1,
                         jnp.zeros(shape, jnp.int32), tile)
        word = src_ref[pl.ds(t4 * 8, 8), :]
        x, tile = step(x, tile, 4 * t4 + 3, word, 3, 4 * i)
        x, tile = step(x, tile, 4 * t4 + 2, word, 2, 4 * i + 1)
        x, tile = step(x, tile, 4 * t4 + 1, word, 1, 4 * i + 2)
        x, tile = step(x, tile, 4 * t4, word, 0, 4 * i + 3)
        if steptots:
            out_ref[pl.ds(hrows_cap + 16 + (t4 // tiles_span) * 8, 8), :] = tile
        return x, tile

    scr_ref[0:2, 0:1] = jnp.zeros((2, 1), jnp.int32)
    x0 = jnp.full(shape, RANS_L, jnp.int32)
    x, _ = jax.lax.fori_loop(
        0, t4_count, body, (x0, jnp.zeros(shape, jnp.int32)))
    out_ref[pl.ds(hrows_cap, 8), :] = x
    # final cursor = csize: after t4_count*4 steps, slot (4*t4_count)&1 = 0
    out_ref[pl.ds(hrows_cap + 8, 8), :] = jnp.full(shape, scr_ref[0, 0],
                                                   jnp.int32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def enc_pipe(fc, mg, srcw, t4_count, hrows_cap, steptots=True):
    G = fc.shape[0]
    spc = 4
    T = t4_count * spc
    sect_rows = (((t4_count + 31) // 32) * 8 if steptots else 0)
    rows = hrows_cap + 16 + sect_rows
    kern = functools.partial(_enc_pipe_kernel, t4_count=t4_count,
                             hrows_cap=hrows_cap, tlog=RANS_TABLELOG,
                             steptots=steptots)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4_count * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )(fc, mg, srcw.reshape(G * t4_count * 8, 128))
    out = out.reshape(G, rows, 128)
    if steptots:
        sect = out[:, hrows_cap + 16:, :]
        stots = (sect.reshape(G, sect_rows // 8, 8, 128)
                 .transpose(0, 1, 3, 2)
                 .reshape(G, (sect_rows // 8) * 128, 8)[:, :T, :])
    else:
        stots = None
    return (out[:, :hrows_cap, :], out[:, hrows_cap: hrows_cap + 8, :],
            out[:, hrows_cap + 8, 0], stots)


def main():
    gkib = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    gsz = gkib << 10
    data = generate_proba(80)[:gsz]
    if len(data) < gsz:
        data = (data * (gsz // len(data) + 1))[:gsz]

    blob = rans_compress(bytes(data), steptots=True)
    (n, csize_hw, tlog, flags, norm, max_sv, init, payload,
     stots_ref), _ = parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _hrows_cap(n_pad)

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

    stream, fin, csize, stots = enc_pipe(*args_s, t4, hcap)
    cs = int(np.asarray(csize)[0])
    print(f"csize: got {cs} ref {csize_hw}")
    assert cs == csize_hw
    got = np.asarray(stream)[0].reshape(-1)[:cs].astype(np.uint16)
    ref_hw = np.frombuffer(payload, "<u2")
    assert np.array_equal(got, ref_hw), \
        f"stream mismatch at {np.nonzero(got != ref_hw)[0][:8]}"
    assert np.array_equal(np.asarray(stots)[0].astype(np.uint8), stots_ref)
    assert np.asarray(fin)[0].reshape(-1).view(np.uint32).astype("<u4").tobytes() \
        == init.astype("<u4").tobytes()
    print("byte-exact vs twin OK")

    def timeit(args, G):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o, f, c, s = enc_pipe(*args, t4, hcap)
            np.asarray(c)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s = timeit(args_s, G_small)
    t_b = timeit(args_b, G_big)
    gbs = (G_big - G_small) * gsz / (t_b - t_s) / 1e9
    print(f"pipelined fused encode ({gkib} KiB groups): {gbs:.2f} GB/s  "
          f"(t_small {t_s*1e3:.1f} ms, t_big {t_b*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
