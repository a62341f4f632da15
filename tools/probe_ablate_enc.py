"""Ablate the rANS encode kernel components (slope-timed)."""
import functools
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.rans_kernels import (
    RANS_L, RANS_TABLELOG, _flag_prefix, _make_tria, _make_tril8, _mulhi32,
    _srl, _sll, _uge)

TLOG = RANS_TABLELOG


def make_dual_kernel(t4_count, hrows_cap):
    """2 groups interleaved; separate scratch slots; blocks carry 2 groups."""
    def kern(fc_ref, magic_ref, src_ref, out_ref, scr_ref, scr2_ref):
        shape = (8, 128)
        tria = _make_tria()
        tril8 = _make_tril8()
        lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        srows = src_ref.shape[0] // 2
        orows = out_ref.shape[0] // 2

        def step(x, cursor, word, p, gg, scr):
            sym = _srl(word, 8 * p) & 0xFF
            shi = _srl(sym, 7)
            slo = sym & 127
            e = jnp.zeros(shape, jnp.int32)
            m = jnp.zeros(shape, jnp.int32)
            for h in range(2):
                frow = jnp.broadcast_to(fc_ref[gg, h:h+1, :], shape)
                mrow = jnp.broadcast_to(magic_ref[gg, h:h+1, :], shape)
                hit = shi == h
                e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
                m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
            f = e & 0xFFF
            c = _srl(e, 12) & 0xFFF
            flag = _uge(x, _sll(f, 32 - TLOG))
            emit = x & 0xFFFF
            x = jnp.where(flag, _srl(x, 16), x)
            q = _mulhi32(x, m)
            r = x - q * f
            big = _uge(r, f)
            q = jnp.where(big, q + 1, q)
            r = jnp.where(big, r - f, r)
            big = _uge(r, f)
            q = jnp.where(big, q + 1, q)
            r = jnp.where(big, r - f, r)
            x = _sll(q, TLOG) + c + r
            rank, total, _rt = _flag_prefix(flag.astype(jnp.int32), tria,
                                            tril8, scr, shape)

            def pull_pass(base_row):
                pos = (base_row - gg * orows) * 128 \
                    + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 + lanes
                want = cursor + total - pos
                valid = (want >= 1) & (want <= total) & (pos >= cursor)
                lo = jnp.zeros(shape, jnp.int32)
                hi_b = jnp.full(shape, 1023, jnp.int32)
                for _ in range(10):
                    mid = _srl(lo + hi_b, 1)
                    rhi = _srl(mid, 7)
                    rlo = mid & 127
                    rv = jnp.zeros(shape, jnp.int32)
                    for h in range(8):
                        rrow = jnp.broadcast_to(rank[h:h+1, :], shape)
                        rv = jnp.where(rhi == h,
                                       jnp.take_along_axis(rrow, rlo, axis=1), rv)
                    ge = rv >= want
                    hi_b = jnp.where(ge, mid, hi_b)
                    lo = jnp.where(ge, lo, mid + 1)
                vhi = _srl(hi_b, 7)
                vlo = hi_b & 127
                val = jnp.zeros(shape, jnp.int32)
                for h in range(8):
                    erow = jnp.broadcast_to(emit[h:h+1, :], shape)
                    val = jnp.where(vhi == h,
                                    jnp.take_along_axis(erow, vlo, axis=1), val)
                old = out_ref[pl.ds(base_row, 8), :]
                out_ref[pl.ds(base_row, 8), :] = jnp.where(valid, val, old)

            base_row = jnp.clip(_srl(cursor, 7), 0, hrows_cap - 16) + gg * orows
            pull_pass(base_row)
            pull_pass(base_row + 8)
            return x, cursor + total

        def body(i, carry):
            xa, ca, xb, cb = carry
            t4 = t4_count - 1 - i
            wa = src_ref[pl.ds(t4 * 8, 8), :]
            wb = src_ref[pl.ds(srows + t4 * 8, 8), :]
            for p in (3, 2, 1, 0):
                xa, ca = step(xa, ca, wa, p, 0, scr_ref)
                xb, cb = step(xb, cb, wb, p, 1, scr2_ref)
            return xa, ca, xb, cb

        x0 = jnp.full(shape, RANS_L, jnp.int32)
        xa, ca, xb, cb = jax.lax.fori_loop(
            0, t4_count, body, (x0, jnp.int32(0), x0, jnp.int32(0)))
        out_ref[pl.ds(hrows_cap, 8), :] = xa
        out_ref[pl.ds(orows + hrows_cap, 8), :] = xb
    return kern


def run_dual(G2, t4, hcap):
    rows = hcap + 16
    kern = make_dual_kernel(t4, hcap)
    G = G2 // 2
    f = jax.jit(functools.partial(
        pl.pallas_call, kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * t4 * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G2 * rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)])())
    rng = np.random.default_rng(0)
    fc = jnp.asarray(rng.integers(0, 2**24, (G2, 2, 128)).astype(np.int32) | 1)
    mg = jnp.asarray(rng.integers(1, 2**31, (G2, 2, 128)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, 2**31, (G2 * t4 * 8, 128)).astype(np.int32))
    np.asarray(f(fc, mg, src)[:1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(fc, mg, src)[:1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_kernel(variant, t4_count, hrows_cap):
    def kern(fc_ref, magic_ref, src_ref, out_ref, scr_ref):
        shape = (8, 128)
        tria = _make_tria()
        tril8 = _make_tril8()
        lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        def step(x, cursor, word, p):
            sym = _srl(word, 8 * p) & 0xFF
            shi = _srl(sym, 7)
            slo = sym & 127
            e = jnp.zeros(shape, jnp.int32)
            m = jnp.zeros(shape, jnp.int32)
            for h in range(2):
                frow = jnp.broadcast_to(fc_ref[0, h:h+1, :], shape)
                mrow = jnp.broadcast_to(magic_ref[0, h:h+1, :], shape)
                hit = shi == h
                e = jnp.where(hit, jnp.take_along_axis(frow, slo, axis=1), e)
                m = jnp.where(hit, jnp.take_along_axis(mrow, slo, axis=1), m)
            f = e & 0xFFF
            c = _srl(e, 12) & 0xFFF
            flag = _uge(x, _sll(f, 32 - TLOG))
            emit = x & 0xFFFF
            x = jnp.where(flag, _srl(x, 16), x)
            if variant == "nodiv":
                q, r = _srl(x, 3), x & 7
            else:
                q = _mulhi32(x, m)
                r = x - q * f
                big = _uge(r, f)
                q = jnp.where(big, q + 1, q)
                r = jnp.where(big, r - f, r)
                big = _uge(r, f)
                q = jnp.where(big, q + 1, q)
                r = jnp.where(big, r - f, r)
            x = _sll(q, TLOG) + c + r

            if variant == "noprefix":
                rank, total = lanes + 1, scr_ref[0, 0] * 0 + 64
            else:
                rank, total, _rt = _flag_prefix(flag.astype(jnp.int32), tria,
                                                tril8, scr_ref, shape)

            if variant != "nopull":
                def pull_pass(base_row):
                    pos = base_row * 128 \
                        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128 \
                        + lanes
                    want = cursor + total - pos
                    valid = (want >= 1) & (want <= total) & (pos >= cursor)
                    lo = jnp.zeros(shape, jnp.int32)
                    hi_b = jnp.full(shape, 1023, jnp.int32)
                    for _ in range(10):
                        mid = _srl(lo + hi_b, 1)
                        rhi = _srl(mid, 7)
                        rlo = mid & 127
                        rv = jnp.zeros(shape, jnp.int32)
                        for h in range(8):
                            rrow = jnp.broadcast_to(rank[h:h+1, :], shape)
                            rv = jnp.where(rhi == h,
                                           jnp.take_along_axis(rrow, rlo, axis=1), rv)
                        ge = rv >= want
                        hi_b = jnp.where(ge, mid, hi_b)
                        lo = jnp.where(ge, lo, mid + 1)
                    vhi = _srl(hi_b, 7)
                    vlo = hi_b & 127
                    val = jnp.zeros(shape, jnp.int32)
                    for h in range(8):
                        erow = jnp.broadcast_to(emit[h:h+1, :], shape)
                        val = jnp.where(vhi == h,
                                        jnp.take_along_axis(erow, vlo, axis=1), val)
                    old = out_ref[pl.ds(base_row, 8), :]
                    out_ref[pl.ds(base_row, 8), :] = jnp.where(valid, val, old)

                base_row = jnp.clip(_srl(cursor, 7), 0, hrows_cap - 16)
                pull_pass(base_row)
                pull_pass(base_row + 8)
            return x, cursor + total

        def body(i, carry):
            x, cursor = carry
            t4 = t4_count - 1 - i
            word = src_ref[pl.ds(t4 * 8, 8), :]
            for p in (3, 2, 1, 0):
                x, cursor = step(x, cursor, word, p)
            return x, cursor

        x0 = jnp.full(shape, RANS_L, jnp.int32)
        x, cursor = jax.lax.fori_loop(0, t4_count, body, (x0, jnp.int32(0)))
        out_ref[pl.ds(hrows_cap, 8), :] = x
        out_ref[pl.ds(hrows_cap + 8, 8), :] = jnp.full(shape, cursor, jnp.int32)

    return kern


def run(variant, G, t4, hcap):
    rows = hcap + 16
    kern = make_kernel(variant, t4, hcap)
    f = jax.jit(functools.partial(
        pl.pallas_call, kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t4 * 8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)])())
    rng = np.random.default_rng(0)
    fc = jnp.asarray(rng.integers(0, 2**24, (G, 2, 128)).astype(np.int32) | 1)
    mg = jnp.asarray(rng.integers(1, 2**31, (G, 2, 128)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, 2**31, (G * t4 * 8, 128)).astype(np.int32))
    np.asarray(f(fc, mg, src)[:1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(fc, mg, src)[:1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


t4, hcap = 256, 2064
for variant in ("full",):
    t16 = run(variant, 16, t4, hcap)
    t96 = run(variant, 96, t4, hcap)
    per_step = (t96 - t16) / (80 * t4 * 4)
    print(f"{variant:9s}: {per_step*1e9:7.1f} ns/step")
t16 = run_dual(16, t4, hcap)
t96 = run_dual(96, t4, hcap)
per_step = (t96 - t16) / (80 * t4 * 4)
print(f"dual     : {per_step*1e9:7.1f} ns/step (per 1024 syms; 2 groups -> /2 per byte)")
print(f"dual effective: {per_step/2*1e9:7.1f} ns per 1024 bytes")
