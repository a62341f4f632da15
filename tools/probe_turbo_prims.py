"""Slope-timed probe of the primitives the turbo (lane-interleaved) kernels need.

Fixed per-call tunnel overhead (~28ms) is eliminated by timing two REP values
and using the slope.
"""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def slope(make_fn, reps=(256, 4096), iters=3):
    ts = []
    for rep in reps:
        f = make_fn(rep)
        np.asarray(f())  # compile
        best = min(
            (lambda t0: (np.asarray(f()), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(iters)
        )
        ts.append(best)
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def pcall(kernel, n_in, out_shape):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


# ---------------- P1: lane gather [8,128] and [32,128]
def p1(shape):
    t = jnp.asarray(rng.integers(0, 128, shape), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 128, shape), jnp.int32)

    def make(rep):
        def k(t_ref, ix_ref, o_ref):
            tv = t_ref[:]
            def body(i, x):
                return jnp.take_along_axis(tv, x & 127, axis=1) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, ix_ref[:])
        f = jax.jit(pcall(k, 2, jax.ShapeDtypeStruct(shape, jnp.int32)))
        return lambda: f(t, ix)

    s = slope(make)
    n = shape[0] * shape[1]
    print(f"P1 lane-gather {shape}: {s*1e9:8.1f} ns/step  {n/s/1e9:7.2f} G lookups/s")

p1((8, 128))
p1((32, 128))

# ---------------- P2: 2048-entry shared-table lookup via 16-chunk select
def p2(rows):
    SH = (rows, 128)
    tbl = jnp.asarray(rng.integers(0, 2**31, (16, 128)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 2048, SH), jnp.int32)

    def make(rep):
        def k(t_ref, ix_ref, o_ref):
            t = t_ref[:]
            def lookup(s):
                hi = s >> 7
                lo = s & 127
                acc = jnp.zeros_like(s)
                for h in range(16):
                    row = jnp.broadcast_to(t[h:h+1, :], SH)
                    v = jnp.take_along_axis(row, lo, axis=1)
                    acc = jnp.where(hi == h, v, acc)
                return acc
            def body(i, x):
                return lookup(x & 2047) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, ix_ref[:])
        f = jax.jit(pcall(k, 2, jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(tbl, ix)

    s = slope(make)
    n = SH[0] * SH[1]
    print(f"P2 16-chunk 2048-lookup {SH}: {s*1e9:8.1f} ns/step  {n/s/1e9:7.2f} G lookups/s")

p2(8)
p2(32)

# ---------------- P3: cumsum along lanes
def p3():
    SH = (8, 128)
    x = jnp.asarray(rng.integers(0, 12, SH), jnp.int32)

    def make(rep):
        def k(x_ref, o_ref):
            def body(i, v):
                c = jnp.cumsum(v, axis=1)
                return (c & 1023) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
        f = jax.jit(pcall(k, 1, jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(x)

    s = slope(make)
    print(f"P3 cumsum lanes [8,128]:   {s*1e9:8.1f} ns/step")

p3()

# P3b: full 1024-lane order cumsum (lanes within row, then row offsets)
def p3b():
    SH = (8, 128)
    x = jnp.asarray(rng.integers(0, 12, SH), jnp.int32)

    def make(rep):
        def k(x_ref, o_ref):
            def body(i, v):
                c = jnp.cumsum(v, axis=1)            # within-row inclusive
                rowtot = c[:, -1:]                    # [8,1]
                rowoff = jnp.cumsum(rowtot, axis=0) - rowtot
                full = c + rowoff                     # flat-order inclusive prefix
                return (full & 1023) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
        f = jax.jit(pcall(k, 1, jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(x)

    s = slope(make)
    print(f"P3b flat-order cumsum 1024:{s*1e9:8.1f} ns/step")

p3b()

# ---------------- P4: dynamic row-window read from [4096,128] VMEM
def p4():
    BIG = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
    x0 = jnp.zeros((8, 128), jnp.int32)

    def make(rep):
        def k(b_ref, x_ref, o_ref):
            def body(i, v):
                base = (v[0, 0] & 2047)
                win = b_ref[pl.ds(base, 8), :]
                return v + win
            o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
        f = jax.jit(pcall(k, 2, jax.ShapeDtypeStruct((8, 128), jnp.int32)))
        return lambda: f(BIG, x0)

    s = slope(make)
    print(f"P4 dyn row-window [8,128] from [4096,128]: {s*1e9:8.1f} ns/step")

p4()

# ---------------- P5: synthetic full decode step (lookup+cumsum+window gather+arith)
def p5(rows):
    SH = (rows, 128)
    tbl = jnp.asarray(rng.integers(0, 2**31, (16, 128)), jnp.int32)
    stream = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
    s0 = jnp.asarray(rng.integers(0, 2048, SH), jnp.int32)

    def make(rep):
        def k(t_ref, st_ref, s_ref, o_ref):
            t = t_ref[:]
            def lookup(s):
                hi = s >> 7
                lo = s & 127
                acc = jnp.zeros_like(s)
                for h in range(16):
                    row = jnp.broadcast_to(t[h:h+1, :], SH)
                    v = jnp.take_along_axis(row, lo, axis=1)
                    acc = jnp.where(hi == h, v, acc)
                return acc

            def body(i, carry):
                s, cur = carry
                e = lookup(s & 2047)
                nb = (e >> 8) & 15
                c = jnp.cumsum(nb, axis=1)
                rowtot = c[:, -1:]
                rowoff = jnp.cumsum(rowtot, axis=0) - rowtot
                off = cur - (c + rowoff)
                # window read: 3-chunk select over an [8,128]-viewed window
                base = (off[0, 0] >> 5) & 4087
                win = st_ref[pl.ds(base, 8), :]       # 1024 words window
                widx = (off >> 5) - base
                lo_w = jnp.zeros_like(s)
                for ch in range(3):
                    row = jnp.broadcast_to(win[ch:ch+1, :], SH)
                    v = jnp.take_along_axis(row, widx & 127, axis=1)
                    lo_w = jnp.where((widx >> 7) == ch, v, lo_w)
                sh = off & 31
                bits = (lo_w >> sh) & ((1 << nb) - 1)
                ns = ((e >> 16) & 2047) + bits
                return (ns, cur - rowtot[-1, 0] * 0 - 1), None

            (sf, _), _ = jax.lax.scan(body, (s_ref[:], jnp.int32(131072)), None, length=rep)
            o_ref[:] = sf
        f = jax.jit(pcall(k, 3, jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(tbl, stream, s0)

    s = slope(make)
    n = SH[0] * SH[1]
    print(f"P5 synthetic decode step {SH}: {s*1e9:8.1f} ns/step -> {n/s/1e9:6.2f} G sym/s ~= {n/s/1e9:6.2f} GB/s")

p5(8)
p5(32)
