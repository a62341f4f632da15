"""Round 2: manual cumsum, larger rep spread for stable slopes."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def slope(make_fn, reps=(1024, 16384), iters=5):
    ts = []
    for rep in reps:
        f = make_fn(rep)
        np.asarray(f())
        best = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(f())
            best.append(time.perf_counter() - t0)
        ts.append(min(best))
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def pcall(kernel, n_in, out_shape):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def lane_cumsum(x):
    """Inclusive prefix sum along axis=1 (lanes), log-shift."""
    n = x.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(lanes >= k, shifted, 0)
        k *= 2
    return x


def flat_cumsum(x):
    """Inclusive prefix over row-major flattened [R,128]."""
    c = lane_cumsum(x)
    rowtot = c[:, -1:]
    # prefix over rows (R small): log-shift on axis 0
    r = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, rowtot.shape, 0)
    acc = rowtot
    k = 1
    while k < r:
        shifted = pltpu.roll(acc, k, 0)
        acc = acc + jnp.where(rows >= k, shifted, 0)
        k *= 2
    rowoff = acc - rowtot
    return c + rowoff


# check correctness of flat_cumsum on CPU-ish via pallas on device
SH = (8, 128)
xnp = rng.integers(0, 12, SH).astype(np.int32)
x = jnp.asarray(xnp)
def kc(x_ref, o_ref):
    o_ref[:] = flat_cumsum(x_ref[:])
f = jax.jit(pcall(kc, 1, jax.ShapeDtypeStruct(SH, jnp.int32)))
got = np.asarray(f(x))
want = np.cumsum(xnp.ravel()).reshape(SH)
print("flat_cumsum correct:", np.array_equal(got, want))


# ---------------- P2 again: 16-chunk 2048-entry lookup
def p2(rows, reps=(1024, 16384)):
    SHp = (rows, 128)
    tbl = jnp.asarray(rng.integers(0, 2**31, (16, 128)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 2048, SHp), jnp.int32)

    def make(rep):
        def k(t_ref, ix_ref, o_ref):
            t = t_ref[:]
            def lookup(s):
                hi = s >> 7
                lo = s & 127
                acc = jnp.zeros_like(s)
                for h in range(16):
                    row = jnp.broadcast_to(t[h:h+1, :], SHp)
                    v = jnp.take_along_axis(row, lo, axis=1)
                    acc = jnp.where(hi == h, v, acc)
                return acc
            def body(i, xv):
                return lookup(xv & 2047) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, ix_ref[:])
        f = jax.jit(pcall(k, 2, jax.ShapeDtypeStruct(SHp, jnp.int32)))
        return lambda: f(tbl, ix)

    s = slope(make, reps)
    n = SHp[0] * SHp[1]
    print(f"P2 16-chunk 2048-lookup {SHp}: {s*1e9:8.1f} ns/step  {n/max(s,1e-12)/1e9:7.2f} G lookups/s")

p2(8)
p2(32)

# ---------------- P3: flat cumsum cost
def p3(rows):
    SHp = (rows, 128)
    xx = jnp.asarray(rng.integers(0, 12, SHp), jnp.int32)
    def make(rep):
        def k(x_ref, o_ref):
            def body(i, v):
                return (flat_cumsum(v) & 1023) + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
        f = jax.jit(pcall(k, 1, jax.ShapeDtypeStruct(SHp, jnp.int32)))
        return lambda: f(xx)
    s = slope(make)
    print(f"P3 flat cumsum {SHp}: {s*1e9:8.1f} ns/step")

p3(8)
p3(32)

# ---------------- P5: synthetic full decode step
def p5(rows):
    SHp = (rows, 128)
    tbl = jnp.asarray(rng.integers(0, 2**31, (16, 128)), jnp.int32)
    stream = jnp.asarray(rng.integers(0, 2**31, (4096, 128)), jnp.int32)
    s0 = jnp.asarray(rng.integers(0, 2048, SHp), jnp.int32)

    def make(rep):
        def k(t_ref, st_ref, s_ref, o_ref):
            t = t_ref[:]
            def lookup(s):
                hi = s >> 7
                lo = s & 127
                acc = jnp.zeros_like(s)
                for h in range(16):
                    row = jnp.broadcast_to(t[h:h+1, :], SHp)
                    v = jnp.take_along_axis(row, lo, axis=1)
                    acc = jnp.where(hi == h, v, acc)
                return acc

            def body(carry, _):
                s, cur = carry
                e = lookup(s & 2047)
                nb = (e >> 8) & 15
                pre = flat_cumsum(nb)
                off = cur - pre
                base = (off[0, 0] >> 5) & 4087
                win = st_ref[pl.ds(base, 8), :]
                widx = (off >> 5) - base
                lo_w = jnp.zeros_like(s)
                hi_w = jnp.zeros_like(s)
                for ch in range(3):
                    row = jnp.broadcast_to(win[ch:ch+1, :], SHp)
                    v = jnp.take_along_axis(row, widx & 127, axis=1)
                    lo_w = jnp.where((widx >> 7) == ch, v, lo_w)
                    v2 = jnp.take_along_axis(row, (widx + 1) & 127, axis=1)
                    hi_w = jnp.where(((widx + 1) >> 7) == ch, v2, hi_w)
                sh = (off & 31).astype(jnp.uint32)
                w64 = (lo_w.astype(jnp.uint32) >> sh) | jnp.where(
                    sh == 0, jnp.uint32(0), hi_w.astype(jnp.uint32) << (32 - sh))
                bits = (w64 & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)).astype(jnp.int32)
                ns = ((e >> 16) & 2047) + bits
                return (ns, (cur - 1) & 131071), None

            (sf, _), _ = jax.lax.scan(body, (s_ref[:], jnp.int32(131072)), None, length=rep)
            o_ref[:] = sf
        f = jax.jit(pcall(k, 3, jax.ShapeDtypeStruct(SHp, jnp.int32)))
        return lambda: f(tbl, stream, s0)

    s = slope(make, (512, 8192))
    n = SHp[0] * SHp[1]
    print(f"P5 synthetic decode step {SHp}: {s*1e9:8.1f} ns/step -> {n/s/1e9:6.2f} GB/s")

p5(8)
p5(16)
p5(32)
