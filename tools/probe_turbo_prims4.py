"""Round 4: race cumsum variants; fixed-dtype MXU one-hot scatter."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
SH = (8, 128)


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


def pcall(kernel, n_in, out_shape, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )


xnp = rng.integers(0, 13, SH).astype(np.int32)
want = np.cumsum(xnp.ravel()).reshape(SH)
x = jnp.asarray(xnp)

TRIA = jnp.asarray(
    np.concatenate([np.triu(np.ones((128, 128), np.float32)),
                    np.ones((128, 1), np.float32)], axis=1).astype(np.float32))  # [128,129]
TRI8 = jnp.asarray(np.tril(np.ones((8, 8), np.float32), -1))


# G: bf16 within-matmul + hi/lo split row prefix
def cumsum_G(xv, tria, tri8):
    xb = xv.astype(jnp.bfloat16)
    aug = jax.lax.dot_general(xb, tria.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [8,129]
    within = aug[:, :128]
    rowtot = aug[:, 128:129].astype(jnp.int32)     # <= 1920
    hi = (rowtot >> 4).astype(jnp.bfloat16)
    lo = (rowtot & 15).astype(jnp.bfloat16)
    t8 = tri8.astype(jnp.bfloat16)
    pre = (jax.lax.dot_general(t8, hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * 16.0
           + jax.lax.dot_general(t8, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32))
    return (within + pre).astype(jnp.int32)


def check(fn, name, extra):
    def k(x_ref, *rest):
        refs, o_ref = rest[:-1], rest[-1]
        o_ref[:] = fn(x_ref[:], *[r[:] for r in refs])
    f = jax.jit(pcall(k, 1 + len(extra), jax.ShapeDtypeStruct(SH, jnp.int32)))
    got = np.asarray(f(x, *extra))
    print(f"{name} correct:", np.array_equal(got, want))


check(cumsum_G, "G bf16-aug", (TRIA, TRI8))


def time_variant(fn, name, extra):
    def make(rep):
        def k(x_ref, *rest):
            refs, o_ref = rest[:-1], rest[-1]
            vals = [r[:] for r in refs]
            def body(i, v):
                return fn(v & 15, *vals) & 0x3FFF
            o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
        f = jax.jit(pcall(k, 1 + len(extra), jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(x, *extra)
    s = slope(make)
    print(f"{name}: {s*1e9:8.1f} ns/step")


time_variant(cumsum_G, "G bf16-aug matmul", (TRIA, TRI8))

# H: flat [1,1024] @ [1024,1024] bf16
TRIBIG = jnp.asarray(np.triu(np.ones((1024, 1024), np.float32)).astype(np.float32))
def cumsum_H(xv, tribig):
    flat = xv.reshape(1, 1024).astype(jnp.bfloat16)
    pre = jax.lax.dot_general(flat, tribig.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return pre.reshape(8, 128).astype(jnp.int32)

check(cumsum_H, "H flat-big", (TRIBIG,))
time_variant(cumsum_H, "H flat-big matmul", (TRIBIG,))

# E: within-row matmul + scalar row prefix via scratch
def make_E(rep):
    def k(x_ref, tria_ref, o_ref, scr_ref):
        tria = tria_ref[:]
        def body(i, v):
            xb = (v & 15).astype(jnp.bfloat16)
            aug = jax.lax.dot_general(xb, tria.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            within = aug[:, :128]
            scr_ref[0:8, 0:1] = aug[:, 128:129].astype(jnp.int32)
            acc = 0
            offs = []
            for r in range(8):
                offs.append(acc)
                acc = acc + scr_ref[r, 0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            pre = jnp.zeros((8, 128), jnp.int32)
            for r in range(1, 8):
                pre = jnp.where(rows == r, offs[r], pre)
            return (within.astype(jnp.int32) + pre) & 0x3FFF
        o_ref[:] = jax.lax.fori_loop(0, rep, body, x_ref[:])
    f = jax.jit(pcall(k, 2, jax.ShapeDtypeStruct(SH, jnp.int32),
                      scratch=[pltpu.VMEM((8, 128), jnp.int32)]))
    return lambda: f(x, TRIA)

try:
    # correctness once
    f1 = make_E(1)
    got = np.asarray(f1()) & 0x3FFF
    print("E scalar-rowpre correct:", np.array_equal(got, (want & 0x3FFF)))
    s = slope(make_E)
    print(f"E scalar-rowpre: {s*1e9:8.1f} ns/step")
except Exception as e:
    print("E failed:", repr(e)[:300])

# ---------------- fixed MXU one-hot scatter
def p_scatter():
    nb_np = rng.integers(0, 13, 1024).astype(np.int32)
    val_np = (rng.integers(0, 2**31, 1024) & ((1 << nb_np) - 1)).astype(np.int64)
    off_np = np.concatenate([[0], np.cumsum(nb_np)[:-1]]).astype(np.int32)

    val = jnp.asarray(val_np.reshape(8, 128).astype(np.int32))
    nb = jnp.asarray(nb_np.reshape(8, 128))
    off = jnp.asarray(off_np.reshape(8, 128))

    def body_math(v_i32, o, cols):
        v = pltpu.bitcast(v_i32, jnp.uint32)
        sh = (o & 31).astype(jnp.uint32)
        widx = o >> 5
        lo_u = v << sh
        hi_u = jnp.where(sh == 0, jnp.uint32(0), v >> (jnp.uint32(32) - sh))
        lo_i = pltpu.bitcast(lo_u, jnp.int32).reshape(1024, 1)
        hi_i = pltpu.bitcast(hi_u, jnp.int32).reshape(1024, 1)
        w = widx.reshape(1024, 1)
        oh_lo = (cols == w).astype(jnp.bfloat16)
        oh_hi = (cols == w + 1).astype(jnp.bfloat16)
        planes = []
        for p in range(4):
            b_lo = ((lo_i >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            b_hi = ((hi_i >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(oh_lo, b_lo, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(oh_hi, b_hi, (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            planes.append(acc.astype(jnp.uint32))
        word = planes[0] | (planes[1] << 8) | (planes[2] << 16) | (planes[3] << 24)
        return pltpu.bitcast(word, jnp.int32).reshape(4, 128)

    def k(val_ref, nb_ref, off_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1024, 512), 1)
        o_ref[:] = body_math(val_ref[:], off_ref[:], cols)

    try:
        ff = jax.jit(pcall(k, 3, jax.ShapeDtypeStruct((4, 128), jnp.int32)))
        got = np.asarray(ff(val, nb, off)).astype(np.uint32).ravel()
        acc = np.zeros(600, np.uint64)
        for i in range(1024):
            o, v, n = int(off_np[i]), int(val_np[i]), int(nb_np[i])
            w, s = o >> 5, o & 31
            acc[w] |= (v << s) & 0xFFFFFFFF
            if s:
                acc[w + 1] |= (v >> (32 - s))
        ok = np.array_equal(got, acc[:512].astype(np.uint32))
        print("MXU one-hot scatter correct:", ok)
    except Exception as e:
        print("MXU scatter failed:", repr(e)[:400])
        return

    def make(rep):
        def kk(val_ref, nb_ref, off_ref, o_ref):
            cols = jax.lax.broadcasted_iota(jnp.int32, (1024, 512), 1)
            def body(i, carry):
                w = body_math(carry, off_ref[:], cols)
                return carry + w[0:4].sum() * 0 + 1
            o_ref[:] = jax.lax.fori_loop(0, rep, body, val_ref[:])
        f = jax.jit(pcall(kk, 3, jax.ShapeDtypeStruct(SH, jnp.int32)))
        return lambda: f(val, nb, off)

    s = slope(make, reps=(256, 2048))
    print(f"MXU scatter 1024f->512w: {s*1e9:8.1f} ns/step -> {1024/s/1e9:5.2f} G fields/s")

p_scatter()
