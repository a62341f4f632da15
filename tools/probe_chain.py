"""Bisect the FSE decode chain cost on TPU: add one body piece at a time."""
import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
B, T, W = 512, 4096, 9080
STEPS = 16384

packed = jnp.asarray(rng.integers(0, 2**31, (B, T)), jnp.uint32)
words = jnp.asarray(rng.integers(0, 2**31, (B, W)), jnp.uint32)
s0 = jnp.asarray(rng.integers(0, 2048, (B,)), jnp.int32)
bp0 = jnp.full((B,), W * 32 - 64, jnp.int32)


def timeit(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def g1(tbl, idx):
    idx = jnp.clip(idx, 0, tbl.shape[1] - 1)
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def rb(words, bitpos, nb):
    bp = jnp.maximum(bitpos, 0)
    word = bp >> 5
    sh = (bp & 31).astype(jnp.uint32)
    wmax = words.shape[1] - 1
    idx = jnp.stack([jnp.minimum(word, wmax), jnp.minimum(word + 1, wmax)], axis=1)
    w = jnp.take_along_axis(words, idx, axis=1)
    lo = w[:, 0] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), w[:, 1] << (jnp.uint32(32) - sh))
    mask = (jnp.uint32(1) << nb.astype(jnp.uint32)) - jnp.uint32(1)
    return (lo | hi) & mask


# 1. bare dependent-gather chain, fori_loop
@jax.jit
def v1(packed, s):
    def body(i, s):
        e = g1(packed, s)
        return (e.astype(jnp.int32) + i) & (T - 1)
    return jax.lax.fori_loop(0, STEPS, body, s)

print(f"v1 bare chain fori            {timeit(v1, packed, s0)*1e3:9.2f} ms")

# 2. two dependent gathers per step (2 states)
@jax.jit
def v2(packed, s):
    def body(i, carry):
        s1, s2 = carry
        e1 = g1(packed, s1).astype(jnp.int32)
        e2 = g1(packed, s2).astype(jnp.int32)
        return ((e1 + i) & (T - 1), (e2 + i) & (T - 1))
    return jax.lax.fori_loop(0, STEPS, body, (s, s + 1))

print(f"v2 2-gather chain fori        {timeit(v2, packed, s0)*1e3:9.2f} ms")

# 3. + bit reads
@jax.jit
def v3(packed, words, s, bp):
    def body(i, carry):
        s1, s2, bp = carry
        e1 = g1(packed, s1).astype(jnp.int32)
        nb0 = (e1 >> 8) & 0xFF
        bp0 = bp - (nb0 & 15)
        low0 = rb(words, bp0, nb0 & 15).astype(jnp.int32)
        e2 = g1(packed, s2).astype(jnp.int32)
        nb1 = (e2 >> 8) & 0xFF
        bp1 = bp0 - (nb1 & 15)
        low1 = rb(words, bp1, nb1 & 15).astype(jnp.int32)
        return (((e1 >> 16) + low0) & (T - 1), ((e2 >> 16) + low1) & (T - 1),
                jnp.maximum(bp1, 64))
    return jax.lax.fori_loop(0, STEPS, body, (s, s + 1, bp))

print(f"v3 +bit reads fori            {timeit(v3, packed, words, s0, bp0)*1e3:9.2f} ms")

# 4. scan with ys (like new decode), no bit reads
@jax.jit
def v4(packed, s):
    def body(carry, i):
        s1, s2 = carry
        e1 = g1(packed, s1).astype(jnp.int32)
        e2 = g1(packed, s2).astype(jnp.int32)
        ys = jnp.stack([(e1 & 0xFF).astype(jnp.uint8), (e2 & 0xFF).astype(jnp.uint8)], axis=1)
        return (((e1 >> 16) + i) & (T - 1), ((e2 >> 16) + i) & (T - 1)), ys
    (_, _), ys = jax.lax.scan(body, (s, s + 1), jnp.arange(STEPS, dtype=jnp.int32))
    return ys

print(f"v4 scan+ys (no bits)          {timeit(v4, packed, s0)*1e3:9.2f} ms")

# 5. full body, scan, unroll 1 vs 8
def make_v5(unroll):
    @jax.jit
    def v5(packed, words, s, bp):
        def body(carry, i):
            s1, s2, bp = carry
            e1 = g1(packed, s1).astype(jnp.int32)
            nb0 = (e1 >> 8) & 15
            bp0 = bp - nb0
            low0 = rb(words, bp0, nb0).astype(jnp.int32)
            e2 = g1(packed, s2).astype(jnp.int32)
            nb1 = (e2 >> 8) & 15
            bp1 = bp0 - nb1
            low1 = rb(words, bp1, nb1).astype(jnp.int32)
            ys = jnp.stack([(e1 & 0xFF).astype(jnp.uint8), (e2 & 0xFF).astype(jnp.uint8)], axis=1)
            return (((e1 >> 16) + low0) & (T - 1), ((e2 >> 16) + low1) & (T - 1),
                    jnp.maximum(bp1, 64)), ys
        (_, _, _), ys = jax.lax.scan(body, (s, s + 1, bp),
                                     jnp.arange(STEPS, dtype=jnp.int32), unroll=unroll)
        return ys
    return v5

print(f"v5 full scan unroll=1         {timeit(make_v5(1), packed, words, s0, bp0)*1e3:9.2f} ms")
print(f"v5 full scan unroll=8         {timeit(make_v5(8), packed, words, s0, bp0)*1e3:9.2f} ms")

# 6. scale B: bare chain at B=4096
B2 = 4096
packed2 = jnp.asarray(rng.integers(0, 2**31, (B2, T)), jnp.uint32)
s02 = jnp.asarray(rng.integers(0, 2048, (B2,)), jnp.int32)
print(f"v1 bare chain B=4096          {timeit(v1, packed2, s02)*1e3:9.2f} ms")
