"""Honest (to-host-synced) probe of in-Pallas gather options on TPU.

Determines the decode kernel design:
A. lane-dim take_along_axis [8,128] per-row tables
B. lane-dim take_along_axis with wide lane span [8, 2048]
C. sublane-dim take_along_axis [T, 128] per-lane (per-stream) tables
D. in-kernel fori_loop overhead (pure VPU ops)
E. XLA big batched gather (honest re-measure)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def timeit(fn, *args, iters=5):
    np.asarray(fn(*args))  # compile + first
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


REP = 4096

# ---------------- A: lane gather [8,128], loop in kernel
def kA(t_ref, ix_ref, out_ref):
    t = t_ref[:]
    def body(i, ix):
        v = jnp.take_along_axis(t, ix, axis=1)
        return (v + 1) & 127
    out_ref[:] = jax.lax.fori_loop(0, REP, body, ix_ref[:])

try:
    t = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kA, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    s = timeit(f, t, ix)
    print(f"A lane-gather [8,128] chain:   {s/REP*1e9:9.1f} ns/step  {8*128*REP/s/1e9:8.2f} G lookups/s")
except Exception as e:
    print("A failed:", repr(e)[:200])

# ---------------- B: lane gather wide [8, 2048]
def kB(t_ref, ix_ref, out_ref):
    t = t_ref[:]
    def body(i, ix):
        v = jnp.take_along_axis(t, ix, axis=1)
        return (v + 1) & 2047
    out_ref[:] = jax.lax.fori_loop(0, REP, body, ix_ref[:])

try:
    t = jnp.asarray(rng.integers(0, 2048, (8, 2048)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 2048, (8, 2048)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kB, out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    s = timeit(f, t, ix)
    print(f"B lane-gather [8,2048] chain:  {s/REP*1e9:9.1f} ns/step  {8*2048*REP/s/1e9:8.2f} G lookups/s")
except Exception as e:
    print("B failed:", repr(e)[:200])

# ---------------- C: sublane gather [T,128] per-lane tables
def kC(t_ref, ix_ref, out_ref):
    t = t_ref[:]
    def body(i, ix):
        v = jnp.take_along_axis(t, ix, axis=0)
        return (v + 1) & (t_ref.shape[0] - 1)
    out_ref[:] = jax.lax.fori_loop(0, REP, body, ix_ref[:])

try:
    T = 2048
    t = jnp.asarray(rng.integers(0, T, (T, 128)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, T, (8, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kC, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    s = timeit(f, t, ix)
    print(f"C sublane-gather [2048,128]:   {s/REP*1e9:9.1f} ns/step  {8*128*REP/s/1e9:8.2f} G lookups/s")
except Exception as e:
    print("C failed:", repr(e)[:200])

# C2: sublane gather smaller table
def kC2(t_ref, ix_ref, out_ref):
    t = t_ref[:]
    def body(i, ix):
        v = jnp.take_along_axis(t, ix, axis=0)
        return (v + 1) & (t_ref.shape[0] - 1)
    out_ref[:] = jax.lax.fori_loop(0, REP, body, ix_ref[:])

try:
    T = 256
    t = jnp.asarray(rng.integers(0, T, (T, 128)), jnp.int32)
    ix = jnp.asarray(rng.integers(0, T, (8, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kC2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    s = timeit(f, t, ix)
    print(f"C2 sublane-gather [256,128]:   {s/REP*1e9:9.1f} ns/step  {8*128*REP/s/1e9:8.2f} G lookups/s")
except Exception as e:
    print("C2 failed:", repr(e)[:200])

# ---------------- D: loop overhead (pure VPU)
def kD(ix_ref, out_ref):
    def body(i, ix):
        return (ix * 5 + 1) & 2047
    out_ref[:] = jax.lax.fori_loop(0, REP, body, ix_ref[:])

try:
    ix = jnp.asarray(rng.integers(0, 2048, (8, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kD, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    s = timeit(f, ix)
    print(f"D pure-VPU loop:               {s/REP*1e9:9.1f} ns/step")
except Exception as e:
    print("D failed:", repr(e)[:200])

# ---------------- E: XLA big batched gather, honest
B, T, N = 256, 2048, 32768
tbl = jnp.asarray(rng.integers(0, 2**31, (B, T)), jnp.int32)
idx = jnp.asarray(rng.integers(0, T, (B, N)), jnp.int32)

@jax.jit
def big_gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx, axis=1)

s = timeit(big_gather, tbl, idx)
# subtract transfer cost estimate: output is B*N*4 = 32MB to host! time dominated by D2H.
print(f"E XLA big gather (incl D2H of 32MB): {s*1e3:.2f} ms -> {B*N/s/1e9:.2f} G/s lower bound")

# E2: reduce output to avoid D2H domination
@jax.jit
def big_gather_sum(tbl, idx):
    return jnp.sum(jnp.take_along_axis(tbl, idx, axis=1).astype(jnp.int64))

s = timeit(big_gather_sum, tbl, idx)
print(f"E2 XLA big gather+reduce:      {s*1e3:.2f} ms -> {B*N/s/1e9:.2f} G lookups/s")

# E3: chained big gathers (dependent, k steps) to isolate per-gather time
K = 32
@jax.jit
def chain_big(tbl, idx):
    def body(i, ix):
        return jnp.take_along_axis(tbl, ix, axis=1) & (T - 1)
    return jnp.sum(jax.lax.fori_loop(0, K, body, idx))

s = timeit(chain_big, tbl, idx)
print(f"E3 XLA chained big gathers x{K}: {s*1e3:.2f} ms -> {B*N*K/s/1e9:.2f} G lookups/s")
