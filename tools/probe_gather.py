"""Probe TPU gather/table-lookup throughput in several formulations.

Decides the decode-kernel design: everything hinges on how fast a
per-element dynamic table lookup can run on this chip.
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def report(name, n_elems, secs):
    print(f"{name:55s} {n_elems/secs/1e9:10.3f} G lookups/s   ({secs*1e3:.3f} ms)")


rng = np.random.default_rng(0)

# ---------------------------------------------------------------- XLA big gather
B, T, N = 256, 2048, 32768
tbl = jnp.asarray(rng.integers(0, 2**31, (B, T)), jnp.int32)
idx = jnp.asarray(rng.integers(0, T, (B, N)), jnp.int32)

@jax.jit
def big_gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx, axis=1)

try:
    s, _ = timeit(big_gather, tbl, idx)
    report("XLA take_along_axis [B,T=2048] x [B,N=32K]", B * N, s)
except Exception as e:
    print("big_gather failed:", e)

# small table (256)
tbl256 = jnp.asarray(rng.integers(0, 2**31, (B, 256)), jnp.int32)
idx256 = jnp.asarray(rng.integers(0, 256, (B, N)), jnp.int32)
try:
    s, _ = timeit(big_gather, tbl256, idx256)
    report("XLA take_along_axis [B,T=256] x [B,N=32K]", B * N, s)
except Exception as e:
    print("small gather failed:", e)

# shared table gather (table same for all)
tbl1 = jnp.asarray(rng.integers(0, 2**31, (T,)), jnp.int32)
@jax.jit
def shared_gather(tbl1, idx):
    return jnp.take(tbl1, idx)
try:
    s, _ = timeit(shared_gather, tbl1, idx)
    report("XLA shared-table take [T=2048] x [B*N=8M]", B * N, s)
except Exception as e:
    print("shared gather failed:", e)

# ---------------------------------------------------------------- chain loop in XLA (current style)
STEPS = 512
state0 = jnp.asarray(rng.integers(0, T, (B,)), jnp.int32)

@jax.jit
def chain(tbl, s0):
    def body(i, s):
        v = jnp.take_along_axis(tbl, s[:, None], axis=1)[:, 0]
        return (v + i) & (T - 1)
    return jax.lax.fori_loop(0, STEPS, body, s0)
try:
    s, _ = timeit(chain, tbl, state0)
    report(f"XLA chain fori_loop {STEPS} steps x B={B} gathers", B * STEPS, s)
except Exception as e:
    print("chain failed:", e)

# ---------------------------------------------------------------- Pallas: in-kernel take (lane gather)
def pk_take(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]          # [16, 128] = 2048-entry table
    ix = idx_ref[:]         # [8, 128]
    flat = t.reshape(-1)    # 2048
    out_ref[:] = jnp.take(flat, ix, axis=None).reshape(ix.shape)

try:
    tblp = jnp.asarray(rng.integers(0, 2**31, (16, 128)), jnp.int32)
    idxp = jnp.asarray(rng.integers(0, 2048, (8, 128)), jnp.int32)
    f = pl.pallas_call(
        pk_take,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    o = jax.block_until_ready(jax.jit(f)(tblp, idxp))
    ok = np.array_equal(np.asarray(o), np.asarray(tblp).reshape(-1)[np.asarray(idxp)])
    print("pallas take(flat2048, [8,128]) compiles, correct:", ok)
except Exception as e:
    print("pallas take failed:", repr(e)[:300])

# in-kernel repeated lane gather throughput
REP = 256
def pk_take_loop(tbl_ref, idx_ref, out_ref):
    flat = tbl_ref[:].reshape(-1)
    def body(i, ix):
        v = jnp.take(flat, ix, axis=None).reshape(ix.shape)
        return (v + 1) & (2048 - 1)
    out_ref[:] = jax.lax.fori_loop(0, REP, body, idx_ref[:])

try:
    IDXS = (64, 1024)   # 64 sublane-rows worth of lookups, 64K lanes? -> [64,1024]
    idxp2 = jnp.asarray(rng.integers(0, 2048, IDXS), jnp.int32)
    f2 = pl.pallas_call(
        pk_take_loop,
        out_shape=jax.ShapeDtypeStruct(IDXS, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    s, _ = timeit(jax.jit(f2), tblp, idxp2)
    report(f"Pallas in-kernel take loop [{IDXS}] x{REP}", IDXS[0]*IDXS[1]*REP, s)
except Exception as e:
    print("pallas take loop failed:", repr(e)[:300])

# ---------------------------------------------------------------- Pallas: per-sublane-row gather (take_along_axis lane dim)
def pk_taa(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]          # [8, 128] table per sublane row
    ix = idx_ref[:]         # [8, 128] indices into lane dim
    out_ref[:] = jnp.take_along_axis(t, ix, axis=1)

try:
    tbl8 = jnp.asarray(rng.integers(0, 2**31, (8, 128)), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    f3 = pl.pallas_call(
        pk_taa,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    o = jax.block_until_ready(jax.jit(f3)(tbl8, idx8))
    ref = np.take_along_axis(np.asarray(tbl8), np.asarray(idx8), axis=1)
    print("pallas take_along_axis lane-dim compiles, correct:", np.array_equal(np.asarray(o), ref))
except Exception as e:
    print("pallas taa failed:", repr(e)[:300])

# throughput: loop of lane-dim take_along_axis
def pk_taa_loop(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:]
    def body(i, ix):
        v = jnp.take_along_axis(t, ix & 127, axis=1)
        return v + 1
    out_ref[:] = jax.lax.fori_loop(0, REP, body, idx_ref[:])

try:
    SH = (256, 128)
    tblL = jnp.asarray(rng.integers(0, 2**31, SH), jnp.int32)
    idxL = jnp.asarray(rng.integers(0, 128, SH), jnp.int32)
    f4 = pl.pallas_call(
        pk_taa_loop,
        out_shape=jax.ShapeDtypeStruct(SH, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    s, _ = timeit(jax.jit(f4), tblL, idxL)
    report(f"Pallas take_along_axis lane loop [{SH}] x{REP}", SH[0]*SH[1]*REP, s)
except Exception as e:
    print("pallas taa loop failed:", repr(e)[:300])
