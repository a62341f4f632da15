"""Resolve the timing contradiction between probe_chain.py and probe_chain2.py."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
B, T = 512, 4096
STEPS = 16384
packed = jnp.asarray(rng.integers(0, 2**31, (B, T)), jnp.uint32)
s0 = jnp.asarray(rng.integers(0, 2048, (B,)), jnp.int32)


def g1(tbl, idx):
    idx = jnp.clip(idx, 0, tbl.shape[1] - 1)
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


# EXACT copy of probe_chain.py v1
@jax.jit
def v1(packed, s):
    def body(i, s):
        e = g1(packed, s)
        return (e.astype(jnp.int32) + i) & (T - 1)
    return jax.lax.fori_loop(0, STEPS, body, s)


def timeit_buro(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return ts


def timeit_host(fn, *args, iters=5):
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return ts


ts = timeit_buro(v1, packed, s0)
print("v1 block_until_ready times (ms):", [f"{t*1e3:.3f}" for t in ts])
ts = timeit_host(v1, packed, s0)
print("v1 to-host times (ms):          ", [f"{t*1e3:.3f}" for t in ts])

# does the result change when called twice (i.e. real compute)?
a = np.asarray(v1(packed, s0))
b = np.asarray(v1(packed, s0))
print("deterministic:", np.array_equal(a, b))
