"""Verify chain timing is real: correctness vs numpy + scaling with STEPS."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
B, T = 512, 4096

packed_np = rng.integers(0, 2**31, (B, T)).astype(np.uint32)
s0_np = rng.integers(0, 2048, (B,)).astype(np.int32)
packed = jnp.asarray(packed_np)
s0 = jnp.asarray(s0_np)


def g1(tbl, idx):
    idx = jnp.clip(idx, 0, tbl.shape[1] - 1)
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


@partial(jax.jit, static_argnums=(2,))
def v1(packed, s, steps):
    def body(i, s):
        e = g1(packed, s)
        return (e.astype(jnp.int32) + i) & (T - 1)
    return jax.lax.fori_loop(0, steps, body, s, unroll=False)


# correctness vs numpy for 100 steps
s = s0_np.copy()
for i in range(100):
    e = packed_np[np.arange(B), np.clip(s, 0, T - 1)]
    s = (e.astype(np.int64) + i).astype(np.int32) & (T - 1)
out = np.asarray(jax.block_until_ready(v1(packed, s0, 100)))
print("correct @100 steps:", np.array_equal(out, s))


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for steps in (1024, 4096, 16384, 65536, 262144):
    t = timeit(v1, packed, s0, steps)
    print(f"steps={steps:7d}  {t*1e3:9.3f} ms   {t/steps*1e9:8.2f} ns/step")
