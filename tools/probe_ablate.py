"""Ablate the rANS decode kernel: cost of each step component (slope-timed).

Variants (correctness irrelevant; shapes/dependencies preserved):
  full     — the real kernel
  nolookup — table lookup replaced by arithmetic on slot
  nowindow — window gather replaced by a constant
  noprefix — prefix matmul+scalars replaced by lane iota
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.rans_kernels import (
    RANS_TABLELOG, _flat_prefix, _make_tria, _srl, _sll)

TSIZE = 1 << RANS_TABLELOG


def make_kernel(variant, t4_count, hrows):
    def kern(csize_ref, table_ref, init_ref, stream_ref, out_ref, scr_ref):
        shape = (8, 128)
        g = pl.program_id(0)
        cursor0 = csize_ref[g]
        tria = _make_tria()
        lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        rows8i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

        def step(x, cursor, t=0):
            slot = x & (TSIZE - 1)
            if variant == "nolookup":
                e = slot * 1103 + 7
            else:
                thi = _srl(slot, 7)
                tlo = slot & 127
                e = jnp.zeros(shape, jnp.int32)
                for h in range(16):
                    trow = jnp.broadcast_to(table_ref[0, h:h+1, :], shape)
                    e = jnp.where(thi == h, jnp.take_along_axis(trow, tlo, axis=1), e)
            sym = e & 0xFF
            f = _srl(e, 8) & 0xFFF
            c = _srl(e, 20)
            x = f * _srl(x, RANS_TABLELOG) + slot - c
            flag = _srl(x, 16) == 0
            if variant == "noprefix":
                rank, total = lanes + 1, scr_ref[0, 0] * 0 + 64
            elif variant == "v2prefix":
                aug = jax.lax.dot_general(
                    flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                within = aug[:, :128].astype(jnp.int32)
                # precomputed row offsets: SMEM scalar-prefetch stand-ins
                # (no store->load hazard; loads independent of flags)
                rowoff = jnp.zeros(shape, jnp.int32)
                for r in range(1, 8):
                    rowoff = jnp.where(rows8i == r,
                                       csize_ref[((t * 8 + r) & 31) + 1] & 1023,
                                       rowoff)
                rank = within + rowoff
                total = (csize_ref[(t & 31) + 1] & 0) + 64
            elif variant == "lanepfx":
                f32 = flag.astype(jnp.int32)
                acc = f32
                for k in (1, 2, 4, 8, 16, 32, 64):
                    sh = jnp.concatenate(
                        [jnp.zeros((8, k), jnp.int32), acc[:, : 128 - k]], axis=1)
                    acc = acc + sh
                rowtot = jnp.broadcast_to(acc[:, 127:128], shape)
                racc = rowtot
                for k in (1, 2, 4):
                    sh = jnp.concatenate(
                        [jnp.zeros((k, 128), jnp.int32), racc[: 8 - k]], axis=0)
                    racc = racc + sh
                rank = acc + (racc - rowtot)
                scr_ref[0:8, 0:1] = racc[:, 0:1]
                total = scr_ref[7, 0]
            elif variant == "newprefix":
                aug = jax.lax.dot_general(
                    flag.astype(jnp.int32).astype(jnp.bfloat16), tria,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                within = aug[:, :128].astype(jnp.int32)
                rowtot = jnp.broadcast_to(aug[:, 128:129], shape).astype(jnp.int32)
                acc = rowtot
                for k in (1, 2, 4):
                    sh = jnp.concatenate(
                        [jnp.zeros((k, 128), jnp.int32), acc[: 8 - k]], axis=0)
                    acc = acc + sh
                rank = within + (acc - rowtot)
                scr_ref[0:8, 0:1] = acc[:, 0:1]
                total = scr_ref[7, 0]
            else:
                rank, total = _flat_prefix(flag.astype(jnp.int32), tria, scr_ref, shape)
            pos = cursor - rank
            if variant == "nowindow":
                v = pos & 0xFFFF
            else:
                base_row = jnp.clip(_srl(jnp.maximum(cursor - 1024, 0), 7), 0, hrows - 16)
                rel = jnp.clip(pos - base_row * 128, 0, 2047)
                hi = _srl(rel, 7)
                lo = rel & 127
                v = jnp.zeros(shape, jnp.int32)
                for h in range(9):
                    row = jnp.broadcast_to(stream_ref[pl.ds(base_row + h, 1), :], shape)
                    v = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), v)
            x = jnp.where(flag, _sll(x, 16) | v, x)
            return sym, x, jnp.maximum(cursor - total, 2048)

        def body(t4, carry):
            x, cursor = carry
            s0, x, cursor = step(x, cursor, 4 * t4)
            s1, x, cursor = step(x, cursor, 4 * t4 + 1)
            s2, x, cursor = step(x, cursor, 4 * t4 + 2)
            s3, x, cursor = step(x, cursor, 4 * t4 + 3)
            out_ref[pl.ds(t4 * 8, 8), :] = s0 | _sll(s1, 8) | _sll(s2, 16) | _sll(s3, 24)
            return x, cursor

        x, cursor = jax.lax.fori_loop(0, t4_count, body, (init_ref[0], cursor0))
        out_ref[pl.ds(t4_count * 8, 8), :] = x
        out_ref[pl.ds(t4_count * 8 + 8, 8), :] = jnp.full(shape, cursor, jnp.int32)

    return kern


def run(variant, G, t4, hrows):
    rows = t4 * 8 + 16
    kern = make_kernel(variant, t4, hrows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hrows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    f = jax.jit(functools.partial(
        pl.pallas_call, kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32))())
    rng = np.random.default_rng(0)
    cs = jnp.asarray(np.full(max(G, 64), hrows * 100, np.int32))
    tbl = jnp.asarray(rng.integers(0, 2**31, (G, 16, 128)).astype(np.int32))
    init = jnp.asarray(rng.integers(2**16, 2**31, (G, 8, 128)).astype(np.int32))
    hws = jnp.asarray(rng.integers(0, 2**15, (G * hrows, 128)).astype(np.int32))
    out = f(cs, tbl, init, hws)
    np.asarray(out[:1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(cs, tbl, init, hws)[:1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


t4, hrows = 256, 1024
for variant in ("full", "v2prefix"):
    t32 = run(variant, 32, t4, hrows)
    t160 = run(variant, 160, t4, hrows)
    per_step = (t160 - t32) / (128 * t4 * 4)
    print(f"{variant:9s}: {per_step*1e9:7.1f} ns/step")
