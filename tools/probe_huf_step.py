"""Probe: per-symbol serial cost of a static-table Huffman decode step
vs the shipped TurboRANS v2 advance (VERDICT r2 #7 / ROADMAP item 4).

Reference context: the reference's fastest decode is Huff0 4-stream X1
(/root/reference/lib/huf_decompress.c:262-354, 1.35 GB/s single core) —
lookBits(dtLog) -> dtable entry {sym, nbBits} -> skipBits.  The question:
would a TPU turbo format built on static-table Huffman beat the rANS
step?  Structurally the two per-symbol serial paths are:

  rANS v2:    slot = x & (2^L-1); e = table[slot] (L-chunk lane gather);
              x = f*(x>>L) + slot - cumul          [1 mul, 3 alu]
  Huffman X1: idx = x >> (32-L);  e = table[idx] (L-chunk lane gather);
              x = (x << nb) | refill; bc += nb     [2 var-shifts, 3 alu]

Both are dominated by the SAME chunk-select table gather (2^L entries =
2^L/128 sublane-broadcast+select rounds), and both renormalize via
flag-driven halfword pulls, so the entire pull/placement machinery
(rank matmul, packed windows, cursors) is format-independent and shared.
What differs is only the advance arithmetic measured here.

Huffman X2 (2 symbols/lookup, huf_decompress.c:454-953) is analysed, not
probed: a variable PER-STEP OUTPUT count moves the variability from the
stream side to the output side, so every step would need its own
rank/placement pass for the decoded bytes — the exact cost the v2 format
removes by emitting exactly one symbol per lane-step.  Strictly worse on
this machine.

Usage:
  python tools/runcpu_probe.py tools/probe_huf_step.py --check   (CPU)
  python tools/probe_huf_step.py --time                          (TPU)
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from finitestateentropy_tpu.turbo.rans_kernels import _sll, _srl

SHAPE = (8, 128)


def _gather(table_ref, tchunks, hi, lo):
    acc = jnp.zeros(SHAPE, jnp.int32)
    for h in range(tchunks):
        row = jnp.broadcast_to(table_ref[h : h + 1, :], SHAPE)
        acc = jnp.where(hi == h, jnp.take_along_axis(row, lo, axis=1), acc)
    return acc


def _rans_step_kernel(table_ref, x0_ref, out_ref, *, steps, tlog):
    tsize = 1 << tlog
    tchunks = max(tsize // 128, 1)

    def body(_, carry):
        x, acc = carry
        slot = x & (tsize - 1)
        e = _gather(table_ref, tchunks, _srl(slot, 7), slot & 127)
        sym = e & 0xFF
        f = _srl(e, 8) & 0xFFF
        c = _srl(e, 20)
        x = f * _srl(x, tlog) + slot - c
        # renorm flag + fake halfword refill (same shape as the shipped
        # v2 pull's serial-path contribution; the real pull machinery is
        # format-independent and excluded from both variants)
        flag = x < tsize
        x = jnp.where(flag, _sll(x, 16) | (sym ^ 0x5A), x)
        return x, acc ^ sym

    x, acc = jax.lax.fori_loop(
        0, steps, body, (x0_ref[...], jnp.zeros(SHAPE, jnp.int32)))
    out_ref[0:8, :] = x
    out_ref[8:16, :] = acc


def _huf_step_kernel(table_ref, x0_ref, out_ref, *, steps, tlog):
    tchunks = max((1 << tlog) // 128, 1)

    def body(_, carry):
        x, bc, acc = carry
        idx = _srl(x, 32 - tlog)
        e = _gather(table_ref, tchunks, _srl(idx, 7), idx & 127)
        sym = e & 0xFF
        nb = _srl(e, 8) & 0xF
        # consume nb bits (lane-variable shift) + refill garbage low bits
        x = _sll(x, nb) | (sym & ((jnp.int32(1) << nb) - 1))
        bc = bc + nb
        flag = bc >= 16
        bc = jnp.where(flag, bc - 16, bc)
        x = jnp.where(flag, x ^ 0x5A5A, x)   # stands in for hw refill OR
        return x, bc, acc ^ sym

    x, bc, acc = jax.lax.fori_loop(
        0, steps, body,
        (x0_ref[...], jnp.zeros(SHAPE, jnp.int32),
         jnp.zeros(SHAPE, jnp.int32)))
    out_ref[0:8, :] = x ^ bc
    out_ref[8:16, :] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def run_steps(table, x0, kind: str, steps: int, tlog: int,
              interpret: bool = False):
    kern = {"rans": _rans_step_kernel, "huf": _huf_step_kernel}[kind]
    tch = table.shape[0]
    return pl.pallas_call(
        functools.partial(kern, steps=steps, tlog=tlog),
        in_specs=[
            pl.BlockSpec((tch, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        interpret=interpret,
    )(table, x0)


def _tables(tlog, kind, rng):
    tsize = 1 << tlog
    tch = max(tsize // 128, 1)
    if kind == "rans":
        # (cumul << 20) | (freq << 8) | sym with freq >= 1 so x stays live
        sym = rng.integers(0, 256, tsize)
        f = rng.integers(1, 1 << 8, tsize)
        c = rng.integers(0, 1 << 10, tsize)
        t = (c.astype(np.int64) << 20) | (f << 8) | sym
    else:
        # (nbBits << 8) | sym, nbBits in [1, tlog]
        sym = rng.integers(0, 256, tsize)
        nb = rng.integers(1, tlog + 1, tsize)
        t = (nb << 8) | sym
    return jnp.asarray(t.astype(np.int32).reshape(tch, 128))


def check(interpret=True):
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(
        rng.integers(1 << 10, 1 << 30, SHAPE).astype(np.int32))
    for kind in ("rans", "huf"):
        for tlog in (10, 11):
            out = np.asarray(run_steps(_tables(tlog, kind, rng), x0, kind,
                                       16, tlog, interpret))
            assert out.any(), (kind, tlog)
            print(f"{kind} tlog={tlog}: ran, out checksum "
                  f"{int(out.astype(np.int64).sum()) & 0xFFFFFFFF:#x}")


def timeit(reps=3):
    """Queue-k timing (see tools/probe_timing.py): k async dispatches of a
    32768-step kernel synced once — the signal is 10 * 32768 steps, far
    above the tunnel's ±3 ms noise (the original slope version produced
    negative rates)."""
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(
        rng.integers(1 << 10, 1 << 30, SHAPE).astype(np.int32))
    res = {}
    steps = 32768
    for kind in ("rans", "huf"):
        for tlog in (10, 11, 12):
            table = _tables(tlog, kind, rng)
            np.asarray(run_steps(table, x0, kind, steps, tlog))
            ts = {}
            for k in (2, 12):
                best = 1e9
                for _ in range(reps):
                    t0 = time.perf_counter()
                    last = None
                    for _ in range(k):
                        last = run_steps(table, x0, kind, steps, tlog)
                    np.asarray(last)
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            ns = (ts[12] - ts[2]) / (10 * steps) * 1e9
            syms_gbs = 1024 * 10 * steps / (ts[12] - ts[2]) / 1e9
            res[(kind, tlog)] = ns
            print(f"{kind} tlog={tlog}: {ns:8.1f} ns/step "
                  f"({syms_gbs:6.2f} Gsym/s raw advance)")
    for tlog in (10, 11, 12):
        r, h = res[("rans", tlog)], res[("huf", tlog)]
        print(f"tlog={tlog}: huf/rans step ratio {h/r:.2f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", action="store_true")
    a = ap.parse_args()
    if a.check:
        check()
    if a.time:
        timeit()
