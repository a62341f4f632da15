"""Probe: timing methodology for kernel GB/s on a tunnel-attached box.

The shipped bench measures the SLOPE between two batch sizes so the
tunnel's fixed per-call cost (~25-35 ms here) cancels — but the slope
signal is only 2-8 ms, so run-to-run tunnel noise of a few ms swings the
reported number 2-3x (r3 headline 16.7 vs a same-session probe at 46).

Candidate methodologies, measured side by side on rans_decode_v2:

  A) slope over batch size G (shipped)
  B) queue k async dispatches, sync once; slope over k at fixed G
  C) ONE jit containing a lax.fori_loop that runs the kernel k times,
     with a data dependence threaded through the previous iteration's
     err output (cursors + err[0], runtime 0) so XLA cannot hoist the
     loop-invariant body; slope over k at fixed G

C has zero per-iteration host cost by construction: t(k) = fixed +
k * kernel, so (t(k2)-t(k1))/(k2-k1) is the pure device kernel time.

Usage: python tools/probe_timing.py [A B C]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _prep
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_stream_words, rans_decode_v2, rans_encode2, stream_word_rows)

GROUP = 1 << 20
TLOG = 10


def build(G):
    p = _prep(GROUP, 80, TLOG)
    fc, mg = p["fc_mg"]
    t4, hcap = p["t4"], p["hcap"]
    a = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
         jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
         jnp.asarray(np.broadcast_to(p["srcw"], (G, t4 * 8, 128)).copy()))
    stream, fin, csize, stots = rans_encode2(*a, t4, hcap, False, False, TLOG)
    cs = int(np.asarray(csize)[0])
    payload = np.ascontiguousarray(np.asarray(stream)[0]).tobytes()[: 2 * cs]
    hrows = p["round8"]((cs + 127) // 128 + 16)
    srows = stream_word_rows(hrows)
    one = pack_stream_words(payload, srows)
    stots0 = np.asarray(stots)[0]
    tch = p["dtbl"].shape[0]
    args = (jnp.asarray(np.full(G, cs, np.int32)),
            jnp.asarray(np.broadcast_to(p["dtbl"], (G, tch, 128)).copy()),
            jnp.asarray(np.broadcast_to(np.asarray(fin)[0].reshape(8, 128),
                                        (G, 8, 128)).copy()),
            jnp.asarray(np.broadcast_to(one, (G, srows, 128)).copy()),
            jnp.asarray(np.broadcast_to(stots0, (G,) + stots0.shape).copy()))
    return args, t4, hrows, p


def methodology_A(args, t4, hrows, G):
    # shipped: slope over G — rebuild big args
    argsb, *_ = build(5 * G)
    for a in (args, argsb):
        np.asarray(rans_decode_v2(*a, t4, hrows, False, TLOG)[1])
    res = []
    for _ in range(4):
        ts = {}
        for key, a in (("s", args), ("b", argsb)):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(rans_decode_v2(*a, t4, hrows, False, TLOG)[1])
                best = min(best, time.perf_counter() - t0)
            ts[key] = best
        gbps = 4 * G * GROUP / (ts["b"] - ts["s"]) / 1e9
        res.append(gbps)
        print(f"A slope-over-G: {gbps:7.2f} GB/s  (ts {ts['s']*1e3:.1f} "
              f"tb {ts['b']*1e3:.1f} ms)")
    return res


def methodology_B(args, t4, hrows, G):
    np.asarray(rans_decode_v2(*args, t4, hrows, False, TLOG)[1])
    res = []
    for _ in range(4):
        ts = {}
        for k in (2, 10):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                errs = [rans_decode_v2(*args, t4, hrows, False, TLOG)[1]
                        for _ in range(k)]
                np.asarray(errs[-1])
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        gbps = 8 * G * GROUP / (ts[10] - ts[2]) / 1e9
        res.append(gbps)
        print(f"B queue-k:      {gbps:7.2f} GB/s  (t2 {ts[2]*1e3:.1f} "
              f"t10 {ts[10]*1e3:.1f} ms)")
    return res


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _loop_decode(cs, tbl, fin, hws, stots, t4, hrows, k):
    def body(i, carry):
        err_prev = carry
        # thread the (runtime-zero) err through an input so XLA cannot
        # hoist the loop-invariant kernel call out of the loop
        cs2 = cs + err_prev[:1]
        out, err = rans_decode_v2(cs2, tbl, fin, hws, stots, t4, hrows,
                                  False, TLOG)
        return err
    err0 = jnp.zeros((cs.shape[0],), jnp.int32)
    return jax.lax.fori_loop(0, k, body, err0)


def methodology_C(args, t4, hrows, G):
    for k in (1, 5):
        np.asarray(_loop_decode(*args, t4, hrows, k))
    res = []
    for _ in range(4):
        ts = {}
        for k in (1, 5):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(_loop_decode(*args, t4, hrows, k))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        gbps = 4 * G * GROUP / (ts[5] - ts[1]) / 1e9
        res.append(gbps)
        print(f"C in-jit loop:  {gbps:7.2f} GB/s  (t1 {ts[1]*1e3:.1f} "
              f"t5 {ts[5]*1e3:.1f} ms)")
    return res


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C"]
    print("devices:", jax.devices())
    G = 32
    args, t4, hrows, _ = build(G)
    # correctness sanity once
    out, err = rans_decode_v2(*args, t4, hrows, False, TLOG)
    assert not np.asarray(err).any()
    for m in which:
        {"A": methodology_A, "B": methodology_B,
         "C": methodology_C}[m](args, t4, hrows, G)
