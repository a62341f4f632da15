"""Probe: row-local pull placement for the TurboRANS encode kernel.

The shipped encode2 kernel is issue-bound on its pull placement: every
step runs TWO 10-iteration binary searches over the FLAT 1024-lane rank
array, each iteration paying an 8-chunk lane-gather (~24 vreg ops), i.e.
~480 vreg ops per step just for placement.

Observation: the wire's placement rule (position p holds the lane with
flat rank cursor+total-p) makes each sublane ROW's emissions CONTIGUOUS
in the stream, so placement decomposes into 8 row-local problems, each a
7-iteration binary search over ONE 128-lane row (plain take_along_axis,
no chunk select), batched as one (16,128) computation.  Wire bytes are
IDENTICAL (verified on p80/p14/p02 incl. chunked mode).

The kernel is now PRODUCTION code: rans_encode2(..., rowloc=True) in
finitestateentropy_tpu/turbo/rans_kernels.py (_rans_encode_rl_kernel);
this probe times it against the flat-search baseline.

Usage:
  python tools/runcpu_probe.py tools/probe_encode4.py --check   (CPU)
  python tools/probe_encode4.py --time                          (TPU slope)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

from finitestateentropy_tpu.turbo.rans_kernels import rans_encode2


def _inputs(group_bytes, G, proba, tlog):
    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import pack_rans_ctables
    from finitestateentropy_tpu.utils import generate_proba

    base = generate_proba(proba)
    data = (base * ((group_bytes // len(base)) + 1))[:group_bytes]
    src = np.frombuffer(data, np.uint8)
    norm, max_sv, ncount, mfs = _prep_group(src, tlog)
    n_pad = _pad_n(group_bytes)
    t4 = n_pad // TURBO_STEP_SYMS
    pad = np.full(n_pad, mfs, np.uint8)
    pad[:group_bytes] = src
    fc, mg = pack_rans_ctables(norm)
    srcw = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)
    return (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
            jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
            jnp.asarray(np.broadcast_to(srcw, (G, t4 * 8, 128)).copy()),
            t4, _hrows_cap(n_pad))


def check():
    for proba, nbytes, force in ((80, 16384, 0), (80, 16384, 2), (14, 8192, 0),
                                 (2, 8192, 0)):
        fc, mg, srcw, t4, hcap = _inputs(nbytes, 1, proba, 10)
        s1, f1, c1, st1 = rans_encode2(fc, mg, srcw, t4, hcap, True, False,
                                       10, True, force)
        s2, f2, c2, st2 = rans_encode2(fc, mg, srcw, t4, hcap, True, False,
                                       10, True, force, True)
        cs = int(np.asarray(c1)[0])
        assert int(np.asarray(c2)[0]) == cs, (proba, force)
        nw = (cs + 1) // 2
        ok_s = np.array_equal(np.asarray(s2)[0].reshape(-1)[:nw],
                              np.asarray(s1)[0].reshape(-1)[:nw])
        ok_f = np.array_equal(np.asarray(f2), np.asarray(f1))
        ok_t = np.array_equal(np.asarray(st2), np.asarray(st1))
        print(f"p{proba:02d} force={force}: stream={ok_s} fin={ok_f} "
              f"stots={ok_t} cs={cs}")
        assert ok_s and ok_f and ok_t


def timeit():
    gb = 1 << 20
    for name, rowloc in (("encode2(base)", False), ("encode2(rowloc)", True)):
        ts = {}
        for G in (8, 32):
            fc, mg, srcw, t4, hcap = _inputs(gb, G, 80, 10)
            args = (fc, mg, srcw, t4, hcap, False, False, 10, True, 0, rowloc)
            np.asarray(rans_encode2(*args)[2])
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(rans_encode2(*args)[2])
                best = min(best, time.perf_counter() - t0)
            ts[G] = best
        gbps = (32 - 8) * gb / (ts[32] - ts[8]) / 1e9
        print(f"{name}: {gbps:.3f} GB/s  (t8 {ts[8]*1e3:.1f} ms, "
              f"t32 {ts[32]*1e3:.1f} ms)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", action="store_true")
    a = ap.parse_args()
    if a.check:
        check()
    if a.time:
        timeit()
