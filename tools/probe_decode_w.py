"""Probe: HBM-windowed decode — break the nway <-> group-size coupling.

The v2/v3c kernels hold each group's ENTIRE packed stream in VMEM, so the
interleave width collapses as groups grow (2-4 MiB) or streams approach raw
size (proba02).  Stream consumption is monotone (the LIFO cursor only
decreases), and the per-chunk cursor endpoints are known in XLA ahead of the
launch, so fixed-size stream windows can be DMA'd HBM->VMEM per time-chunk
with precomputed start rows — double-buffered, no in-loop conditionals:

  * grid (G//nway, n_chunks); chunk c covers t4 in [c*S, (c+1)*S)
  * window W = 16*S + 16 word rows >= worst-case chunk consumption
    (<= 1024 renorms/step = 4 rows/step = 16 rows/t4) + gather slack
  * ws[g, c] = clip((cursor_after_chunk - 1024) >> 8, 0, srows - W)
    computed in XLA from the FLAG_STEPTOTS totals (scalar-prefetched)
  * out / cursors / roffs are chunk-blocked (auto-pipelined by Pallas);
    states carry across chunks in scratch (persists across grid steps)

Usage: python tools/probe_decode_w.py [variant ...]
  variants like w7s32, w8s64, w7s64g4 (nway 7, S=64, 4 MiB groups),
  w7s32p02 (proba02 corpus), base7 (shipped v2 for comparison)
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import (RANS_L, RANS_TABLELOG,
                                               parse_rans_group, rans_compress)
from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_dtable,
                                                       rans_decode_v2,
                                                       stream_word_rows)
from finitestateentropy_tpu.utils import generate_proba

# The windowed kernel is now PRODUCTION code:
# finitestateentropy_tpu.turbo.rans_kernels.rans_decode_w
# (_rans_decode_w_kernel); this probe times it against the resident v2
# baseline across nway/S/group-size/corpus variants.
from finitestateentropy_tpu.turbo.rans_kernels import rans_decode_w


def _round8(x):
    return (x + 7) // 8 * 8


def build_inputs(G, mib=1, proba=80):
    nbytes = int(mib * (1 << 20))
    data = generate_proba(proba)
    while len(data) < nbytes:
        data = data + data
    data = data[:nbytes]
    blob = rans_compress(bytes(data), steptots=True)
    (n, csize_hw, tlog, flags, norm, max_sv, init, payload,
     stots), _ = parse_rans_group(blob)
    n_pad = _pad_n(n)
    t4 = n_pad // TURBO_STEP_SYMS
    hrows = _round8((csize_hw + 127) // 128 + 16)
    tbl = pack_rans_dtable(norm, tlog)
    T = n_pad // 1024
    srows = stream_word_rows(hrows)
    hw = np.frombuffer(payload, "<u2").astype(np.uint32)
    pk = np.zeros(srows * 128, np.uint32)
    full = len(hw) // 2
    pk[:full] = hw[0 : 2 * full : 2] | (hw[1 : 2 * full + 1 : 2] << 16)
    if len(hw) & 1:
        pk[full] = hw[-1]
    args = (np.full(G, csize_hw, np.int32),
            np.broadcast_to(tbl, (G,) + tbl.shape).copy(),
            np.broadcast_to(init.view(np.int32).reshape(8, 128),
                            (G, 8, 128)).copy(),
            np.broadcast_to(pk.view(np.int32).reshape(srows, 128),
                            (G, srows, 128)).copy(),
            np.broadcast_to(stots.astype(np.int32), (G, T, 8)).copy())
    return [jnp.asarray(a) for a in args], t4, hrows, data, n, tlog


def run_variant(name, nway, S, mib=1, proba=80, reps=6, totals=False):
    base_groups = max(1, int(32 // mib))
    G_small = ((base_groups + nway - 1) // nway) * nway
    G_big = ((4 * base_groups + nway - 1) // nway) * nway
    args_s, t4, hrows, data, n, tlog = build_inputs(G_small, mib, proba)
    args_b = build_inputs(G_big, mib, proba)[0]

    def call(args):
        if totals:
            import jax.numpy as jnp
            args = args[:4] + [jnp.sum(args[4], axis=2).astype(jnp.int32)]
        if S == 0:   # shipped v2 baseline
            return rans_decode_v2(*args, t4, hrows, False, tlog)
        return rans_decode_w(*args, t4, hrows, nway, tlog, S)

    def timeit(args, G):
        out, err = call(args)
        e = np.asarray(err)
        assert not e.any(), f"{name}: err {e}"
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out, err = call(args)
            np.asarray(err)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_s, out = timeit(args_s, G_small)
    ob = np.asarray(out)[0].astype("<i4").tobytes()[:n]
    assert ob == data, f"{name}: decode bytes wrong"
    t_b, _ = timeit(args_b, G_big)
    gbs = (G_big - G_small) * int(mib * (1 << 20)) / (t_b - t_s) / 1e9
    print(f"{name}: nway={nway} S={S} {mib}MiB p{proba:02d}  "
          f"{gbs:.2f} GB/s  (t_small {t_s*1e3:.1f} ms, t_big {t_b*1e3:.1f} ms)")
    return gbs


VARIANTS = {
    "base7": (7, 0, 1, 80),
    "base1g4": (1, 0, 4, 80),     # v2 picks nway itself; label only
    "base1p02": (1, 0, 1, 2),
    "w7s32": (7, 32, 1, 80),
    "w7s64": (7, 64, 1, 80),
    "w8s32": (8, 32, 1, 80),
    "w10s32": (10, 32, 1, 80),
    "w7s64g2": (7, 64, 2, 80),
    "w7s64g4": (7, 64, 4, 80),
    "w8s64g4": (8, 64, 4, 80),
    "w7s32p02": (7, 32, 1, 2),
    "w8s32p02": (8, 32, 1, 2),
    "w10s32p02": (10, 32, 1, 2),
    "w12s32": (12, 32, 1, 80),
    "w14s32": (14, 32, 1, 80),
    "w10s64g4": (10, 64, 4, 80),
    "w12s32p02": (12, 32, 1, 2),
    "w8s32g4": (8, 32, 4, 80),
    "w10s32g4": (10, 32, 4, 80),
    "w10s32g2": (10, 32, 2, 80),
    "base1p14": (1, 0, 1, 14),
    "w10s32p14": (10, 32, 1, 14),
    # totals-wire variants (5th element): in-kernel 2-matmul rank
    "wt7s32": (7, 32, 1, 80, True),
    "wt10s32": (10, 32, 1, 80, True),
    "wt7s64g4": (7, 64, 4, 80, True),
    "baset1g4": (1, 0, 4, 80, True),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["w7s32"]
    print("devices:", jax.devices())
    for nm in names:
        v = VARIANTS[nm]
        nway, S, mib, proba = v[:4]
        totals = len(v) > 4 and v[4]
        try:
            run_variant(nm, nway, S, mib, proba, totals=totals)
        except Exception as ex:
            print(f"{nm}: FAILED: {type(ex).__name__}: {str(ex)[:300]}")
