"""Probe: kernel GB/s sweeps with the queue-k timing methodology.

probe_timing.py showed the shipped slope-over-batch-size methodology has
a 2-8 ms signal under ~±3 ms tunnel noise (reported 15-46 GB/s for the
same kernel); queueing k async dispatches and syncing once scales the
signal to k * kernel-time with ONE fixed cost, giving ±1.3% repeatability.

    t(k) = fixed + k * kernel   =>   rate = (k2-k1)*bytes / (t(k2)-t(k1))

Usage: python tools/probe_sweep_b.py [variant ...]
  decode variants: base (v2), w7s32 w8s32 w8s64 w10s32 ... (windowed),
    suffixes g2/g4 (group MiB) and p02/p14 (corpus)
  encode variants: enc (flat search), encrl (row-local placement)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_rans_ctables, pack_rans_dtable, pack_stream_words, rans_decode_v2,
    rans_decode_w, rans_encode2, stream_word_rows)
from finitestateentropy_tpu.utils import generate_proba

TLOG = 10


def _round8(x):
    return (x + 7) // 8 * 8


def rate_b(dispatch, bytes_per_call, k1=2, k2=10, reps=3):
    """Queue-k methodology: dispatch() must be async (no sync inside)."""
    ts = {}
    for k in (k1, k2):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = dispatch()
            np.asarray(last)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (k2 - k1) * bytes_per_call / (ts[k2] - ts[k1]) / 1e9, ts


def build(G, mib, proba, tlog=TLOG):
    group_bytes = mib << 20
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
    hcap = _hrows_cap(n_pad)
    ea = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(srcw, (G, t4 * 8, 128)).copy()))
    stream, fin, csize, stots = rans_encode2(*ea, t4, hcap, False, False, tlog)
    cs = int(np.asarray(csize)[0])
    payload = np.ascontiguousarray(np.asarray(stream)[0]).tobytes()[: 2 * cs]
    hrows = _round8((cs + 127) // 128 + 16)
    srows = stream_word_rows(hrows)
    one = pack_stream_words(payload, srows)
    stots0 = np.asarray(stots)[0]
    dtbl = pack_rans_dtable(norm, tlog)
    da = (jnp.asarray(np.full(G, cs, np.int32)),
          jnp.asarray(np.broadcast_to(dtbl, (G,) + dtbl.shape).copy()),
          jnp.asarray(np.broadcast_to(np.asarray(fin)[0].reshape(8, 128),
                                      (G, 8, 128)).copy()),
          jnp.asarray(np.broadcast_to(one, (G, srows, 128)).copy()),
          jnp.asarray(np.broadcast_to(stots0, (G,) + stots0.shape).copy()))
    return dict(ea=ea, da=da, t4=t4, hcap=hcap, hrows=hrows, data=data,
                group_bytes=group_bytes)


def run_decode(name, nway, S, mib, proba):
    G = (35 // max(nway, 7)) * max(nway, 7) or nway
    G = max(G, nway)
    b = build(G, mib, proba)
    t4, hrows = b["t4"], b["hrows"]
    if S == 0:
        fn = lambda: rans_decode_v2(*b["da"], t4, hrows, False, TLOG)
    else:
        fn = lambda: rans_decode_w(*b["da"], t4, hrows, nway, TLOG, S)
    out, err = fn()
    assert not np.asarray(err).any(), name
    ob = np.asarray(out)[0].astype("<i4").tobytes()[: b["group_bytes"]]
    assert ob == b["data"], f"{name}: bytes wrong"
    gbps, ts = rate_b(lambda: fn()[1], G * b["group_bytes"])
    print(f"{name}: nway={nway} S={S} {mib}MiB p{proba:02d} G={G}  "
          f"{gbps:6.2f} GB/s  (t2 {ts[2]*1e3:.1f} t10 {ts[10]*1e3:.1f} ms)")
    return gbps


def run_decode_tot(name, nway, S, mib, proba):
    """FLAG_TOTALS wire (1 u16/step): row offsets recomputed in-kernel
    (2 chained matmuls on the serial path) — the ratio-over-speed wire."""
    G = (35 // max(nway, 7)) * max(nway, 7) or nway
    G = max(G, nway)
    b = build(G, mib, proba)
    t4, hrows = b["t4"], b["hrows"]
    da = list(b["da"])
    da[4] = jnp.sum(da[4], axis=2).astype(jnp.int32)  # [G,T] totals wire
    if S == 0:
        fn = lambda: rans_decode_v2(*da, t4, hrows, False, TLOG)
    else:
        fn = lambda: rans_decode_w(*da, t4, hrows, nway, TLOG, S)
    out, err = fn()
    assert not np.asarray(err).any(), name
    ob = np.asarray(out)[0].astype("<i4").tobytes()[: b["group_bytes"]]
    assert ob == b["data"], f"{name}: bytes wrong"
    gbps, ts = rate_b(lambda: fn()[1], G * b["group_bytes"])
    print(f"{name}: totals nway={nway} S={S} {mib}MiB p{proba:02d} G={G}  "
          f"{gbps:6.2f} GB/s  (t2 {ts[2]*1e3:.1f} t10 {ts[10]*1e3:.1f} ms)")
    return gbps


def build16(G, n_syms):
    """u16 Pareto-distance group broadcast to G (the u16dist workload)."""
    from finitestateentropy_tpu.turbo.rans16 import (_pad_n16,
                                                     parse_rans16_group,
                                                     rans16_compress)
    from finitestateentropy_tpu.turbo.rans_kernels import pack_rans16_dtable

    rng = np.random.default_rng(5)
    d = np.clip((rng.pareto(1.2, n_syms) * 50).astype(np.int64), 0,
                1023).astype(np.uint16)
    (n0, cs, tlog, flags, norm, max_sv, init, payload, stots), _ = \
        parse_rans16_group(rans16_compress(d))
    t2 = _pad_n16(n0) // 2048
    hrows = _round8((cs + 127) // 128 + 16)
    one = pack_stream_words(payload, stream_word_rows(hrows))
    dtbl = pack_rans16_dtable(norm)
    initw = init.view(np.int32).reshape(8, 128)
    da = (jnp.asarray(np.full(G, cs, np.int32)),
          jnp.asarray(np.broadcast_to(dtbl, (G,) + dtbl.shape).copy()),
          jnp.asarray(np.broadcast_to(initw, (G, 8, 128)).copy()),
          jnp.asarray(np.broadcast_to(one, (G, stream_word_rows(hrows), 128)).copy()),
          jnp.asarray(np.broadcast_to(stots.astype(np.int32),
                                      (G,) + stots.shape).copy()))
    return dict(da=da, t2=t2, hrows=hrows, tlog=tlog, d=d,
                group_bytes=2 * n_syms)


def run_decode16(name, nway, S, n_syms=1 << 19):
    """u16 wire (2048 symbols/step): v2 (S=0) vs windowed."""
    G = (35 // max(nway, 7)) * max(nway, 7) or nway
    G = max(G, nway)
    b = build16(G, n_syms)
    t2, hrows, tlog = b["t2"], b["hrows"], b["tlog"]
    if S == 0:
        fn = lambda: rans_decode_v2(*b["da"], t2, hrows, False, tlog, True)
    else:
        fn = lambda: rans_decode_w(*b["da"], t2, hrows, nway, tlog, S,
                                   False, True)
    out, err = fn()
    assert not np.asarray(err).any(), name
    got = np.asarray(out)[0].astype("<i4").reshape(-1).view(np.uint16)
    assert np.array_equal(got[: len(b["d"])], b["d"]), f"{name}: syms wrong"
    gbps, ts = rate_b(lambda: fn()[1], G * b["group_bytes"])
    print(f"{name}: u16 nway={nway} S={S} {b['group_bytes']>>20}MiB G={G}  "
          f"{gbps:6.2f} GB/s  (t2 {ts[2]*1e3:.1f} t10 {ts[10]*1e3:.1f} ms)")
    return gbps


def run_encode(name, rowloc, mib=1, proba=80, G=32):
    b = build(G, mib, proba)
    t4, hcap = b["t4"], b["hcap"]
    fn = lambda: rans_encode2(*b["ea"], t4, hcap, False, False, TLOG, True,
                              0, rowloc)
    np.asarray(fn()[2])
    gbps, ts = rate_b(lambda: fn()[2], G * b["group_bytes"])
    print(f"{name}: rowloc={rowloc} {mib}MiB p{proba:02d} G={G}  "
          f"{gbps:6.3f} GB/s  (t2 {ts[2]*1e3:.1f} t10 {ts[10]*1e3:.1f} ms)")
    return gbps


DEC = {
    "base": (7, 0, 1, 80),
    "baseg2": (7, 0, 2, 80),
    "baseg4": (7, 0, 4, 80),
    "basep02": (7, 0, 1, 2),
    "basep14": (7, 0, 1, 14),
    "w7s32": (7, 32, 1, 80),
    "w8s32": (8, 32, 1, 80),
    "w8s64": (8, 64, 1, 80),
    "w10s32": (10, 32, 1, 80),
    "w8s32g2": (8, 32, 2, 80),
    "w8s32g4": (8, 32, 4, 80),
    "w10s32g4": (10, 32, 4, 80),
    "w8s32p02": (8, 32, 1, 2),
    "w10s32p02": (10, 32, 1, 2),
    "w8s32p14": (8, 32, 1, 14),
    "w10s64": (10, 64, 1, 80),
    "w8s64p02": (8, 64, 1, 2),
    "w10s64p02": (10, 64, 1, 2),
    "w8s64p14": (8, 64, 1, 14),
    "w10s64p14": (10, 64, 1, 14),
    "w10s32p14": (10, 32, 1, 14),
}

# totals wire: (nway, S, mib, proba); S=0 -> resident v2
TOT = {
    "tbase": (7, 0, 1, 80),
    "tbaseg4": (7, 0, 4, 80),
    "tw8s32": (8, 32, 1, 80),
    "tw10s32": (10, 32, 1, 80),
    "tw8s32g4": (8, 32, 4, 80),
    "tw10s32g4": (10, 32, 4, 80),
}

# u16 wire: (nway, S, n_syms); S=0 -> resident v2
U16 = {
    "ubase": (7, 0, 1 << 19),
    "uw8s64": (8, 64, 1 << 19),
    "uw10s64": (10, 64, 1 << 19),
    "uw8s128": (8, 128, 1 << 19),
    "ubaseg4": (7, 0, 1 << 21),
    "uw8s64g4": (8, 64, 1 << 21),
    "uw8s128g4": (8, 128, 1 << 21),
    "uw10s64g4": (10, 64, 1 << 21),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "w8s32"]
    print("devices:", jax.devices())
    for nm in names:
        try:
            if nm == "enc":
                run_encode(nm, False)
            elif nm == "encrl":
                run_encode(nm, True)
            elif nm in TOT:
                run_decode_tot(nm, *TOT[nm])
            elif nm in U16:
                run_decode16(nm, *U16[nm])
            else:
                run_decode(nm, *DEC[nm])
        except Exception as ex:
            print(f"{nm}: FAILED: {type(ex).__name__}: {str(ex)[:300]}")
