"""Round-5 hardware probe: pair-wire dispatch calibration + windowed
totals-wire decode (VERDICT r4 items 1 and 2).

Measures queue-k GB/s (in ORIGINAL bytes) on the one real chip:
  (a) pair decode at tlog 9/10, groups 1/2/4 MiB, windowed 8-way S=64 vs
      resident v2 — calibrates _window_dispatch's pair crossover;
  (b) pair encode (rowloc vs plain) at tlog 9;
  (c) byte-wire TOTALS decode (FLAG_TOTALS, 1 u16/step) through the
      windowed kernel at 2/4 MiB — the ratio-8.65 point's speed
      (ROADMAP item 2, unmeasured in r4);
  (d) the production dispatch path end-to-end on p80 (what bench.py's
      headline will report).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from finitestateentropy_tpu.turbo.api import (_hrows_cap, _prep_group,
                                              _round8, _window_dispatch)
from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.pair import pair_compress, parse_pair_group
from finitestateentropy_tpu.turbo.rans16 import _pad_n16
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_pair_dtable, pack_rans_ctables, pack_rans_dtable, pack_stream_words,
    rans_decode_v2, rans_decode_w, rans_encode2, stream_word_rows,
    v2_pick_nway)
from finitestateentropy_tpu.utils import generate_proba


def rate(dispatch, bytes_per_call, k1=2, k2=10, reps=3):
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
    dt = ts[k2] - ts[k1]
    return 0.0 if dt <= 0 else (k2 - k1) * bytes_per_call / dt / 1e9


def rate3(dispatch, bpc):
    vals = []
    for _ in range(3):
        v = rate(dispatch, bpc)
        if v > 0:
            vals.append(v)
    return (float(np.median(vals)), min(vals), max(vals)) if vals else (0., 0., 0.)


def corpus(proba, nbytes):
    base = generate_proba(proba)
    return bytes((base * ((nbytes // len(base)) + 1))[:nbytes])


def pair_decode_sweep(G=56):
    for mb in (1, 2, 4):
        nbytes = mb << 20
        data = corpus(80, nbytes)
        for tlog in (9, 10):
            blob = pair_compress(data, table_log=tlog)
            (n, cs, tl, fl, norm, msv, init, payload, stots, pairs,
             esc), _ = parse_pair_group(blob)
            n_pairs = (n + 1) // 2
            t2 = _pad_n16(n_pairs) // 2048
            hrows = _round8((cs + 127) // 128 + 16)
            srows = stream_word_rows(hrows)
            tbl = pack_pair_dtable(norm, pairs, tl)
            da = (jnp.asarray(np.full(G, cs, np.int32)),
                  jnp.asarray(np.broadcast_to(tbl, (G,) + tbl.shape).copy()),
                  jnp.asarray(np.broadcast_to(
                      init.view(np.int32).reshape(8, 128), (G, 8, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      pack_stream_words(payload, srows), (G, srows, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      stots.astype(np.int32), (G,) + stots.shape).copy()))
            nv = v2_pick_nway(t2, hrows, tl, True, False, False, True)
            wn, ws = _window_dispatch(0, t2, hrows, tl, G, False, u16=True,
                                      pair=True)
            ratio = nbytes / len(blob)
            for name, fn in (
                ("win8 S=64", lambda: rans_decode_w(*da, t2, hrows, 8, tl, 64,
                                                    False, True, False, True)),
                (f"v2 nv={nv}", lambda: rans_decode_v2(*da, t2, hrows, False,
                                                       tl, True, False, True)),
            ):
                outw, err = fn()
                assert not np.asarray(err).any()
                pu = (np.asarray(outw)[0].astype("<i4").reshape(-1)
                      .view(np.uint16)[:n_pairs])
                assert pu.tobytes()[:n] == data
                med, lo, hi = rate3(lambda: fn()[1], G * nbytes)
                star = ("*" if (name.startswith("win") and wn) or
                        (name.startswith("v2") and not wn) else " ")
                print(f"pair {mb}MiB tlog{tl}: {name:10s} {med:6.2f} GB/s "
                      f"({lo:.2f}..{hi:.2f}) ratio {ratio:.2f} "
                      f"{star}dispatch", flush=True)


def pair_encode(G=56, nbytes=1 << 20):
    from finitestateentropy_tpu.turbo.pair import pair_plan, prep_pair_group
    data = corpus(80, nbytes)
    pp = prep_pair_group(data, 9)
    ids = pp["ids"]
    n_pad = _pad_n16(len(ids))
    t2 = n_pad // 2048
    hcap = _round8(n_pad // 128 + 16)
    fc, mg = pack_rans_ctables(pp["norm"])
    pad = np.full(n_pad, pp["mfi"], np.uint16)
    pad[: len(ids)] = ids
    srcw = pad.view("<u4").view(np.int32).reshape(t2 * 8, 128)
    ea = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(srcw, (G, t2 * 8, 128)).copy()))
    twin = pair_compress(data, table_log=9)
    (_n, cs_t, *_), _ = parse_pair_group(twin)
    for rowloc in (True, False):
        fn = lambda: rans_encode2(*ea, t2, hcap, False, True, 9, True, 0,
                                  rowloc)
        _s, _f, csize, _st = fn()
        assert int(np.asarray(csize)[0]) == cs_t, "encode diverged from twin"
        med, lo, hi = rate3(lambda: fn()[2], G * nbytes)
        print(f"pair encode tlog9 rowloc={rowloc}: {med:6.3f} GB/s "
              f"({lo:.3f}..{hi:.3f})", flush=True)


def totals_windowed(G=56):
    """Byte-wire FLAG_TOTALS decode through the windowed kernel (ROADMAP
    item 2): ratio 8.65+ at whatever nway buys back."""
    for mb in (2, 4):
        nbytes = mb << 20
        data = corpus(80, nbytes)
        src = np.frombuffer(data, np.uint8)
        norm, msv, ncount, mfs = _prep_group(src, 10)
        n_pad = _pad_n(nbytes)
        t4 = n_pad // TURBO_STEP_SYMS
        hcap = _hrows_cap(n_pad)
        fc, mg = pack_rans_ctables(norm)
        pad = np.full(n_pad, mfs, np.uint8)
        pad[:nbytes] = src
        srcw = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)
        a = (jnp.asarray(fc[None]), jnp.asarray(mg[None]),
             jnp.asarray(srcw[None]))
        stream, fin, csize, stots = rans_encode2(*a, t4, hcap, False, False,
                                                 10, True, 0, True)
        cs = int(np.asarray(csize)[0])
        stots_np = np.asarray(stots)[0]
        tots = stots_np.sum(axis=1).astype(np.int32)      # [T] u16 wire
        T = tots.shape[0]
        ratio = nbytes / (cs * 2 + 4096 + T * 2 + 64)
        hrows = _round8((cs + 127) // 128 + 16)
        srows = stream_word_rows(hrows)
        one = pack_stream_words(
            np.ascontiguousarray(np.asarray(stream)[0]).tobytes()[: 2 * cs],
            srows)
        dtbl = pack_rans_dtable(norm, 10)
        da = (jnp.asarray(np.full(G, cs, np.int32)),
              jnp.asarray(np.broadcast_to(dtbl, (G,) + dtbl.shape).copy()),
              jnp.asarray(np.broadcast_to(
                  np.asarray(fin)[0].reshape(8, 128), (G, 8, 128)).copy()),
              jnp.asarray(np.broadcast_to(one, (G, srows, 128)).copy()),
              jnp.asarray(np.broadcast_to(tots, (G, T)).copy()))
        nv = v2_pick_nway(t4, hrows, 10, False, True)
        for name, fn in (
            ("win8 S=32 totals", lambda: rans_decode_w(*da, t4, hrows, 8, 10,
                                                       32, False)),
            (f"v2t nv={nv}", lambda: rans_decode_v2(*da, t4, hrows, False,
                                                    10)),
        ):
            outw, err = fn()
            assert not np.asarray(err).any()
            ob = np.asarray(outw)[0].astype("<i4").tobytes()[:nbytes]
            assert ob == data
            med, lo, hi = rate3(lambda: fn()[1], G * nbytes)
            print(f"totals {mb}MiB tlog10: {name:18s} {med:6.2f} GB/s "
                  f"({lo:.2f}..{hi:.2f}) ratio {ratio:.2f}", flush=True)


def quad_sweep(G=56):
    """Quad wire (order-3, spc=1 kernels): decode + encode at tlog 9-11,
    groups 1/4 MiB."""
    from finitestateentropy_tpu.turbo.quad import (_pad_q, parse_quad_group,
                                                   prep_quad_group,
                                                   quad_compress)
    from finitestateentropy_tpu.turbo.rans_kernels import pack_quad_dtable

    for mb in (1, 4):
        nbytes = mb << 20
        data = corpus(80, nbytes)
        for tlog in (9, 10, 11):
            blob = quad_compress(data, table_log=tlog)
            (n, cs, tl, fl, norm, msv, init, payload, stots, quads,
             esc), _ = parse_quad_group(blob)
            n_quads = (n + 3) // 4
            steps = _pad_q(n_quads) // 1024
            hrows = _round8((cs + 127) // 128 + 16)
            srows = stream_word_rows(hrows)
            tbl = pack_quad_dtable(norm, quads, tl)
            da = (jnp.asarray(np.full(G, cs, np.int32)),
                  jnp.asarray(np.broadcast_to(tbl, (G,) + tbl.shape).copy()),
                  jnp.asarray(np.broadcast_to(
                      init.view(np.int32).reshape(8, 128), (G, 8, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      pack_stream_words(payload, srows), (G, srows, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      stots.astype(np.int32), (G,) + stots.shape).copy()))
            nv = v2_pick_nway(steps, hrows, tl, False, False, False, False,
                              True)
            fn = lambda: rans_decode_v2(*da, steps, hrows, False, tl, False,
                                        False, False, True)
            outw, err = fn()
            assert not np.asarray(err).any()
            from finitestateentropy_tpu.turbo.quad import apply_escapes
            qb = (np.asarray(outw)[0].astype("<i4").reshape(-1)
                  .view(np.uint32)[:n_quads].copy())
            assert apply_escapes(qb, esc).tobytes()[:n] == data
            med, lo, hi = rate3(lambda: fn()[1], G * nbytes)
            print(f"quad {mb}MiB tlog{tl}: v2 nv={nv:2d}  {med:6.2f} GB/s "
                  f"({lo:.2f}..{hi:.2f}) ratio {nbytes/len(blob):.2f}",
                  flush=True)
        # windowed quad (S=128 — spc=1 needs 128 steps per roff tile)
        for tlog in (9, 10, 11):
            blob = quad_compress(data, table_log=tlog)
            (n, cs, tl, fl, norm, msv, init, payload, stots, quads,
             esc), _ = parse_quad_group(blob)
            n_quads = (n + 3) // 4
            steps = _pad_q(n_quads) // 1024
            if steps % 128:
                continue
            hrows = _round8((cs + 127) // 128 + 16)
            srows = stream_word_rows(hrows)
            tbl = pack_quad_dtable(norm, quads, tl)
            da = (jnp.asarray(np.full(G, cs, np.int32)),
                  jnp.asarray(np.broadcast_to(tbl, (G,) + tbl.shape).copy()),
                  jnp.asarray(np.broadcast_to(
                      init.view(np.int32).reshape(8, 128), (G, 8, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      pack_stream_words(payload, srows), (G, srows, 128)).copy()),
                  jnp.asarray(np.broadcast_to(
                      stots.astype(np.int32), (G,) + stots.shape).copy()))
            for nw in (8,):
                fn = lambda: rans_decode_w(*da, steps, hrows, nw, tl, 128,
                                           False, False, False, False, True)
                outw, err = fn()
                assert not np.asarray(err).any()
                from finitestateentropy_tpu.turbo.quad import apply_escapes
                qb = (np.asarray(outw)[0].astype("<i4").reshape(-1)
                      .view(np.uint32)[:n_quads].copy())
                assert apply_escapes(qb, esc).tobytes()[:n] == data
                med, lo, hi = rate3(lambda: fn()[1], G * nbytes)
                print(f"quad {mb}MiB tlog{tl}: win{nw} S=128 {med:6.2f} GB/s "
                      f"({lo:.2f}..{hi:.2f})", flush=True)
        # encode at the default tlog
        qp = prep_quad_group(data)
        ids = qp["ids"]
        id_pad = _pad_q(len(ids))
        steps = id_pad // 1024
        hcap = _round8((id_pad + 127) // 128 + 16)
        fc, mg = pack_rans_ctables(qp["norm"])
        pad = np.full(id_pad, qp["mfi"], np.uint32)
        pad[: len(ids)] = ids
        srcw = pad.astype("<u4").view(np.int32).reshape(steps * 8, 128)
        ea = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
              jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
              jnp.asarray(np.broadcast_to(srcw, (G, steps * 8, 128)).copy()))
        fn = lambda: rans_encode2(*ea, steps, hcap, False, False, qp["tlog"],
                                  True, 0, True, True)
        fn()
        med, lo, hi = rate3(lambda: fn()[2], G * nbytes)
        print(f"quad {mb}MiB encode tlog{qp['tlog']} rowloc: {med:6.3f} GB/s "
              f"({lo:.3f}..{hi:.3f})", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "quad"):
        quad_sweep()
    if which in ("all", "pair"):
        pair_decode_sweep()
        pair_encode()
    if which in ("all", "totals"):
        totals_windowed()
