"""Probe: pair-wire (order-1, 2 bytes/step) kernel rates on hardware.

Measures queue-k decode GB/s (in ORIGINAL bytes) for the pair wire at
tableLog 10/11 through the windowed + resident kernels, and pair encode
through rans_encode2 (u16 mode, 2-chunk tables), against the shipped byte
wire on the same corpus.  VERDICT r4 item 1.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from finitestateentropy_tpu.turbo.pair import pair_compress, parse_pair_group
from finitestateentropy_tpu.turbo.rans16 import _pad_n16
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_pair_dtable, pack_rans_ctables, pack_stream_words, rans_decode_v2,
    rans_decode_w, rans_encode2, stream_word_rows, v2_pick_nway)
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


def main():
    G = 56
    nbytes = 1 << 20
    raw = generate_proba(80)
    data = bytes((raw * ((nbytes // len(raw)) + 1))[:nbytes])

    for tlog in (10, 11):
        blob = pair_compress(data, table_log=tlog)
        (n, cs, tl, flags, norm, max_sv, init, payload, stots, pairs,
         esc), _ = parse_pair_group(blob)
        n_pairs = (n + 1) // 2
        n_pad = _pad_n16(n_pairs)
        t2 = n_pad // 2048
        hrows = ((cs + 127) // 128 + 16 + 7) // 8 * 8
        srows = stream_word_rows(hrows)
        tbl = pack_pair_dtable(norm, pairs, tl)
        hws = pack_stream_words(payload, srows)
        da = (jnp.asarray(np.full(G, cs, np.int32)),
              jnp.asarray(np.broadcast_to(tbl, (G,) + tbl.shape).copy()),
              jnp.asarray(np.broadcast_to(init.view(np.int32).reshape(8, 128),
                                          (G, 8, 128)).copy()),
              jnp.asarray(np.broadcast_to(hws, (G, srows, 128)).copy()),
              jnp.asarray(np.broadcast_to(stots.astype(np.int32),
                                          (G,) + stots.shape).copy()))
        print(f"--- pair tlog {tl}: ratio {len(data)/len(blob):.3f}, "
              f"t2={t2}, v2 nway={v2_pick_nway(t2, hrows, tl, True, False, False, True)}")
        # windowed 8-way S=64
        for nway in (8, 10):
            fn = lambda: rans_decode_w(*da, t2, hrows, nway, tl, 64, False,
                                       True, False, True)
            outw, err = fn()
            assert not np.asarray(err).any()
            pu = (np.asarray(outw)[0].astype("<i4").reshape(-1)
                  .view(np.uint16)[:n_pairs])
            assert pu.tobytes()[:n] == data
            for _ in range(2):
                print(f"pair tlog{tl} windowed {nway}-way S=64: "
                      f"{rate(lambda: fn()[1], G * nbytes):6.2f} GB/s")
        # resident v2
        fn2 = lambda: rans_decode_v2(*da, t2, hrows, False, tl, True, False,
                                     True)
        outw, err = fn2()
        assert not np.asarray(err).any()
        for _ in range(2):
            print(f"pair tlog{tl} resident v2:      "
                  f"{rate(lambda: fn2()[1], G * nbytes):6.2f} GB/s")

    # --- encode: u16 mode, 2-chunk tables, rowloc and plain
    blob = pair_compress(data, table_log=10)
    (n, cs, tl, flags, norm, max_sv, init, payload, stots, pairs,
     esc), _ = parse_pair_group(blob)
    from finitestateentropy_tpu.turbo.pair import pair_plan
    plan = pair_plan(data)
    ids = plan["ids"]
    n_pad = _pad_n16(len(ids))
    t2 = n_pad // 2048
    hcap = (n_pad // 128 + 16 + 7) // 8 * 8
    fc, mg = pack_rans_ctables(norm)
    mfi = int(plan["counts"].argmax())
    pad = np.full(n_pad, mfi, np.uint16)
    pad[: len(ids)] = ids
    srcw = pad.view("<u4").view(np.int32).reshape(t2 * 8, 128)
    ea = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(srcw, (G, t2 * 8, 128)).copy()))
    for rowloc in (True, False):
        fn = lambda: rans_encode2(ea[0], ea[1], ea[2], t2, hcap, False, True,
                                  10, True, 0, rowloc)
        stream, fin, csize, st = fn()
        csd = int(np.asarray(csize)[0])
        pay = np.ascontiguousarray(np.asarray(stream)[0]).tobytes()[: 2 * csd]
        match = pay == payload and csd == cs
        print(f"pair encode rowloc={rowloc}: wire-exact vs twin: {match}")
        for _ in range(2):
            print(f"pair encode rowloc={rowloc}: "
                  f"{rate(lambda: fn()[2], G * nbytes):6.2f} GB/s")


if __name__ == "__main__":
    main()
