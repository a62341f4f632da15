"""Per-stage micro-benchmarks — the reference's `fullbench` binary
(programs/fullbench.c), keeping its stage numbering where the stage exists:

  1  HIST_count                      11 FSE_readNCount
  4  FSE_normalizeCount              12 FSE_buildDTable
  5  FSE_writeNCount                 13 FSE_decompress_usingDTable
  6  FSE_buildCTable                 20 HUF_buildCTable
  7  FSE_compress_usingCTable        21 HUF_writeCTable
                                     30 HUF_decompress4X1
                                     32 HUF_decompress4X2

TPU turbo stages (ours, numbered 100+ like fullbench's experimental range):

  100 turbo-rans encode kernel          102 rans table pack (host)
  101 turbo-rans decode kernel (v1)     103 group prep (hist+norm+ncount)
  104 turbo-rans decode kernel (v2, the default path)

Usage: python -m finitestateentropy_tpu.benchmarks.fullbench [stage ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ..utils import generate_proba

P_DEFAULT = 20  # reference fullbench generates 20% proba data (BMK_genData)


def _calibrated(fn, payload_bytes, min_time=0.25):
    fn()  # warm
    n, t = 0, 0.0
    t0 = time.perf_counter()
    while t < min_time:
        fn()
        n += 1
        t = time.perf_counter() - t0
    return payload_bytes * n / t


def _stages():
    from ..refimpl import fse, huf
    from ..refimpl.hist import hist_count
    from ..refimpl.ncount import fse_read_ncount, fse_write_ncount
    from ..refimpl.norm import fse_normalize_count, fse_optimal_table_log
    from ..refimpl.tables import build_ctable, build_dtable

    data = generate_proba(P_DEFAULT)[:65536]
    src = np.frombuffer(data, np.uint8)
    n = len(src)
    count, max_sv, _ = hist_count(src, 255)
    tlog = fse_optimal_table_log(11, n, max_sv)
    norm, tlog = fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv)
    nc = fse_write_ncount(norm, max_sv, tlog)
    ct = build_ctable(norm, max_sv, tlog)
    dt = build_dtable(norm, max_sv, tlog)
    payload = fse.fse_compress_using_ctable(data, ct)
    hct = huf.huf_build_ctable(count, max_sv)
    hblob = huf.huf_compress(data)

    stages = {
        1: ("HIST_count", lambda: hist_count(src, 255), n),
        4: ("FSE_normalizeCount",
            lambda: fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv), n),
        5: ("FSE_writeNCount", lambda: fse_write_ncount(norm, max_sv, tlog), n),
        6: ("FSE_buildCTable", lambda: build_ctable(norm, max_sv, tlog), n),
        7: ("FSE_compress_usingCTable",
            lambda: fse.fse_compress_using_ctable(data, ct), n),
        11: ("FSE_readNCount", lambda: fse_read_ncount(nc + b"\0" * 8), n),
        12: ("FSE_buildDTable", lambda: build_dtable(norm, max_sv, tlog), n),
        13: ("FSE_decompress_usingDTable",
             lambda: fse.fse_decompress_using_dtable(payload, dt, n), n),
        20: ("HUF_buildCTable", lambda: huf.huf_build_ctable(count, max_sv), n),
        21: ("HUF_writeCTable", lambda: huf.huf_write_ctable(hct, max_sv), n),
    }
    if hblob.kind.name == "COMPRESSED":
        stages[30] = ("HUF_decompress4X1",
                      lambda: huf.huf_decompress_4x1(hblob.data, n), n)
        stages[32] = ("HUF_decompress4X2",
                      lambda: huf.huf_decompress_4x2(hblob.data, n), n)
    return stages


def _turbo_stages():
    import jax.numpy as jnp

    from ..turbo.api import _hrows_cap, _prep_group, _round8
    from ..turbo.format import TURBO_STEP_SYMS, _pad_n
    from ..turbo.rans_kernels import (pack_rans_ctables, pack_rans_dtable,
                                      rans_decode, rans_decode_v2, rans_encode)

    gsz = 1 << 20
    base = generate_proba(P_DEFAULT)
    data = (base * ((gsz // len(base)) + 1))[:gsz]
    src = np.frombuffer(data, np.uint8)
    norm, max_sv, ncount, mfs = _prep_group(src)
    n_pad = _pad_n(gsz)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _hrows_cap(n_pad)
    fc, mg = pack_rans_ctables(norm)
    G = 16
    fcb = jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy())
    mgb = jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy())
    pad = np.full(n_pad, mfs, np.uint8)
    pad[:gsz] = src
    srcw = jnp.asarray(np.broadcast_to(
        pad.view("<u4").view(np.int32).reshape(t4 * 8, 128), (G, t4 * 8, 128)).copy())

    stream, fin, csize, _stots = rans_encode(fcb, mgb, srcw, t4, hcap)
    cs = int(np.asarray(csize)[0])
    hrows = _round8((cs + 127) // 128 + 16)
    hw = np.asarray(stream)[0].reshape(-1)[:cs]
    hws = np.zeros((G, hrows, 128), np.int32)
    hws.reshape(G, -1)[:, :cs] = hw
    dargs = (jnp.asarray(np.full(G, cs, np.int32)),
             jnp.asarray(np.broadcast_to(pack_rans_dtable(norm), (G, 16, 128)).copy()),
             jnp.asarray(np.broadcast_to(np.asarray(fin)[0], (G, 8, 128)).copy()),
             jnp.asarray(hws))
    rans_decode(*dargs, t4, hrows)
    st0 = np.asarray(_stots)[0]
    dargs2 = dargs + (jnp.asarray(np.broadcast_to(st0, (G,) + st0.shape).copy()),)
    rans_decode_v2(*dargs2, t4, hrows)

    total = G * gsz
    return {
        100: ("turbo_rans_encode (kernel)",
              lambda: np.asarray(rans_encode(fcb, mgb, srcw, t4, hcap)[2]), total),
        101: ("turbo_rans_decode (kernel)",
              lambda: np.asarray(rans_decode(*dargs, t4, hrows)[1]), total),
        102: ("rans table pack (host)", lambda: pack_rans_dtable(norm), gsz),
        103: ("group prep (hist+norm+ncount)", lambda: _prep_group(src), gsz),
        104: ("turbo_rans_decode (kernel, v2)",
              lambda: np.asarray(rans_decode_v2(*dargs2, t4, hrows)[1]), total),
    }


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    want = [int(a) for a in argv if a.isdigit()] or None

    stages = _stages()
    if want is None or any(w >= 100 for w in want):
        try:
            stages.update(_turbo_stages())
        except Exception as e:  # no TPU available etc.
            print(f"turbo stages unavailable: {e}", file=sys.stderr)

    for num in sorted(stages):
        if want and num not in want:
            continue
        name, fn, payload = stages[num]
        rate = _calibrated(fn, payload)
        print(f"{num:3d} {name:34s} {rate/1e6:10.1f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
