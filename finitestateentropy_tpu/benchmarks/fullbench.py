"""Per-stage micro-benchmarks — the reference's `fullbench` binary
(programs/fullbench.c:758-1237), same stage numbering:

  1  HIST_count(255)          20 HUF_compress             40 HUF_decompress4X1
  2  HIST_count(254)          21 HUF_buildCTable          41 HUF_readDTableX1
  3  HIST_countFast(254)      22 HUF_writeCTable          42 HUF_decompress4X1_usingDTable
  4  FSE_normalizeCount       23 HUF_compress4x_usingCT   45 HUF_decompress1X1
  5  FSE_writeNCount          25 HUF_readCTable           46 HUF_decompress1X1_usingDTable
  6  FSE_buildCTable          30 HUF_decompress           50 HUF_decompress4X2
  7  FSE_compress_usingCT     31 HUF_readStats            51 HUF_readDTableX2
  8  ..._smallDst             32 HUF_readDTable           52 HUF_decompress4X2_usingDTable
  9  FSE_compress             33 HUF_decompress_usingDT   55 HUF_decompress1X2
  11 FSE_readNCount                                       56 HUF_decompress1X2_usingDTable
  12 FSE_buildDTable          70 FSE_buildCTable_raw(6)
  13 FSE_decompress_usingDT   80 FSE_buildDTable(10)
  14 FSE_decompress           81 FSE_buildDTable(9)
                              82 FSE_buildDTable_raw(6)

bmi2 variants (24/43/47/53/57) and the experimental C histogram strategies
(100-107) are CPU-ISA experiments with no TPU analogue — not ported.

TPU-native stages (ours):

  200 turbo-rans encode kernel          202 rans table pack (host)
  201 turbo-rans decode kernel (v1)     203 group prep (hist+norm+ncount)
  204 turbo-rans decode kernel (v2, the default path)
  210 device fse_encode_batch           212 device huf_encode_4x_batch
  211 device fse_decode_batch           213 device huf_decode_4x1_batch

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


def _calibrated_device(dispatch, payload_bytes, k1=2, k2=10, reps=3):
    """Queue-k timing for device kernel stages (bench.py _rate_b): on the
    tunnel-attached box every sync costs ~25-35 ms, so per-call timing
    reports the tunnel; k async dispatches synced once amortize it."""
    np.asarray(dispatch())  # warm
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
    return (k2 - k1) * payload_bytes / dt if dt > 0 else 0.0


def _stages():
    from ..errors import FSEError
    from ..refimpl import fse, huf
    from ..refimpl.hist import hist_count
    from ..refimpl.ncount import fse_read_ncount, fse_write_ncount
    from ..refimpl.norm import fse_normalize_count, fse_optimal_table_log
    from ..refimpl.tables import (build_ctable, build_ctable_raw,
                                  build_dtable, build_dtable_raw)

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
    hdr = huf.huf_write_ctable(hct, max_sv)
    hblob = huf.huf_compress(data)
    # smaller counts for the tiny-table builds (reference uses tableLog 6/9/10)
    norm10, _ = fse_normalize_count(10, count[: max_sv + 1], n, max_sv)
    norm9, _ = fse_normalize_count(9, count[: max_sv + 1], n, max_sv)

    def small_dst():
        # reference local_FSE_compress_usingCTable_tooSmall: dst = src/2
        try:
            return fse.fse_compress_using_ctable(data, ct, dst_capacity=n // 2)
        except FSEError:
            return b""

    stages = {
        1: ("HIST_count(255)", lambda: hist_count(src, 255), n),
        2: ("HIST_count(254)", lambda: hist_count(src, 254), n),
        # the twin has one (trusted) counting path; countFast == count here
        3: ("HIST_countFast(254)", lambda: hist_count(src, 254), n),
        4: ("FSE_normalizeCount",
            lambda: fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv), n),
        5: ("FSE_writeNCount", lambda: fse_write_ncount(norm, max_sv, tlog), n),
        6: ("FSE_buildCTable", lambda: build_ctable(norm, max_sv, tlog), n),
        7: ("FSE_compress_usingCTable",
            lambda: fse.fse_compress_using_ctable(data, ct), n),
        8: ("FSE_compress_usingCTable_smallDst", small_dst, n),
        9: ("FSE_compress", lambda: fse.fse_compress(data), n),
        11: ("FSE_readNCount", lambda: fse_read_ncount(nc + b"\0" * 8), n),
        12: ("FSE_buildDTable", lambda: build_dtable(norm, max_sv, tlog), n),
        13: ("FSE_decompress_usingDTable",
             lambda: fse.fse_decompress_using_dtable(payload, dt, n), n),
        20: ("HUF_compress", lambda: huf.huf_compress(data), n),
        21: ("HUF_buildCTable", lambda: huf.huf_build_ctable(count, max_sv), n),
        22: ("HUF_writeCTable", lambda: huf.huf_write_ctable(hct, max_sv), n),
        23: ("HUF_compress4x_usingCTable",
             lambda: huf.huf_compress_4x_using_ctable(data, hct, 2 * n), n),
        25: ("HUF_readCTable", lambda: huf.huf_read_ctable(hdr), n),
        31: ("HUF_readStats", lambda: huf.huf_read_stats(hdr), n),
        70: ("FSE_buildCTable_raw(6)", lambda: build_ctable_raw(6), n),
        80: ("FSE_buildDTable(10)",
             lambda: build_dtable(norm10, max_sv, 10), n),
        81: ("FSE_buildDTable(9)", lambda: build_dtable(norm9, max_sv, 9), n),
        82: ("FSE_buildDTable_raw(6)", lambda: build_dtable_raw(6), n),
    }
    fblob = fse.fse_compress(data)
    if fblob.kind.name == "COMPRESSED":
        fb = fblob.data
        stages[14] = ("FSE_decompress", lambda: fse.fse_decompress(fb, n), n)
    if hblob.kind.name == "COMPRESSED":
        hb = hblob.data
        dt1 = huf.huf_read_dtable_x1(hb)[0]
        dt2 = huf.huf_read_dtable_x2(hb)[0]
        used1 = huf.huf_read_dtable_x1(hb)[1]
        used2 = huf.huf_read_dtable_x2(hb)[1]
        body1, body2 = hb[used1:], hb[used2:]
        one = huf.huf_compress(data, four_streams=False)
        stages.update({
            30: ("HUF_decompress", lambda: huf.huf_decompress(hb, n), n),
            32: ("HUF_readDTable(X1)",
                 lambda: huf.huf_read_dtable_x1(hb), n),
            33: ("HUF_decompress_usingDTable(X1)",
                 lambda: huf.huf_decompress_4x1_using_dtable(body1, n, dt1), n),
            40: ("HUF_decompress4X1",
                 lambda: huf.huf_decompress_4x1(hb, n), n),
            41: ("HUF_readDTableX1", lambda: huf.huf_read_dtable_x1(hb), n),
            42: ("HUF_decompress4X1_usingDTable",
                 lambda: huf.huf_decompress_4x1_using_dtable(body1, n, dt1), n),
            50: ("HUF_decompress4X2",
                 lambda: huf.huf_decompress_4x2(hb, n), n),
            51: ("HUF_readDTableX2", lambda: huf.huf_read_dtable_x2(hb), n),
            52: ("HUF_decompress4X2_usingDTable",
                 lambda: huf.huf_decompress_4x2_using_dtable(body2, n, dt2), n),
        })
        if one.kind.name == "COMPRESSED":
            ob = one.data
            odt1, oused1 = huf.huf_read_dtable_x1(ob)[:2]
            odt2, oused2 = huf.huf_read_dtable_x2(ob)[:2]
            obody1, obody2 = ob[oused1:], ob[oused2:]
            stages.update({
                45: ("HUF_decompress1X1",
                     lambda: huf.huf_decompress_1x1(ob, n), n),
                46: ("HUF_decompress1X1_usingDTable",
                     lambda: huf.huf_decompress_1x1_using_dtable(
                         obody1, n, odt1), n),
                55: ("HUF_decompress1X2",
                     lambda: huf.huf_decompress_1x2(ob, n), n),
                56: ("HUF_decompress1X2_usingDTable",
                     lambda: huf.huf_decompress_1x2_using_dtable(
                         obody2, n, odt2), n),
            })
    return stages


def _turbo_stages():
    import jax.numpy as jnp

    from ..turbo.api import _hrows_cap, _prep_group, _round8
    from ..turbo.format import TURBO_STEP_SYMS, _pad_n
    from ..turbo.rans_kernels import (pack_rans_ctables, pack_rans_dtable,
                                      pack_stream_words, rans_decode,
                                      rans_decode_v2, rans_decode_w,
                                      rans_encode, rans_encode2,
                                      stream_word_rows)

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

    stream, fin, csize, _stots = rans_encode2(fcb, mgb, srcw, t4, hcap)
    cs = int(np.asarray(csize)[0])
    hrows = _round8((cs + 127) // 128 + 16)
    srows = stream_word_rows(hrows)
    payload = np.ascontiguousarray(np.asarray(stream)[0]).tobytes()[: 2 * cs]
    hws = np.broadcast_to(pack_stream_words(payload, srows),
                          (G, srows, 128)).copy()
    dargs = (jnp.asarray(np.full(G, cs, np.int32)),
             jnp.asarray(np.broadcast_to(pack_rans_dtable(norm), (G, 16, 128)).copy()),
             jnp.asarray(np.broadcast_to(np.asarray(fin)[0], (G, 8, 128)).copy()),
             jnp.asarray(hws))
    rans_decode(*dargs, t4, hrows)
    st0 = np.asarray(_stots)[0]
    dargs2 = dargs + (jnp.asarray(np.broadcast_to(st0, (G,) + st0.shape).copy()),)
    rans_decode_v2(*dargs2, t4, hrows)

    total = G * gsz
    # device kernel stages return UNsynced values; main() times them with
    # the queue-k method (_calibrated_device) — the "device" marker
    return {
        200: ("turbo_rans_encode (kernel)",
              lambda: rans_encode2(fcb, mgb, srcw, t4, hcap)[2], total,
              "device"),
        205: ("turbo_rans_encode (kernel, v1 halfword-out)",
              lambda: rans_encode(fcb, mgb, srcw, t4, hcap)[2], total,
              "device"),
        201: ("turbo_rans_decode (kernel)",
              lambda: rans_decode(*dargs, t4, hrows)[1], total, "device"),
        202: ("rans table pack (host)", lambda: pack_rans_dtable(norm), gsz),
        203: ("group prep (hist+norm+ncount)", lambda: _prep_group(src), gsz),
        204: ("turbo_rans_decode (kernel, v2)",
              lambda: rans_decode_v2(*dargs2, t4, hrows)[1], total,
              "device"),
        206: ("turbo_rans_decode (kernel, HBM-windowed 8-way S=64)",
              lambda: rans_decode_w(*dargs2, t4, hrows, 8, 11, 64)[1],
              total, "device"),
        207: ("turbo_rans_encode (kernel, row-local placement)",
              lambda: rans_encode2(fcb, mgb, srcw, t4, hcap, False, False,
                                   11, True, 0, True)[2], total, "device"),
        **_multibyte_stages(G),
    }


def _multibyte_stages(G):
    """r5 pair/quad wires (stages 208/209/215/216): the production
    dispatch's multi-byte decode/encode kernels on the same p80 corpus."""
    import jax.numpy as jnp

    from ..turbo.api import _round8
    from ..turbo.pair import PAIR_TABLELOG, pair_compress, parse_pair_group
    from ..turbo.quad import (QUAD_TABLELOG, _pad_q, parse_quad_group,
                              prep_quad_group, quad_compress)
    from ..turbo.rans16 import _pad_n16
    from ..turbo.rans_kernels import (pack_pair_dtable, pack_quad_dtable,
                                      pack_rans_ctables, pack_stream_words,
                                      rans_decode_w, rans_encode2,
                                      stream_word_rows)

    gsz = 1 << 20
    # p80: the multi-byte wires need a cappable super-symbol alphabet
    # (P_DEFAULT=20% is pair/quad-INELIGIBLE by design — the dispatch
    # falls back to the byte wire there)
    base = generate_proba(80)
    data = bytes((base * ((gsz // len(base)) + 1))[:gsz])
    total = G * gsz

    pb = pair_compress(data, table_log=PAIR_TABLELOG)
    if pb is None:
        return {}
    (n, cs, tl, fl, norm, msv, init, payload, stots, pairs,
     _e), _ = parse_pair_group(pb)
    t2 = _pad_n16((n + 1) // 2) // 2048
    hrows = _round8((cs + 127) // 128 + 16)
    srows = stream_word_rows(hrows)
    tblp = pack_pair_dtable(norm, pairs, tl)
    dp = (jnp.asarray(np.full(G, cs, np.int32)),
          jnp.asarray(np.broadcast_to(tblp, (G,) + tblp.shape).copy()),
          jnp.asarray(np.broadcast_to(init.view(np.int32).reshape(8, 128),
                                      (G, 8, 128)).copy()),
          jnp.asarray(np.broadcast_to(pack_stream_words(payload, srows),
                                      (G, srows, 128)).copy()),
          jnp.asarray(np.broadcast_to(stots.astype(np.int32),
                                      (G,) + stots.shape).copy()))

    qb = quad_compress(data, table_log=QUAD_TABLELOG)
    (qn, qcs, qtl, _qf, qnorm, _qm, qinit, qpay, qst, quads,
     _qe), _ = parse_quad_group(qb)
    steps = _pad_q((qn + 3) // 4) // 1024
    qhrows = _round8((qcs + 127) // 128 + 16)
    qsrows = stream_word_rows(qhrows)
    tblq = pack_quad_dtable(qnorm, quads, qtl)
    dq = (jnp.asarray(np.full(G, qcs, np.int32)),
          jnp.asarray(np.broadcast_to(tblq, (G,) + tblq.shape).copy()),
          jnp.asarray(np.broadcast_to(qinit.view(np.int32).reshape(8, 128),
                                      (G, 8, 128)).copy()),
          jnp.asarray(np.broadcast_to(pack_stream_words(qpay, qsrows),
                                      (G, qsrows, 128)).copy()),
          jnp.asarray(np.broadcast_to(qst.astype(np.int32),
                                      (G,) + qst.shape).copy()))

    qp = prep_quad_group(data)
    qid_pad = _pad_q(len(qp["ids"]))
    qfc, qmg = pack_rans_ctables(qp["norm"])
    qpad = np.full(qid_pad, qp["mfi"], np.uint32)
    qpad[: len(qp["ids"])] = qp["ids"]
    qea = (jnp.asarray(np.broadcast_to(qfc, (G, 2, 128)).copy()),
           jnp.asarray(np.broadcast_to(qmg, (G, 2, 128)).copy()),
           jnp.asarray(np.broadcast_to(
               qpad.astype("<u4").view(np.int32).reshape(steps * 8, 128),
               (G, steps * 8, 128)).copy()))
    qhcap = _round8((qid_pad + 127) // 128 + 16)

    return {
        208: ("turbo PAIR decode (kernel, windowed 8-way — r5)",
              lambda: rans_decode_w(*dp, t2, hrows, 8, tl, 64, False,
                                    True, False, True)[1], total, "device"),
        209: ("turbo QUAD decode (kernel, windowed 8-way S=128 — r5 "
              "production default on p80)",
              lambda: rans_decode_w(*dq, steps, qhrows, 8, qtl, 128, False,
                                    False, False, False, True)[1], total,
              "device"),
        215: ("turbo QUAD encode (kernel, spc=1 rowloc — r5)",
              lambda: rans_encode2(*qea, steps, qhcap, False, False, qtl,
                                   True, 0, True, True)[2], total, "device"),
    }


def _device_compat_stages():
    """Batched compat (wire-identical) device pipelines — the VERDICT r1
    ask: a recorded throughput number for every compat device path."""
    from ..models.fse_codec import FseTpuCodec
    from ..models.huf_codec import HufTpuCodec

    bs = 32768
    nblk = 64
    data = generate_proba(P_DEFAULT)[: bs * nblk]
    blocks = [data[i: i + bs] for i in range(0, len(data), bs)]
    fse_c = FseTpuCodec(block_size=bs)
    huf_c = HufTpuCodec(block_size=bs)
    huf_x2 = HufTpuCodec(block_size=bs, decoder="x2")
    fres = fse_c.compress_blocks(blocks)
    hres = huf_c.compress_blocks(blocks)
    fitems = [(r.data, len(b)) for b, r in zip(blocks, fres)
              if r.kind.name == "COMPRESSED"]
    hitems = [(r.data, len(b)) for b, r in zip(blocks, hres)
              if r.kind.name == "COMPRESSED"]
    n = len(data)
    return {
        210: ("device fse_encode_batch (compat)",
              lambda: fse_c.compress_blocks(blocks), n),
        211: ("device fse_decode_batch (compat)",
              lambda: fse_c.decompress_blocks(fitems), bs * len(fitems)),
        212: ("device huf_encode_4x_batch (compat)",
              lambda: huf_c.compress_blocks(blocks), n),
        213: ("device huf_decode_4x1_batch (compat)",
              lambda: huf_c.decompress_blocks(hitems), bs * len(hitems)),
        214: ("device huf_decode_4x2_batch (compat)",
              lambda: huf_x2.decompress_blocks(hitems), bs * len(hitems)),
    }


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    want = [int(a) for a in argv if a.isdigit()] or None

    stages = _stages()
    if want is None or any(w >= 200 for w in want):
        try:
            stages.update(_turbo_stages())
            stages.update(_device_compat_stages())
        except Exception as e:  # no TPU available etc.
            print(f"device stages unavailable: {e}", file=sys.stderr)

    for num in sorted(stages):
        if want and num not in want:
            continue
        name, fn, payload = stages[num][:3]
        if len(stages[num]) > 3 and stages[num][3] == "device":
            rate = _calibrated_device(fn, payload)
        else:
            rate = _calibrated(fn, payload)
        print(f"{num:3d} {name:38s} {rate/1e6:10.1f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
