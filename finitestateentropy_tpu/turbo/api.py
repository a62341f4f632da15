"""TurboRANS device API: whole-buffer compress/decompress on TPU.

Host side does per-group stats + table packing (cheap: histogram +
normalization + NCount, all O(group) numpy); the coder chains run in the
Pallas kernels.  Groups of equal padded size batch into one kernel launch.
"""
from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..refimpl.hist import hist_count
from ..utils.debug import debuglog
from ..refimpl.ncount import fse_write_ncount
from ..refimpl.norm import fse_normalize_count, fse_optimal_table_log
from .format import TURBO_LANES, TURBO_STEP_SYMS, _pad_n
from .rans import (FLAG_RAW, FLAG_RLE, FLAG_ROWS4, FLAG_STEPTOTS,
                   FLAG_TOTALS, _pack_rows4,
                   RANS_MAGIC, RANS_TABLELOG, _HDR, parse_rans_group)
from .pair import (FLAG_PAIR, PAIR_TABLELOG, apply_escapes, predicted_bits,
                   prep_pair_group)
from .quad import FLAG_QUAD, QUAD_TABLELOG, _pad_q, prep_quad_group
from .rans_kernels import (pack_pair_dtable, pack_quad_dtable,
                           pack_rans_ctables,
                           pack_rans_dtable, rans_decode,
                           rans_decode_v2, rans_encode, rans_encode2,
                           stream_word_rows)

DEFAULT_GROUP = 1 << 20
MAX_GROUP = 4 << 20   # encode2 chunks src reads; out buffer bounds this

# auto dispatch gives the multi-byte wires this much predicted-size slack
# over the best candidate: the measured trades on p80 1 MiB groups (v5e,
# tools/probe_r5.py) are -2.8% ratio for 2.0x decode (pair@9: 37.5 GB/s)
# and -6.4% for 2.6x (quad@10: 47.6 GB/s) vs the byte wire's 18.5 @ 8.30
# — the reference itself ships Huff0 at -28% ratio for 3x (README.md:32-33)
PAIR_RATIO_GIVE = 0.07


def _round8(x: int) -> int:
    return (x + 7) // 8 * 8


def _hrows_cap(n_pad: int) -> int:
    # <= 1 halfword per symbol; round rows to a multiple of 8 + slack
    return _round8((n_pad + 127) // 128 + 16)


def _prep_group(chunk: np.ndarray, table_log: int = RANS_TABLELOG):
    """Host stats for one group; returns None for RLE/raw-destined groups
    (RLE when every byte is equal; raw when near-uniform, the reference's
    maxCount <= srcSize>>7 heuristic, fse_compress.c:653-655)."""
    n = len(chunk)
    count, max_sv, max_count = hist_count(chunk, 255)
    if max_count == n or max_count <= (n >> 7):
        return None
    tlog = min(table_log, fse_optimal_table_log(table_log, n, max_sv))
    norm, tlog = fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv)
    if tlog != table_log:
        # re-normalize at the requested static tableLog (always legal for
        # group-scale inputs)
        norm, tlog = fse_normalize_count(table_log, count[: max_sv + 1], n, max_sv)
    ncount = fse_write_ncount(norm, max_sv, tlog)
    mfs = int(count.argmax())
    return np.asarray(norm, np.int32), max_sv, ncount, mfs


def prep_group(chunk: np.ndarray, table_log: int = RANS_TABLELOG):
    """_prep_group via the native C library when available (bit-exact)."""
    from .. import native

    if native.available():
        r = native.prep_group_native(bytes(chunk), table_log)
        if r != "fallback":
            return r  # stats tuple, or None for RLE groups
    return _prep_group(chunk, table_log)


def _pad_groups(arrs, m: int):
    """Pad leading group dim to a multiple of m (dup of last group)."""
    G = arrs[0].shape[0]
    pad = (-G) % m
    if pad == 0:
        return arrs
    return [np.concatenate([a] + [a[-1:]] * pad, axis=0) for a in arrs]


def _wire_ests(ch: np.ndarray, prep_byte, tlog_byte: int, pp, qp):
    """Predicted group sizes (payload + per-wire sections; the 4 KiB init
    and 16 B header are wire-independent and cancel) for the byte wire and
    — when eligible — the pair (order-1) and quad (order-3) wires."""
    from .rans16 import _pad_n16

    n = len(ch)
    norm_b, max_sv, ncount_b, _mfs = prep_byte
    counts_b = np.bincount(ch, minlength=max_sv + 1)[: max_sv + 1]
    # 4 B/step rows4 steptots assumed on every side (cancels any bias)
    ests = {"byte": (predicted_bits(norm_b, counts_b, tlog_byte) / 8
                     + len(ncount_b) + 4 * (_pad_n(n) // TURBO_LANES))}
    if pp is not None:
        ests["pair"] = (predicted_bits(pp["norm"], pp["counts"], pp["tlog"])
                        / 8 + len(pp["sections"])
                        + 4 * (_pad_n16((n + 1) // 2) // TURBO_LANES))
    if qp is not None:
        ests["quad"] = (predicted_bits(qp["norm"], qp["counts"], qp["tlog"])
                        / 8 + len(qp["sections"])
                        + 4 * (_pad_q((n + 3) // 4) // TURBO_LANES))
    return ests


def _pick_wire(ch: np.ndarray, prep_byte, tlog_byte: int, pp, qp,
               pair_mode: int, quad_mode: int) -> str:
    """Auto dispatch across the byte / pair / quad wires: the FASTEST
    eligible wire whose predicted size is within PAIR_RATIO_GIVE of the
    best candidate wins (quad decodes 4 bytes/step, pair 2, byte 1 —
    the same speed-for-ratio call the reference makes shipping Huff0,
    README.md:32-33).  Force modes (mode == 1) shortcut the estimate."""
    if quad_mode == 1 and qp is not None:
        return "quad"
    if pair_mode == 1 and pp is not None:
        return "pair"
    ests = _wire_ests(ch, prep_byte, tlog_byte,
                      pp if pair_mode != 0 else None,
                      qp if quad_mode != 0 else None)
    best = min(ests.values())
    for wire in ("quad", "pair"):        # fastest first
        if wire in ests and ests[wire] <= best * (1 + PAIR_RATIO_GIVE):
            return wire
    return "byte"


def _pair_wins(ch: np.ndarray, prep_byte, tlog_byte: int, pp,
               force: bool) -> bool:
    """Pair-vs-byte dispatch (kept for the bench/tests; the production
    three-way pick is _pick_wire)."""
    if pp is None:
        return False
    if force:
        return True
    return _pick_wire(ch, prep_byte, tlog_byte, pp, None, -1, 0) == "pair"


def turbo_compress_device(data: bytes, group_size: int = DEFAULT_GROUP,
                          interpret: bool = False,
                          table_log: int = 0,
                          steptots: bool = True, mesh: int = 0,
                          totals_only: bool = False,
                          pair: int = -1,
                          pair_table_log: int = 0,
                          quad: int = -1,
                          quad_table_log: int = 0) -> bytes:
    """Compress with the TurboRANS Pallas encode kernel.

    steptots=True (speed mode) ships per-step renorm counts (+~0.8% of the
    RAW size) enabling the faster v2 decode kernel; False = best ratio.
    totals_only=True ships 1 u16/step instead of 8 u8/step: 4x smaller
    section (+0.4 ratio at 1 MiB groups) at ~0.4x decode speed (the
    decoder's rank needs two chained matmuls instead of one fused one).
    mesh > 1 shards group batches data-parallel over that many devices
    (the reference's block-independence seam, fileio.c:292, at group
    granularity).  table_log=0 = mode default (10 speed / 11 ratio).

    pair / quad select the multi-byte wires (turbo/pair.py order-1 — 2
    bytes per decode step; turbo/quad.py order-3 — 4 bytes per step): -1
    (default) auto-picks per group the FASTEST wire whose predicted size
    is within PAIR_RATIO_GIVE of the best candidate; 0 disables; 1 forces
    when eligible (quad beats pair when both are forced).
    pair_table_log / quad_table_log = 0 pick the wire defaults.  The
    totals_only and steptots=False wires have no multi-byte variants, so
    those modes disable them (quad is steptots-only by format)."""
    import jax.numpy as jnp

    from .rans import RANS_SPEED_TABLELOG

    if table_log == 0:
        table_log = RANS_SPEED_TABLELOG if steptots else RANS_TABLELOG
    if totals_only:
        pair = 0
        quad = 0
    if not steptots:
        quad = 0                    # the quad wire is steptots-only
        if pair == -1:
            pair = 0                # ratio mode: multi-byte wires are a
                                    # speed play; auto stays byte (an
                                    # explicit pair=1 is still honored)
    if not 5 <= table_log <= 12:
        # the byte-path table packings use 12-bit freq/cumul fields
        # ((cumul<<12)|freq) — FSE_MAX_TABLELOG parity (lib/fse.h:641-681)
        raise ValueError(f"byte-path tableLog must be in [5, 12], got {table_log}")

    if group_size > MAX_GROUP:
        # the packed out buffer (2 bytes/input byte resident in VMEM)
        # bounds the chain length; 4 MiB amortizes the per-group init
        # section to reference-beating ratios already
        raise ValueError(
            f"group_size {group_size} exceeds the encode kernel's VMEM "
            f"budget; use <= {MAX_GROUP}")
    if group_size > DEFAULT_GROUP and group_size % DEFAULT_GROUP:
        raise ValueError(
            "group sizes above 1 MiB must be a multiple of 1 MiB "
            "(the encode kernel chunks src reads in 1 MiB spans)")
    if len(data) == 0:
        return _HDR.pack(RANS_MAGIC, 0, 0, 0, FLAG_RAW, 0)
    src = np.frombuffer(data, dtype=np.uint8)
    chunks = [src[i : i + group_size] for i in range(0, len(src), group_size)]
    if group_size > DEFAULT_GROUP and chunks and len(chunks[-1]) > DEFAULT_GROUP \
            and _pad_n(len(chunks[-1])) % DEFAULT_GROUP:
        # ragged multi-MiB tail whose PADDED size breaks the kernel's 1 MiB
        # chunking rule: split at the last 1 MiB boundary
        tail = chunks.pop()
        cut = len(tail) // DEFAULT_GROUP * DEFAULT_GROUP
        chunks.extend([tail[:cut], tail[cut:]])

    out = bytearray()
    # batch groups by padded size (all-but-last are uniform); stats use the
    # native C prep when built (it releases the GIL, so prep threads across
    # cores and overlaps the async device dispatch — the reference's
    # per-block codec call at fileio.c:343, pipelined)
    batches: dict[int, list[tuple[int, np.ndarray, tuple]]] = {}
    pair_batches: dict[tuple[int, int], list[tuple[int, np.ndarray, dict]]] = {}
    quad_batches: dict[tuple[int, int], list[tuple[int, np.ndarray, dict]]] = {}
    passthrough: dict[int, bytes] = {}
    workers = min(len(chunks), os.cpu_count() or 1)

    def full_prep(ch):
        p = prep_group(ch, table_log)
        if p is None:
            return p, None, None
        pp = prep_pair_group(ch, pair_table_log) if pair != 0 else None
        qp = prep_quad_group(ch, quad_table_log) if quad != 0 else None
        return p, pp, qp

    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            preps = list(ex.map(full_prep, chunks))
    else:
        preps = [full_prep(ch) for ch in chunks]
    from .rans16 import RANS16_STEP_SYMS, _pad_n16
    for gi, (ch, (prep, pprep, qprep)) in enumerate(zip(chunks, preps)):
        if prep is None:
            if (ch == ch[0]).all():  # RLE
                passthrough[gi] = _HDR.pack(RANS_MAGIC, len(ch), 0, 0,
                                            FLAG_RLE, 0) \
                    + bytes([ch[0]]) + b"\0" * 3
            else:                    # near-uniform: straight to raw
                passthrough[gi] = _HDR.pack(RANS_MAGIC, len(ch), 0, 0,
                                            FLAG_RAW, 0) + ch.tobytes()
            continue
        wire = _pick_wire(ch, prep, table_log, pprep, qprep, pair, quad)
        if wire == "quad":
            quad_batches.setdefault(
                (_pad_q((len(ch) + 3) // 4), qprep["tlog"]), []).append(
                    (gi, ch, qprep))
        elif wire == "pair":
            pair_batches.setdefault(
                (_pad_n16((len(ch) + 1) // 2), pprep["tlog"]), []).append(
                    (gi, ch, pprep))
        else:
            batches.setdefault(_pad_n(len(ch)), []).append((gi, ch, prep))

    results: dict[int, bytes] = dict(passthrough)
    for n_pad, items in batches.items():
        G = len(items)
        debuglog(3, "turbo encode: batch of %d groups, n_pad=%d, steptots=%s",
                 G, n_pad, steptots)
        t4 = n_pad // TURBO_STEP_SYMS
        hcap = _hrows_cap(n_pad)
        fc = np.zeros((G, 2, 128), np.int32)
        mg = np.zeros((G, 2, 128), np.int32)
        srcw = np.zeros((G, t4 * 8, 128), np.int32)

        def stage(j):
            gi, ch, (norm, max_sv, ncount, mfs) = items[j]
            fc[j], mg[j] = pack_rans_ctables(norm)  # layout is tlog-agnostic
            pad = np.full(n_pad, mfs, np.uint8)
            pad[: len(ch)] = ch
            srcw[j] = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)

        if workers > 1:
            with ThreadPoolExecutor(max_workers=min(G, workers)) as ex:
                list(ex.map(stage, range(G)))
        else:
            for j in range(G):
                stage(j)
        mesh_obj = None
        if mesh and mesh > 1:
            from ..parallel.mesh import get_mesh

            mesh_obj = get_mesh(mesh)
        if mesh_obj is not None:
            from ..parallel.turbo_dp import (sharded_turbo_encode,
                                             sharded_turbo_encode_v2)

            m = mesh_obj.devices.size
            fcp, mgp, srcwp = _pad_groups([fc, mg, srcw], m)
            if steptots:
                step = sharded_turbo_encode_v2(mesh_obj, t4, hcap, interpret,
                                               table_log)
                stream, fin, csize, stots, _tot = step(
                    jnp.asarray(fcp), jnp.asarray(mgp), jnp.asarray(srcwp))
            else:
                step = sharded_turbo_encode(mesh_obj, t4, hcap, interpret,
                                            table_log)
                stream, fin, csize, _tot = step(
                    jnp.asarray(fcp), jnp.asarray(mgp), jnp.asarray(srcwp))
                stots = None
        else:
            # rowloc=True: row-local pull placement, byte-identical wire,
            # measured 1.78 vs 1.73 GB/s on v5e (probe_sweep_b.py, r4)
            stream, fin, csize, stots = rans_encode2(
                jnp.asarray(fc), jnp.asarray(mg), jnp.asarray(srcw), t4, hcap,
                interpret, False, table_log, steptots, 0, True)
        stream = np.ascontiguousarray(np.asarray(stream))  # packed words
        fin = np.asarray(fin)
        csize = np.asarray(csize)
        stots_np = np.asarray(stots).astype(np.uint8) if steptots else None
        for j, (gi, ch, (norm, max_sv, ncount, mfs)) in enumerate(items):
            # wire payload bytes ARE the packed words little-endian
            payload = stream[j].tobytes()[: 2 * int(csize[j])]
            ncount_pad = ncount + b"\0" * (-len(ncount) % 4)
            if steptots and totals_only:
                # v3 totals-only wire: 1 u16/step (4x smaller than the
                # per-row section; T % 4 == 0 keeps 4B alignment)
                sect = (stots_np[j].astype(np.uint16).sum(axis=1)
                        .astype("<u2").tobytes())
                fl = FLAG_TOTALS
            elif steptots:
                packed = _pack_rows4(stots_np[j])
                if packed is not None:
                    sect, fl = packed, FLAG_STEPTOTS | FLAG_ROWS4
                else:
                    sect = stots_np[j].reshape(-1).tobytes()
                    fl = FLAG_STEPTOTS
            else:
                sect, fl = b"", 0
            blob = (
                _HDR.pack(RANS_MAGIC, len(ch), int(csize[j]), table_log,
                          fl, len(ncount))
                + ncount_pad
                + fin[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                + sect
                + payload
            )
            if len(blob) >= len(ch) + _HDR.size:
                blob = _HDR.pack(RANS_MAGIC, len(ch), 0, 0, FLAG_RAW, 0) + ch.tobytes()
            results[gi] = blob

    for (n_pad16, ptlog), items in pair_batches.items():
        G = len(items)
        debuglog(3, "turbo encode: PAIR batch of %d groups, n_pad16=%d, "
                 "tlog=%d", G, n_pad16, ptlog)
        t2 = n_pad16 // RANS16_STEP_SYMS
        hcap = _round8(n_pad16 // 128 + 16)
        fc = np.zeros((G, 2, 128), np.int32)
        mg = np.zeros((G, 2, 128), np.int32)
        srcw = np.zeros((G, t2 * 8, 128), np.int32)

        def stage_p(j):
            gi, ch, pp = items[j]
            fc[j], mg[j] = pack_rans_ctables(pp["norm"])
            ids = pp["ids"]
            padv = np.full(n_pad16, pp["mfi"], np.uint16)
            padv[: len(ids)] = ids
            srcw[j] = padv.view("<u4").view(np.int32).reshape(t2 * 8, 128)

        if workers > 1:
            with ThreadPoolExecutor(max_workers=min(G, workers)) as ex:
                list(ex.map(stage_p, range(G)))
        else:
            for j in range(G):
                stage_p(j)
        mesh_obj = None
        if mesh and mesh > 1:
            from ..parallel.mesh import get_mesh

            mesh_obj = get_mesh(mesh)
        if mesh_obj is not None:
            from ..parallel.turbo_dp import sharded_turbo_encode_v2

            m = mesh_obj.devices.size
            fcp, mgp, srcwp = _pad_groups([fc, mg, srcw], m)
            # always the steptots kernel under the mesh (payload identical;
            # the section is simply dropped at assembly when steptots=False)
            step = sharded_turbo_encode_v2(mesh_obj, t2, hcap, interpret,
                                           ptlog, u16=True, rowloc=True)
            stream, fin, csize, stots, _tot = step(
                jnp.asarray(fcp), jnp.asarray(mgp), jnp.asarray(srcwp))
        else:
            stream, fin, csize, stots = rans_encode2(
                jnp.asarray(fc), jnp.asarray(mg), jnp.asarray(srcw), t2, hcap,
                interpret, True, ptlog, steptots, 0, True)
        stream = np.ascontiguousarray(np.asarray(stream))
        fin = np.asarray(fin)
        csize = np.asarray(csize)
        stots_np = np.asarray(stots).astype(np.uint8) if steptots else None
        for j, (gi, ch, pp) in enumerate(items):
            payload = stream[j].tobytes()[: 2 * int(csize[j])]
            fl = pp["flags"]
            if steptots:
                packed = _pack_rows4(stots_np[j])
                if packed is not None:
                    sect, fl = packed, fl | FLAG_STEPTOTS | FLAG_ROWS4
                else:
                    sect = stots_np[j].reshape(-1).tobytes()
                    fl |= FLAG_STEPTOTS
            else:
                sect = b""
            blob = (
                _HDR.pack(RANS_MAGIC, len(ch), int(csize[j]), pp["tlog"],
                          fl, pp["nc_len"])
                + pp["sections"]
                + fin[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                + sect
                + payload
            )
            if len(blob) >= len(ch) + _HDR.size:
                blob = _HDR.pack(RANS_MAGIC, len(ch), 0, 0, FLAG_RAW, 0) + ch.tobytes()
            results[gi] = blob

    for (id_pad, qtlog), items in quad_batches.items():
        G = len(items)
        debuglog(3, "turbo encode: QUAD batch of %d groups, id_pad=%d, "
                 "tlog=%d", G, id_pad, qtlog)
        steps = id_pad // TURBO_LANES
        hcap = _round8((id_pad + 127) // 128 + 16)  # <= 1 hw per id
        fc = np.zeros((G, 2, 128), np.int32)
        mg = np.zeros((G, 2, 128), np.int32)
        srcw = np.zeros((G, steps * 8, 128), np.int32)

        def stage_q(j):
            gi, ch, qp = items[j]
            fc[j], mg[j] = pack_rans_ctables(qp["norm"])
            ids = qp["ids"]
            padv = np.full(id_pad, qp["mfi"], np.uint32)
            padv[: len(ids)] = ids
            srcw[j] = padv.astype("<u4").view(np.int32).reshape(steps * 8, 128)

        if workers > 1:
            with ThreadPoolExecutor(max_workers=min(G, workers)) as ex:
                list(ex.map(stage_q, range(G)))
        else:
            for j in range(G):
                stage_q(j)
        mesh_obj = None
        if mesh and mesh > 1:
            from ..parallel.mesh import get_mesh

            mesh_obj = get_mesh(mesh)
        if mesh_obj is not None:
            from ..parallel.turbo_dp import sharded_turbo_encode_v2

            m = mesh_obj.devices.size
            fcp, mgp, srcwp = _pad_groups([fc, mg, srcw], m)
            step = sharded_turbo_encode_v2(mesh_obj, steps, hcap, interpret,
                                           qtlog, rowloc=True, quad=True)
            stream, fin, csize, stots, _tot = step(
                jnp.asarray(fcp), jnp.asarray(mgp), jnp.asarray(srcwp))
        else:
            stream, fin, csize, stots = rans_encode2(
                jnp.asarray(fc), jnp.asarray(mg), jnp.asarray(srcw), steps,
                hcap, interpret, False, qtlog, True, 0, True, True)
        stream = np.ascontiguousarray(np.asarray(stream))
        fin = np.asarray(fin)
        csize = np.asarray(csize)
        stots_np = np.asarray(stots).astype(np.uint8)
        for j, (gi, ch, qp) in enumerate(items):
            payload = stream[j].tobytes()[: 2 * int(csize[j])]
            fl = qp["flags"]
            packed = _pack_rows4(stots_np[j])
            if packed is not None:
                sect, fl = packed, fl | FLAG_STEPTOTS | FLAG_ROWS4
            else:
                sect = stots_np[j].reshape(-1).tobytes()
                fl |= FLAG_STEPTOTS
            blob = (
                _HDR.pack(RANS_MAGIC, len(ch), int(csize[j]), qp["tlog"],
                          fl, qp["nc_len"])
                + qp["sections"]
                + fin[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                + sect
                + payload
            )
            if len(blob) >= len(ch) + _HDR.size:
                blob = _HDR.pack(RANS_MAGIC, len(ch), 0, 0, FLAG_RAW, 0) + ch.tobytes()
            results[gi] = blob
    for gi in range(len(chunks)):
        out += results[gi]
    return bytes(out)


def _window_dispatch(windows: int, t_count: int, hrows: int, tlog: int,
                     G: int, totals_only: bool, u16: bool = False,
                     u16x: bool = False, pair: bool = False,
                     quad: bool = False) -> tuple[int, int]:
    """Kernel choice for a speed-wire decode batch: returns (nway, S) for
    the HBM-windowed kernel (rans_decode_w), or (0, 0) for resident v2.

    windows > 1 forces the windowed kernel at that interleave (when the
    shape is eligible); windows == 1 forces resident v2; windows == 0 (the
    default) picks by the measured cost model (probe_sweep_b.py, r4).

    Bytes wires: the windowed kernel's rate is ~width-independent
    (18.5-23.6 GB/s on v5e at 1-4 MiB groups, all corpora) while v2's
    collapses with its VMEM-picked interleave nv (~18.5 * nv/7: 9.0 GB/s
    at 2 MiB, 3.3 at 4 MiB), and the windowed kernel pads the batch to a
    multiple of its 8-way width — so windowed wins iff 7*G > nv*pad8(G).

    u16 wire: v2 degrades more gently (2 bytes/symbol amortize the
    per-step cost: 19.9 GB/s at nv=5, 6.2 at nv=1) while windowed S=64
    runs 17.7-17.9 — the crossover sits at nv <= 4, not 7.  The window
    span S is capped at 64 rows: S=128 crashes the Mosaic remote compiler
    deterministically on v5e (probe_sweep_b uw8s128/uw8s128g4), and the
    measured S sweep showed no win beyond 64 anyway.

    pair / quad wires (turbo/pair.py, turbo/quad.py): the r5 probe
    measured the windowed kernel >= resident v2 at EVERY group size —
    pair: 37.5 vs 35.8 at 1 MiB (nv=7), 38.3 vs 16.9 at 2 MiB, 37.9 vs
    6.7 at 4 MiB; quad (S=128, tlog 10): 50.5 vs 45.1 at 1 MiB, 52.1 vs
    13.0 at 4 MiB (tools/probe_r5.py) — so both pick windowed whenever
    the shape is eligible (quad needs t_count % 128 == 0: spc=1 packs
    128 steps per roff tile, i.e. groups >= 512 KiB)."""
    spc = 1 if quad else 2 if u16 else 4
    smin = 128 // spc
    if t_count % smin:
        return 0, 0          # group too small / misaligned for windows
    S = smin if quad else min(
        2 * smin if t_count % (2 * smin) == 0 else smin, 64)
    if windows == 1:
        return 0, 0
    if windows > 1:
        return windows, S
    if pair or quad:
        return 8, S          # measured: windowed >= v2 at every size
    from .rans_kernels import v2_pick_nway

    nv = v2_pick_nway(t_count, hrows, tlog, u16, totals_only, u16x, pair)
    # bytes: >= so the tie (nv == 7, G a multiple of 8 -> no padding
    # either way) goes to the windowed kernel, which measured slightly
    # faster even at 1 MiB (18.7-19.7 vs 17.3-18.5 across r4 runs);
    # u16: crossover measured at nv <= 4 (see docstring)
    v2_width = 4.5 if u16 else 7
    if v2_width * G >= nv * ((G + 7) // 8 * 8):
        return 8, S
    return 0, 0


def turbo_decompress_device(blob: bytes, interpret: bool = False,
                            mesh: int = 0, windows: int = 0) -> bytes:
    """Decompress a TurboRANS stream with the Pallas decode kernel.

    mesh > 1 shards group batches data-parallel (see turbo_compress_device).
    windows picks the decode kernel for speed-wire batches: 0 (default)
    auto-selects between the resident v2 kernel and the HBM-windowed
    kernel (rans_decode_w) by the measured cost model in _window_dispatch
    — the windowed kernel keeps its interleave width on multi-MiB groups
    and near-raw streams whose resident nway collapses (6x at 4 MiB, 2.2x
    on proba02); 1 forces resident v2; N > 1 forces the windowed kernel
    at an N-way interleave.  Batches whose shapes are ineligible for
    windows (group < 128 KiB) fall back to the resident kernels (logged
    at debuglevel 2 when explicitly requested)."""
    import jax.numpy as jnp

    groups = []
    pos = 0
    while pos < len(blob):
        g, used = parse_rans_group(blob[pos:])
        groups.append(g)
        pos += used

    pieces: list[bytes | None] = [None] * len(groups)
    batches: dict[tuple[int, int, int, bool], list[int]] = {}
    for i, g in enumerate(groups):
        n, csize_hw, tlog, flags, norm = g[0], g[1], g[2], g[3], g[4]
        payload, steptots = g[7], g[8]
        if flags & FLAG_RAW:
            pieces[i] = bytes(payload)
        elif flags & FLAG_RLE:
            pieces[i] = bytes([payload[0]]) * n
        else:
            # multi-byte wires (11-tuple): pad/batch by SYMBOL count —
            # pairs through the u16 lane interleave, quads 1-per-lane-word
            wire = (2 if len(g) == 11 and g[3] & FLAG_QUAD
                    else 1 if len(g) == 11 else 0)
            from .rans16 import _pad_n16
            n_pad = (_pad_q((n + 3) // 4) if wire == 2
                     else _pad_n16((n + 1) // 2) if wire == 1 else _pad_n(n))
            kind = 0 if steptots is None else steptots.ndim  # 0 | 1 | 2
            batches.setdefault((n_pad, tlog, kind, wire), []).append(i)

    for (n_pad, tlog, kind, wire), idxs in batches.items():
        G = len(idxs)
        is_pair, is_quad = wire == 1, wire == 2
        debuglog(3, "turbo decode: batch of %d groups, n_pad=%d, tlog=%d, "
                 "sect_kind=%d, wire=%s", G, n_pad, tlog, kind,
                 ("byte", "pair", "quad")[wire])
        from .rans16 import RANS16_STEP_SYMS
        t4 = n_pad // (TURBO_LANES if is_quad
                       else RANS16_STEP_SYMS if is_pair else TURBO_STEP_SYMS)
        hrows = _round8(
            max((groups[i][1] + 127) // 128 for i in idxs) + 16)
        tch = max((1 << tlog) // 128, 1) + (2 if is_pair or is_quad else 0)
        T = n_pad // TURBO_LANES
        srows = stream_word_rows(hrows)
        tbl = np.zeros((G, tch, 128), np.int32)
        init = np.zeros((G, 8, 128), np.int32)
        hws = np.zeros((G, srows, 128), np.int32)   # packed payload words
        cs = np.zeros(G, np.int32)
        have_tots = kind > 0
        tots = np.zeros((G, T) if kind == 1 else (G, T, 8), np.int32)

        def fill(j_i):
            # per-group table pack + payload staging: numpy releases the
            # GIL on the bulk ops, so groups fill across cores.  The wire
            # payload is already the packed word layout — staging is a
            # straight byte copy (no halfword expansion, half the H2D).
            j, i = j_i
            g = groups[i]
            n, csize_hw, _tl, flags, norm = g[0], g[1], g[2], g[3], g[4]
            ini, payload, stots = g[6], g[7], g[8]
            if is_quad:
                tbl[j] = pack_quad_dtable(norm, g[9], tlog)
            elif is_pair:
                tbl[j] = pack_pair_dtable(norm, g[9], tlog)
            else:
                tbl[j] = pack_rans_dtable(norm, tlog)
            init[j] = ini.view(np.int32).reshape(8, 128)
            w = np.frombuffer(payload + b"\0" * (-len(payload) % 4), "<u4")
            hws[j].reshape(-1)[: len(w)] = w.view(np.int32)
            cs[j] = csize_hw
            if have_tots:
                tots[j] = stots

        workers = min(G, os.cpu_count() or 1)
        if workers > 1:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                list(ex.map(fill, enumerate(idxs)))
        else:
            for ji in enumerate(idxs):
                fill(ji)
        mesh_obj = None
        if mesh and mesh > 1:
            from ..parallel.mesh import get_mesh

            mesh_obj = get_mesh(mesh)
        if mesh_obj is not None:
            from ..parallel.turbo_dp import (sharded_turbo_decode,
                                             sharded_turbo_decode_v2)

            m = mesh_obj.devices.size
            if have_tots:
                csp, tblp, initp, hwsp, totsp = _pad_groups(
                    [cs, tbl, init, hws, tots], m)
                step = sharded_turbo_decode_v2(mesh_obj, t4, hrows,
                                               interpret, tlog,
                                               u16=is_pair, pair=is_pair,
                                               quad=is_quad)
                outw, err, _any = step(jnp.asarray(csp), jnp.asarray(tblp),
                                       jnp.asarray(initp), jnp.asarray(hwsp),
                                       jnp.asarray(totsp))
            else:
                csp, tblp, initp, hwsp = _pad_groups([cs, tbl, init, hws], m)
                step = sharded_turbo_decode(mesh_obj, t4, hrows,
                                            interpret, tlog,
                                            u16=is_pair, pair=is_pair)
                outw, err, _any = step(jnp.asarray(csp), jnp.asarray(tblp),
                                       jnp.asarray(initp), jnp.asarray(hwsp))
            err = np.asarray(err)[:G]
        elif have_tots:
            w_nway, w_s = _window_dispatch(
                windows, t4, hrows, tlog, G, kind == 1, u16=is_pair,
                pair=is_pair, quad=is_quad)
            if w_nway:
                from .rans_kernels import rans_decode_w

                debuglog(2, "turbo decode: windowed kernel nway=%d S=%d "
                            "(windows=%d, t4=%d, G=%d, wire=%s)", w_nway,
                         w_s, windows, t4, G, ("byte", "pair", "quad")[wire])
                outw, err = rans_decode_w(jnp.asarray(cs), jnp.asarray(tbl),
                                          jnp.asarray(init), jnp.asarray(hws),
                                          jnp.asarray(tots), t4, hrows,
                                          w_nway, tlog, w_s, interpret,
                                          is_pair, False, is_pair, is_quad)
            else:
                if windows > 1:
                    # requested windowed kernel is ineligible — say why
                    # instead of silently changing the performance profile
                    debuglog(2, "turbo decode: windows=%d requested but "
                                "falling back to resident v2 (wire %s, "
                                "t4=%d %% 32 = %d)",
                             windows,
                             "rows" if tots.ndim == 3 else "totals",
                             t4, t4 % 32)
                outw, err = rans_decode_v2(jnp.asarray(cs), jnp.asarray(tbl),
                                           jnp.asarray(init), jnp.asarray(hws),
                                           jnp.asarray(tots), t4, hrows,
                                           interpret, tlog, is_pair, False,
                                           is_pair, is_quad)
        else:  # v1 groups: rank computed in-kernel
            outw, err = rans_decode(jnp.asarray(cs), jnp.asarray(tbl),
                                    jnp.asarray(init), jnp.asarray(hws),
                                    t4, hrows, interpret, is_pair, tlog,
                                    False, is_pair)
        err = np.asarray(err)
        if err.any():
            raise ValueError(f"turbo-rans device decode: corrupt groups {np.nonzero(err)[0]}")
        outw = np.asarray(outw)
        for j, i in enumerate(idxs):
            n = groups[i][0]
            if is_quad:
                qu = (outw[j].astype("<i4").reshape(-1).view(np.uint32)
                      [: (n + 3) // 4].copy())
                pieces[i] = apply_escapes(qu, groups[i][10]).tobytes()[:n]
            elif is_pair:
                pu = (outw[j].astype("<i4").reshape(-1).view(np.uint16)
                      [: (n + 1) // 2].copy())
                pieces[i] = apply_escapes(pu, groups[i][10]).tobytes()[:n]
            else:
                pieces[i] = outw[j].astype("<i4").tobytes()[:n]
    return b"".join(pieces)


# ---------------------------------------------------------------------------
# TurboRANS-U16 (fseU16-class workloads: 16-bit symbols <= 1023)
# ---------------------------------------------------------------------------


def turbo16_compress_device(symbols: np.ndarray, group_syms: int = 1 << 19,
                            interpret: bool = False,
                            steptots: bool = True) -> bytes:
    """Compress a u16 symbol array with the TurboRANS-U16 kernels.

    steptots=True (speed mode) ships per-step renorm counts enabling the
    faster v2 decode kernel; False = best ratio (v1 wire)."""
    import jax.numpy as jnp

    from .rans16 import (FLAG_STEPTOTS as FL16_STEPTOTS, RANS16_MAGIC,
                         RANS16_MAX_SYMBOL, RANS16_STEP_SYMS,
                         _HDR as HDR16, _pad_n16, rans16_compress)
    from .rans_kernels import pack_rans16_ctables

    from ..refimpl.ncount import fse_write_ncount
    from ..refimpl.norm import fse_normalize_count

    symbols = np.ascontiguousarray(symbols, dtype=np.uint16)
    chunks = [symbols[i : i + group_syms]
              for i in range(0, max(len(symbols), 1), group_syms)]

    # batch groups by (padded size, alphabet width): symbols above 1023 use
    # the split-table kernels (r2); twin handles empty/oversized/RLE groups
    results: dict[int, bytes] = {}
    batches: dict[tuple[int, bool], list[tuple[int, np.ndarray, tuple]]] = {}
    for gi, chunk in enumerate(chunks):
        n = len(chunk)
        count = np.bincount(chunk, minlength=4096) if n else None
        if (n == 0 or int(chunk.max(initial=0)) > RANS16_MAX_SYMBOL
                or int(count.max()) == n):
            results[gi] = rans16_compress(chunk, steptots)
            continue
        max_sv = int(chunk.max())
        # alphabets above 1023 need tableLog 12-13 (fseU16.c:43-48 analogue);
        # small groups shrink via FSE_optimalTableLog (matches the twin)
        tlog_req = (RANS_TABLELOG if max_sv <= 1023
                    else 12 if max_sv <= 2047 else 13)
        from ..refimpl.norm import fse_optimal_table_log

        tlog_opt = min(tlog_req, fse_optimal_table_log(tlog_req, n, max_sv,
                                                       max_allowed=13))
        norm, tlog = fse_normalize_count(tlog_opt, count[: max_sv + 1],
                                         n, max_sv, max_table_log=13)
        ncount = fse_write_ncount(norm, max_sv, tlog)
        mfs = int(count.argmax())
        batches.setdefault((_pad_n16(n), max_sv > 1023, tlog), []).append(
            (gi, chunk, (np.asarray(norm), ncount, mfs, tlog)))

    for (n_pad, big, btlog), items in batches.items():
        G = len(items)
        debuglog(3, "turbo16 encode: batch of %d groups, n_pad=%d, big=%s",
                 G, n_pad, big)
        t2 = n_pad // RANS16_STEP_SYMS
        hcap = _round8(n_pad // 128 + 16)
        nch = 32 if big else 8
        fc = np.zeros((G, nch, 128), np.int32)
        mg = np.zeros((G, nch, 128), np.int32)
        srcw = np.zeros((G, t2 * 8, 128), np.int32)
        for j, (gi, chunk, (norm, ncount, mfs, tlog)) in enumerate(items):
            if big:
                from .rans_kernels import pack_rans16x_ctables

                fc[j], mg[j] = pack_rans16x_ctables(norm)
            else:
                fc[j], mg[j] = pack_rans16_ctables(norm)
            pad = np.full(n_pad, mfs, np.uint16)
            pad[: len(chunk)] = chunk
            srcw[j] = pad.view("<u4").view(np.int32).reshape(t2 * 8, 128)
        stream, fin, csize, stots = rans_encode(
            jnp.asarray(fc), jnp.asarray(mg), jnp.asarray(srcw),
            t2, hcap, interpret, True, btlog, steptots)
        stream = np.asarray(stream)
        fin = np.asarray(fin)
        csize = np.asarray(csize)
        stots_np = np.asarray(stots).astype(np.uint8) if steptots else None
        for j, (gi, chunk, (norm, ncount, mfs, tlog)) in enumerate(items):
            n = len(chunk)
            cs = int(csize[j])
            hw = stream[j].reshape(-1)[:cs].astype(np.uint16)
            ncount_pad = ncount + b"\0" * (-len(ncount) % 4)
            if steptots:
                sect = stots_np[j].reshape(-1).tobytes()
                fl = FL16_STEPTOTS
            else:
                sect, fl = b"", 0
            blob = (HDR16.pack(RANS16_MAGIC, n, cs, tlog, fl, len(ncount))
                    + ncount_pad
                    + fin[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                    + sect
                    + hw.astype("<u2").tobytes())
            if len(blob) >= 2 * n + HDR16.size:
                blob = HDR16.pack(RANS16_MAGIC, n, 0, 0, 1, 0) + chunk.tobytes()
            results[gi] = blob
    return b"".join(results[gi] for gi in range(len(chunks)))


def turbo16_decompress_device(blob: bytes, interpret: bool = False,
                              windows: int = 0) -> np.ndarray:
    """Decompress a TurboRANS-U16 stream with the Pallas decode kernel."""
    import jax.numpy as jnp

    from .rans16 import RANS16_STEP_SYMS, _pad_n16, parse_rans16_group
    from .rans_kernels import pack_rans16_dtable

    groups = []
    pos = 0
    while pos < len(blob):
        g, used = parse_rans16_group(blob[pos:])
        groups.append(g)
        pos += used

    pieces: list[np.ndarray | None] = [None] * len(groups)
    batches: dict[tuple[int, int, bool, bool], list[int]] = {}
    for i, g in enumerate(groups):
        n, cs, tlog, flags, norm, max_sv, init, payload, stots = g
        if flags & 1:
            pieces[i] = np.frombuffer(payload, "<u2")
        elif flags & 2:
            pieces[i] = np.full(n, np.frombuffer(payload, "<u2")[0], np.uint16)
        else:
            batches.setdefault((_pad_n16(n), tlog, stots is not None,
                                max_sv > 1023), []).append(i)

    for (n_pad, tlog, have_tots, big), idxs in batches.items():
        G = len(idxs)
        debuglog(3, "turbo16 decode: batch of %d groups, n_pad=%d, v2=%s, "
                 "big=%s", G, n_pad, have_tots, big)
        t2 = n_pad // RANS16_STEP_SYMS
        T = n_pad // 1024
        hrows = _round8(max((groups[i][1] + 127) // 128 for i in idxs) + 16)
        tch = max((1 << tlog) // 128, 1)
        srows = stream_word_rows(hrows)
        tbl = np.zeros((G, 2 * tch if big else tch, 128), np.int32)
        init_b = np.zeros((G, 8, 128), np.int32)
        hws = np.zeros((G, srows, 128), np.int32)   # packed payload words
        cs_b = np.zeros(G, np.int32)
        tots = np.zeros((G, T, 8), np.int32)
        for j, i in enumerate(idxs):
            n, cs, _tl, flags, norm, max_sv, init, payload, stots = groups[i]
            if big:
                from .rans_kernels import pack_rans16x_dtable

                tbl[j] = pack_rans16x_dtable(norm, tlog)
            else:
                tbl[j] = pack_rans16_dtable(norm, tlog)
            init_b[j] = init.view(np.int32).reshape(8, 128)
            w = np.frombuffer(payload + b"\0" * (-len(payload) % 4), "<u4")
            hws[j].reshape(-1)[: len(w)] = w.view(np.int32)
            cs_b[j] = cs
            if have_tots:
                tots[j] = stots
        common = (jnp.asarray(cs_b), jnp.asarray(tbl), jnp.asarray(init_b),
                  jnp.asarray(hws))
        if have_tots:
            w_nway, w_s = _window_dispatch(windows, t2, hrows, tlog, G,
                                           False, True, big)
            if w_nway:
                from .rans_kernels import rans_decode_w

                debuglog(2, "turbo16 decode: windowed kernel nway=%d S=%d "
                            "(windows=%d, t2=%d, G=%d)", w_nway, w_s,
                         windows, t2, G)
                outw, err = rans_decode_w(*common, jnp.asarray(tots), t2,
                                          hrows, w_nway, tlog, w_s,
                                          interpret, True, big)
            else:
                if windows > 1:
                    debuglog(2, "turbo16 decode: windows=%d requested but "
                                "falling back to resident v2 "
                                "(t2=%d %% 64 = %d)",
                             windows, t2, t2 % 64)
                outw, err = rans_decode_v2(*common, jnp.asarray(tots),
                                           t2, hrows, interpret, tlog, True,
                                           big)
        else:
            outw, err = rans_decode(*common, t2, hrows, interpret, True, tlog,
                                    big)
        err = np.asarray(err)
        if err.any():
            raise ValueError(
                f"turbo-u16 device decode: corrupt groups {np.nonzero(err)[0]}")
        outw = np.asarray(outw)
        for j, i in enumerate(idxs):
            n = groups[i][0]
            pieces[i] = (outw[j].astype("<i4").reshape(-1)
                         .view(np.uint16)[:n].copy())
    return np.concatenate(pieces) if pieces else np.zeros(0, np.uint16)
