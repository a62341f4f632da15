"""Device-resident TurboRANS: compress/decompress data that LIVES on the
TPU without round-tripping the payload through the host.

The reference is a CPU library, so its whole pipeline is "host-resident";
on TPU the natural production flow compresses tensors already in HBM
(checkpoints, activations, KV caches) and decompresses straight back into
HBM.  Round 3 made compression ONE fused launch per batch — the entire
chain histogram -> normalization (ops/norm.py, bit-exact incl. the
normalizeM2 fallback) -> table packing (ops/rans_tables.py) -> encode
kernel runs on device; the host only parses/writes the tiny headers:

  compress:  fused jit [hist -> normalize -> ctables -> pad -> encode2]
             -> pull norm/flags (1 KiB/group, header bytes) + csize +
             final states + ONLY the compressed words (sliced to the
             batch's max csize).
  decompress: host parses headers (tiny), pushes packed payload + tables,
             one v2 kernel launch per batch, and the OUTPUT STAYS ON
             DEVICE as a jax.Array.
  roundtrip: rans_resident_roundtrip keeps even the compressed words in
             HBM — the decode tables are built on device from the same
             normalized counts — so the only host syncs are scalars.
             This is the measured end-to-end story (bench.py): payload
             never crosses the link.

Wire bytes are identical to turbo_compress_device (differentially
tested), so frames interchange freely with the host/native paths.
Groups are batched by padded size exactly like the host path —
including ragged tails, which round 2 encoded at the full group's
padded span (diverging wire + undecodable mid-size tails; fixed here).
"""
from __future__ import annotations

import functools

import jax
import numpy as np

from ..refimpl.ncount import fse_write_ncount
from .format import TURBO_STEP_SYMS, _pad_n
from .rans import (FLAG_RAW, FLAG_RLE, FLAG_ROWS4, FLAG_STEPTOTS,
                   FLAG_TOTALS, _pack_rows4,
                   RANS_MAGIC, RANS_TABLELOG, _HDR, parse_rans_group)
from .rans_kernels import (pack_rans_dtable, pack_stream_words,
                           rans_decode_v2, rans_encode2, stream_word_rows)

DEFAULT_GROUP = 1 << 20
MAX_GROUP = 4 << 20   # encode2 chunks src reads; out buffer bounds this


def _round8(x: int) -> int:
    return (x + 7) // 8 * 8


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _resident_compress_jit(xp, lens, n_pad: int, table_log: int,
                           steptots: bool, interpret: bool):
    """One fused launch: histogram -> bit-exact normalization -> encode
    tables -> mfs padding -> rANS encode.  xp [G, cols] uint8 (cols <=
    n_pad, multiple of 4), lens [G] i32 valid lengths.

    Returns (stream_words, final_states, csize_hw, steptots|None,
    norm [G,256], flags [G], mfs [G]).  flags: 0 coded, 1 RLE, 2/3
    normalization error (refimpl parity; host raises), 4 near-uniform ->
    raw (reference maxCount <= n>>7, fse_compress.c:653-655).  Rows with
    flags != 0 are encoded with a placeholder delta table — their stream
    output is well-formed garbage the caller discards."""
    import jax.numpy as jnp

    from ..ops.hist import hist_count_masked
    from ..ops.norm import fse_normalize_batch
    from ..ops.rans_tables import pack_rans_ctables_batch

    G, cols = xp.shape
    counts = hist_count_masked(xp, cols, lens)
    norm, flags = fse_normalize_batch(counts, lens, table_log)
    raw = jnp.max(counts, axis=1) <= (lens >> 7)
    flags = jnp.where((flags != 1) & raw, 4, flags)
    mfs = jnp.argmax(counts, axis=1).astype(jnp.int32)

    # placeholder delta distribution for non-coded rows: keeps the table
    # build well-formed (freq >= 1 sums to tableSize) without branching
    idx = jnp.arange(256, dtype=jnp.int32)[None, :]
    delta = jnp.where(idx == mfs[:, None], 1 << table_log, 0)
    norm_s = jnp.where((flags == 0)[:, None], norm, delta)
    fc, mg = pack_rans_ctables_batch(norm_s)

    mfs_u8 = mfs.astype(jnp.uint8)
    pos = jnp.arange(cols, dtype=jnp.int32)[None, :]
    padded = jnp.where(pos < lens[:, None], xp, mfs_u8[:, None])
    if n_pad > cols:
        padded = jnp.concatenate(
            [padded, jnp.broadcast_to(mfs_u8[:, None], (G, n_pad - cols))],
            axis=1)
    t4 = n_pad // TURBO_STEP_SYMS
    srcw = jax.lax.bitcast_convert_type(
        padded.reshape(G, n_pad // 4, 4), jnp.uint32
    ).astype(jnp.int32).reshape(G, t4 * 8, 128)
    hcap = _round8((n_pad + 127) // 128 + 16)
    # rowloc placement: byte-identical wire, slightly faster (r4 probe)
    stream, fin, csize, stots = rans_encode2(
        fc, mg, srcw, t4, hcap, interpret, False, table_log, steptots, 0,
        True)
    return stream, fin, csize, stots, norm_s, norm, flags, mfs, srcw


def _resident_batches(n: int, group_size: int):
    """(start, length) per group, grouped by padded size — mirrors
    turbo_compress_device's chunking incl. the multi-MiB tail split."""
    spans = [(i, min(group_size, n - i)) for i in range(0, n, group_size)]
    if group_size > DEFAULT_GROUP and spans and spans[-1][1] > DEFAULT_GROUP \
            and _pad_n(spans[-1][1]) % DEFAULT_GROUP:
        st, ln = spans.pop()
        cut = ln // DEFAULT_GROUP * DEFAULT_GROUP
        spans += [(st, cut), (st + cut, ln - cut)]
    batches: dict[int, list[tuple[int, int, int]]] = {}
    for gi, (st, ln) in enumerate(spans):
        batches.setdefault(_pad_n(ln), []).append((gi, st, ln))
    return len(spans), batches


def rans_compress_resident(x, group_size: int = DEFAULT_GROUP,
                           table_log: int = 0,
                           steptots: bool = True,
                           totals_only: bool = False,
                           interpret: bool | None = None) -> bytes:
    """Compress a device-resident uint8 jax.Array; the payload crosses the
    link only as compressed words (plus 1 KiB/group of header stats)."""
    import jax
    import jax.numpy as jnp

    from ..errors import FSEError

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if table_log == 0:
        from .rans import RANS_SPEED_TABLELOG

        table_log = RANS_SPEED_TABLELOG if steptots else RANS_TABLELOG
    if not 5 <= table_log <= 12:
        raise ValueError(f"byte-path tableLog must be in [5, 12], got {table_log}")
    if group_size > MAX_GROUP:
        raise ValueError(
            f"group_size {group_size} exceeds the encode kernel's VMEM "
            f"budget; use <= {MAX_GROUP}")
    if group_size > DEFAULT_GROUP and group_size % DEFAULT_GROUP:
        raise ValueError(
            "group sizes above 1 MiB must be a multiple of 1 MiB "
            "(the encode kernel chunks src reads in 1 MiB spans)")
    n = int(x.shape[0])
    if n == 0:
        return _HDR.pack(RANS_MAGIC, 0, 0, 0, FLAG_RAW, 0)
    x = x.astype(jnp.uint8)

    n_groups, batches = _resident_batches(n, group_size)
    results: dict[int, bytes] = {}
    for n_pad, items in batches.items():
        G = len(items)
        cols = min(n_pad, (max(ln for _, _, ln in items) + 3) // 4 * 4)
        lens = np.array([ln for _, _, ln in items], np.int32)
        xpad = jnp.pad(x, (0, cols))  # never slice past the end
        xp = jnp.stack([jax.lax.dynamic_slice(xpad, (st,), (cols,))
                        for _, st, _ in items])
        stream, fin, csize, stots, _norm_s, norm, flags, mfs, _srcw = \
            _resident_compress_jit(xp, jnp.asarray(lens), n_pad, table_log,
                                   steptots, interpret)
        csize_np = np.asarray(csize)
        flags_np = np.asarray(flags)
        norm_np = np.asarray(norm)
        mfs_np = np.asarray(mfs)
        if ((flags_np == 2) | (flags_np == 3)).any():
            raise FSEError("normalization failed on device "
                           f"(flags {flags_np.tolist()})")
        fin_np = np.asarray(fin)
        stots_np = np.asarray(stots).astype(np.uint8) if steptots else None
        # pull only the words any group actually uses, in ONE transfer
        coded = flags_np == 0
        max_cs = int(csize_np[coded].max()) if coded.any() else 0
        wrows = min(stream.shape[1],
                    max(_round8(((max_cs + 1) // 2 + 127) // 128), 8))
        stream_np = np.ascontiguousarray(np.asarray(stream[:, :wrows, :]))
        for j, (gi, st, ln) in enumerate(items):
            if flags_np[j] == 1:   # RLE
                results[gi] = _HDR.pack(RANS_MAGIC, ln, 0, 0, FLAG_RLE, 0) \
                    + bytes([int(mfs_np[j])]) + b"\0" * 3
                continue
            if flags_np[j] == 4:   # near-uniform: straight to raw
                raw = np.asarray(jax.lax.dynamic_slice(x, (st,), (ln,)))
                results[gi] = _HDR.pack(RANS_MAGIC, ln, 0, 0, FLAG_RAW,
                                        0) + raw.tobytes()
                continue
            cs = int(csize_np[j])
            payload = stream_np[j].tobytes()[: 2 * cs]
            nz = np.nonzero(norm_np[j])[0]
            max_sv = int(nz.max())
            ncount = fse_write_ncount(norm_np[j][: max_sv + 1].tolist(),
                                      max_sv, table_log)
            ncount_pad = ncount + b"\0" * (-len(ncount) % 4)
            if steptots and totals_only:
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
            blob = (_HDR.pack(RANS_MAGIC, ln, cs, table_log, fl, len(ncount))
                    + ncount_pad
                    + fin_np[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                    + sect + payload)
            if len(blob) >= ln + _HDR.size:
                raw = np.asarray(
                    jax.lax.dynamic_slice(x, (st,), (ln,)))  # incompressible
                blob = _HDR.pack(RANS_MAGIC, ln, 0, 0, FLAG_RAW, 0) + raw.tobytes()
            results[gi] = blob
    return b"".join(results[gi] for gi in range(n_groups))


def rans_decompress_resident(blob: bytes, interpret: bool | None = None):
    """Decompress a TurboRANS stream INTO device memory: the uplink carries
    only the compressed payload + tables; returns a uint8 jax.Array.
    Batches groups per (padded size, tableLog, section kind) — one kernel
    launch per batch, like the host path."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    groups = []
    pos = 0
    while pos < len(blob):
        g, used = parse_rans_group(blob[pos:])
        groups.append(g)
        pos += used

    pieces: list = [None] * len(groups)
    batches: dict[tuple[int, int, int], list[int]] = {}
    for i, g in enumerate(groups):
        if len(g) == 11:
            # pair-wire groups need host-side escape patching; the
            # resident encode path never emits them
            raise ValueError(
                "resident decode does not support FLAG_PAIR groups; use "
                "turbo_decompress_device (turbo/api.py)")
        n, csize_hw, tlog, flags, norm, max_sv, init, payload, stots = g
        if flags & FLAG_RAW:
            pieces[i] = jnp.asarray(np.frombuffer(payload, np.uint8)[:n])
        elif flags & FLAG_RLE:
            pieces[i] = jnp.full(n, payload[0], jnp.uint8)
        else:
            kind = 0 if stots is None else stots.ndim
            batches.setdefault((_pad_n(n), tlog, kind), []).append(i)

    for (n_pad, tlog, kind), idxs in batches.items():
        G = len(idxs)
        t4 = n_pad // TURBO_STEP_SYMS
        T = n_pad // 1024
        hrows = _round8(max((groups[i][1] + 127) // 128 for i in idxs) + 16)
        srows = stream_word_rows(hrows)
        tch = max((1 << tlog) // 128, 1)
        tbl = np.zeros((G, tch, 128), np.int32)
        init_b = np.zeros((G, 8, 128), np.int32)
        hws = np.zeros((G, srows, 128), np.int32)
        cs_b = np.zeros(G, np.int32)
        tots = np.zeros((G, T) if kind == 1 else (G, T, 8), np.int32)
        for j, i in enumerate(idxs):
            n, csize_hw, _tl, flags, norm, max_sv, ini, payload, stots = groups[i]
            tbl[j] = pack_rans_dtable(norm, tlog)
            init_b[j] = ini.view(np.int32).reshape(8, 128)
            hws[j] = pack_stream_words(payload, srows)
            cs_b[j] = csize_hw
            if kind:
                tots[j] = stots
        if kind:
            outw, err = rans_decode_v2(
                jnp.asarray(cs_b), jnp.asarray(tbl), jnp.asarray(init_b),
                jnp.asarray(hws), jnp.asarray(tots), t4, hrows, interpret,
                tlog)
        else:
            from .rans_kernels import rans_decode

            outw, err = rans_decode(
                jnp.asarray(cs_b), jnp.asarray(tbl), jnp.asarray(init_b),
                jnp.asarray(hws), t4, hrows, interpret, False, tlog)
        err_np = np.asarray(err)
        if err_np.any():
            raise ValueError(
                f"resident decode: corrupt groups {np.nonzero(err_np)[0]}")
        flat = jax.lax.bitcast_convert_type(
            outw.reshape(G, t4 * 8, 128).astype(jnp.uint32),
            jnp.uint8).reshape(G, -1)
        for j, i in enumerate(idxs):
            pieces[i] = flat[j, : groups[i][0]]
    return jnp.concatenate(pieces) if pieces else jnp.zeros(0, jnp.uint8)


def rans_resident_roundtrip(x, group_size: int = DEFAULT_GROUP,
                            table_log: int = 0,
                            interpret: bool | None = None):
    """Fully device-resident compress -> decompress -> verify: the payload,
    tables, and section all stay in HBM; the only host syncs are scalars.
    This is the honest end-to-end number on a tunnel-attached box (the
    wire-level APIs are bounded by the host link, not the kernels).

    Returns (ok: bool, total_csize_hw: int, nbytes: int).  Requires every
    group to be codeable (no RLE/raw fallbacks) and len(x) a multiple of
    group_size <= 1 MiB-aligned sizes; raises otherwise."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if table_log == 0:
        from .rans import RANS_SPEED_TABLELOG

        table_log = RANS_SPEED_TABLELOG
    n = int(x.shape[0])
    if n == 0 or n % group_size:
        raise ValueError("roundtrip needs len(x) % group_size == 0")
    ok_dev, cs_dev = _resident_roundtrip_jit(
        x.astype(jnp.uint8), group_size, table_log, interpret)
    return bool(np.asarray(ok_dev)), int(np.asarray(cs_dev)), n


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _resident_mixed_rt_jit(x, group_size: int, table_log: int,
                           coded_idx: tuple, interpret: bool):
    """Device-resident roundtrip for MIXED batches (BASELINE config 5 /
    the fileio.c:347-404 per-block fallback analogue, VERDICT r4 next #4):
    the fused compress classifies every group on device (coded/RLE/raw),
    the coded subset decodes through the windowed kernel, RLE groups
    rebuild by broadcast, raw groups by an HBM copy — the payload never
    crosses the host link.

    coded_idx is the batch's coded-group composition (host-known after one
    warmup sync of the per-group flag scalars; static so the decode batch
    shape compiles).  Returns (ok, total_csize_hw of coded groups)."""
    import jax.numpy as jnp

    from ..ops.rans_tables import pack_rans_dtable_batch
    from .rans_kernels import rans_decode_w

    G = x.shape[0] // group_size
    xp = x.reshape(G, group_size)
    lens = jnp.full((G,), group_size, jnp.int32)
    n_pad = _pad_n(group_size)
    stream, fin, csize, stots, norm_s, _norm, flags, mfs, srcw = \
        _resident_compress_jit(xp, lens, n_pad, table_log, True, interpret)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _round8((n_pad + 127) // 128 + 16)
    ci = jnp.asarray(coded_idx, jnp.int32)
    dtbl = pack_rans_dtable_batch(norm_s[ci], table_log)
    if t4 % 32 == 0:
        out, err = rans_decode_w(csize[ci], dtbl, fin[ci], stream[ci],
                                 stots[ci], t4, hcap, 8, table_log, 32,
                                 interpret)
    else:
        out, err = rans_decode_v2(csize[ci], dtbl, fin[ci], stream[ci],
                                  stots[ci], t4, hcap, interpret, table_log)
    # reconstruct every group in the i32 word domain and verify against
    # the encoder's padded source words (bijective with the input bytes)
    rle = flags == 1
    raw = flags == 4
    # RLE rebuild: each word is the run byte replicated (int32 mul wraps,
    # reproducing the bit pattern)
    rle_words = (mfs * 0x01010101)[:, None, None]
    recw = jnp.where(rle[:, None, None], rle_words, srcw)  # RLE | raw copy
    recw = recw.at[ci].set(out.reshape(len(coded_idx), t4 * 8, 128))
    ok = (jnp.all(recw == srcw) & jnp.all(err == 0)
          & jnp.all((flags == 0) | rle | raw))
    return ok, jnp.sum(csize * (flags == 0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _resident_roundtrip_jit(x, group_size: int, table_log: int,
                            interpret: bool):
    import jax.numpy as jnp

    from ..ops.rans_tables import pack_rans_dtable_batch

    G = x.shape[0] // group_size
    xp = x.reshape(G, group_size)
    lens = jnp.full((G,), group_size, jnp.int32)
    n_pad = _pad_n(group_size)
    stream, fin, csize, stots, norm_s, _norm, flags, _mfs, srcw = \
        _resident_compress_jit(xp, lens, n_pad, table_log, True, interpret)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _round8((n_pad + 127) // 128 + 16)
    dtbl = pack_rans_dtable_batch(norm_s, table_log)
    # the roundtrip must size the decode for the WORST-CASE stream (csize
    # is traced, hrows is static), which makes the resident v2 kernel
    # collapse its interleave on the inflated VMEM estimate; the windowed
    # kernel's VMEM footprint is independent of stream size, so it keeps
    # full width here (r4: roundtrip 0.69 -> ~1.2 GB/s)
    if t4 % 32 == 0:
        from .rans_kernels import rans_decode_w

        out, err = rans_decode_w(csize, dtbl, fin, stream, stots, t4, hcap,
                                 8, table_log, 32, interpret)
    else:
        out, err = rans_decode_v2(csize, dtbl, fin, stream, stots, t4, hcap,
                                  interpret, table_log)
    # verify in the i32 WORD domain against the encoder's own padded
    # source words: word equality implies byte equality of the padded
    # stream (srcw is a bijection of it), and it avoids a byte-level
    # bitcast of the whole output, which lowers pathologically on TPU
    ok = (jnp.all(out.reshape(srcw.shape) == srcw) & jnp.all(err == 0)
          & jnp.all(flags == 0))
    return ok, jnp.sum(csize)
