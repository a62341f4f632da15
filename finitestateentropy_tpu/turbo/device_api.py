"""Device-resident TurboRANS: compress/decompress data that LIVES on the
TPU without round-tripping the payload through the host.

The reference is a CPU library, so its whole pipeline is "host-resident";
on TPU the natural production flow compresses tensors already in HBM
(checkpoints, activations, KV caches) and decompresses straight back into
HBM.  The split here keeps every large transfer off the link:

  compress:  device histogram (ops/hist.py, one-hot + MXU) ->
             pull COUNTS (1 KiB/group) -> host normalization/NCount
             (256-entry work, bit-exact refimpl) -> push tables
             (~KiB/group) -> device encode2 kernel -> pull only the
             COMPRESSED halfwords + 4 KiB states per group.
  decompress: host parses headers (tiny), pushes compressed payload +
             tables, the v2 kernel decodes, and the OUTPUT STAYS ON
             DEVICE as a jax.Array.

Wire bytes are identical to turbo_compress_device (differentially
tested), so frames interchange freely with the host/native paths.
"""
from __future__ import annotations

import numpy as np

from ..refimpl.ncount import fse_write_ncount
from ..refimpl.norm import fse_normalize_count, fse_optimal_table_log
from .format import TURBO_STEP_SYMS, _pad_n
from .rans import (FLAG_RAW, FLAG_RLE, FLAG_STEPTOTS, FLAG_TOTALS,
                   RANS_MAGIC, RANS_TABLELOG, _HDR, parse_rans_group)
from .rans_kernels import (pack_rans_ctables, pack_rans_dtable,
                           rans_decode_v2, rans_encode2)

DEFAULT_GROUP = 1 << 20


def _round8(x: int) -> int:
    return (x + 7) // 8 * 8


def rans_compress_resident(x, group_size: int = DEFAULT_GROUP,
                           table_log: int = 0,
                           steptots: bool = True,
                           totals_only: bool = False,
                           interpret: bool | None = None) -> bytes:
    """Compress a device-resident uint8 jax.Array; only counts, tables and
    the compressed result cross the host<->device link."""
    import jax
    import jax.numpy as jnp

    from ..ops.hist import hist_count_masked

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if table_log == 0:
        from .rans import RANS_SPEED_TABLELOG

        table_log = RANS_SPEED_TABLELOG if steptots else RANS_TABLELOG
    n = int(x.shape[0])
    if n == 0:
        return _HDR.pack(RANS_MAGIC, 0, 0, 0, FLAG_RAW, 0)
    if group_size > DEFAULT_GROUP:
        raise ValueError("resident path currently caps groups at 1 MiB")
    x = x.astype(jnp.uint8)

    G = (n + group_size - 1) // group_size
    gpad = G * group_size
    xp = jnp.pad(x, (0, gpad - n)).reshape(G, group_size)
    lens = np.minimum(np.full(G, group_size, np.int64),
                      n - np.arange(G, dtype=np.int64) * group_size)
    counts = np.asarray(hist_count_masked(
        xp, group_size, jnp.asarray(lens.astype(np.int32))))  # 1 KiB/group

    # host: stats on the 256-entry counts only
    preps = []
    for g in range(G):
        ln = int(lens[g])
        count = counts[g]
        max_sv = int(np.nonzero(count)[0].max())
        mfs = int(count.argmax())
        if int(count[mfs]) == ln:
            preps.append(("rle", mfs))
            continue
        tlog = min(table_log, fse_optimal_table_log(table_log, ln, max_sv))
        norm, tlog = fse_normalize_count(tlog, count[: max_sv + 1], ln, max_sv)
        if tlog != table_log:
            norm, tlog = fse_normalize_count(table_log, count[: max_sv + 1],
                                             ln, max_sv)
        preps.append(("enc", (np.asarray(norm, np.int32), max_sv,
                              fse_write_ncount(norm, max_sv, tlog), mfs)))

    enc_idx = [g for g, p in enumerate(preps) if p[0] == "enc"]
    results: dict[int, bytes] = {}
    for g, p in enumerate(preps):
        if p[0] == "rle":
            ch0 = p[1]
            results[g] = _HDR.pack(RANS_MAGIC, int(lens[g]), 0, 0, FLAG_RLE,
                                   0) + bytes([ch0]) + b"\0" * 3

    if enc_idx:
        GE = len(enc_idx)
        n_pad = _pad_n(group_size)
        t4 = n_pad // TURBO_STEP_SYMS
        hcap = _round8((n_pad + 127) // 128 + 16)
        fc = np.zeros((GE, 2, 128), np.int32)
        mg = np.zeros((GE, 2, 128), np.int32)
        mfs_arr = np.zeros(GE, np.int32)
        for j, g in enumerate(enc_idx):
            norm, max_sv, ncount, mfs = preps[g][1]
            fc[j], mg[j] = pack_rans_ctables(norm)
            mfs_arr[j] = mfs
        # device-side staging: pad ragged tails with mfs + lane-view pack
        sel = xp[jnp.asarray(np.asarray(enc_idx, np.int32))]
        pos = jnp.arange(group_size, dtype=jnp.int32)[None, :]
        lensel = jnp.asarray(lens[enc_idx].astype(np.int32))[:, None]
        padded = jnp.where(pos < lensel, sel,
                           jnp.asarray(mfs_arr, jnp.uint8)[:, None])
        extra = n_pad - group_size
        if extra:
            padded = jnp.concatenate(
                [padded, jnp.broadcast_to(
                    jnp.asarray(mfs_arr, jnp.uint8)[:, None], (GE, extra))],
                axis=1)
        srcw = jax.lax.bitcast_convert_type(
            padded.reshape(GE, n_pad // 4, 4), jnp.uint32
        ).astype(jnp.int32).reshape(GE, t4 * 8, 128)
        stream, fin, csize, stots = rans_encode2(
            jnp.asarray(fc), jnp.asarray(mg), srcw, t4, hcap,
            interpret, False, table_log, steptots)
        csize_np = np.asarray(csize)
        fin_np = np.asarray(fin)
        stots_np = np.asarray(stots).astype(np.uint8) if steptots else None
        stream_np = np.asarray(stream)  # NOTE: pull could slice per-group
        for j, g in enumerate(enc_idx):
            norm, max_sv, ncount, mfs = preps[g][1]
            cs = int(csize_np[j])
            hw = stream_np[j].reshape(-1)[:cs].astype(np.uint16)
            ncount_pad = ncount + b"\0" * (-len(ncount) % 4)
            if steptots and totals_only:
                sect = (stots_np[j].astype(np.uint16).sum(axis=1)
                        .astype("<u2").tobytes())
                fl = FLAG_TOTALS
            elif steptots:
                sect = stots_np[j].reshape(-1).tobytes()
                fl = FLAG_STEPTOTS
            else:
                sect, fl = b"", 0
            ln = int(lens[g])
            blob = (_HDR.pack(RANS_MAGIC, ln, cs, table_log, fl, len(ncount))
                    + ncount_pad
                    + fin_np[j].reshape(-1).view(np.uint32).astype("<u4").tobytes()
                    + sect + hw.astype("<u2").tobytes())
            if len(blob) >= ln + _HDR.size:
                raw = np.asarray(xp[g, :ln])  # incompressible: pull the data
                blob = _HDR.pack(RANS_MAGIC, ln, 0, 0, FLAG_RAW, 0) + raw.tobytes()
            results[g] = blob
    return b"".join(results[g] for g in range(G))


def rans_decompress_resident(blob: bytes, interpret: bool | None = None):
    """Decompress a TurboRANS stream INTO device memory: the uplink carries
    only the compressed payload + tables; returns a uint8 jax.Array."""
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

    pieces = []
    for i, g in enumerate(groups):
        n, csize_hw, tlog, flags, norm, max_sv, init, payload, stots = g
        if flags & FLAG_RAW:
            pieces.append(jnp.asarray(np.frombuffer(payload, np.uint8)[:n]))
            continue
        if flags & FLAG_RLE:
            pieces.append(jnp.full(n, payload[0], jnp.uint8))
            continue
        n_pad = _pad_n(n)
        t4 = n_pad // TURBO_STEP_SYMS
        hrows = _round8((csize_hw + 127) // 128 + 16)
        hws = np.zeros((1, hrows, 128), np.int32)
        hws.reshape(-1)[:csize_hw] = np.frombuffer(payload, "<u2").astype(np.int32)
        if stots is None:
            from .rans_kernels import rans_decode

            outw, err = rans_decode(
                jnp.asarray(np.array([csize_hw], np.int32)),
                jnp.asarray(pack_rans_dtable(norm, tlog)[None]),
                jnp.asarray(init.view(np.int32).reshape(1, 8, 128)),
                jnp.asarray(hws), t4, hrows, interpret, False, tlog)
        else:
            st = (stots.astype(np.int32)[None]
                  if stots.ndim == 2 else stots.astype(np.int32)[None])
            outw, err = rans_decode_v2(
                jnp.asarray(np.array([csize_hw], np.int32)),
                jnp.asarray(pack_rans_dtable(norm, tlog)[None]),
                jnp.asarray(init.view(np.int32).reshape(1, 8, 128)),
                jnp.asarray(hws), jnp.asarray(st), t4, hrows, interpret, tlog)
        if int(np.asarray(err)[0]):
            raise ValueError(f"resident decode: corrupt group {i}")
        import jax

        flat = jax.lax.bitcast_convert_type(
            outw.reshape(1, t4 * 8, 128).astype(jnp.uint32)[0],
            jnp.uint8).reshape(-1)
        pieces.append(flat[:n])
    return jnp.concatenate(pieces) if pieces else jnp.zeros(0, jnp.uint8)
