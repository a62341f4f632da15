"""Huff0 codec pipeline: host tree/headers + batched device 4-stream coder.

Tree build, length limiting and the weight header are 256-symbol host work
(refimpl.huf); the per-symbol encode and the 4-stream decode chains run on
device.  Decode always uses the X1 (single-symbol) kernel — X1 and X2 decode
identical bytes; the reference's selector (huf_decompress.c:1029-1051) is a
CPU cache heuristic with no wire-format effect.
"""
from __future__ import annotations

import numpy as np

from ..config import HUF_TABLELOG_DEFAULT, huf_blockbound
from ..errors import CorruptionError
from ..refimpl.blocktypes import BlockResult
from ..refimpl.hist import hist_count
from ..refimpl.huf import (
    huf_build_ctable,
    huf_read_stats,
    huf_write_ctable,
)
from ..refimpl.norm import fse_optimal_table_log


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class HufTpuCodec:
    """Batched Huff0 coder. `mesh` > 1 shards the block batch data-parallel
    over that many devices (parallel/dp.py).

    decoder: "x1" (default) or "x2" — both wire-identical; X2 packs up to
    two symbols per lookup (huf_decompress.c:454-953).  On TPU the X1 shim
    measures faster (fewer gathers/symbol beats the halved loop count; see
    PERFORMANCE.md), so unlike the reference's selector there is no
    ratio-based auto-switch."""

    def __init__(self, block_size: int = 32768, mesh: int = 0,
                 decoder: str = "x1"):
        if decoder not in ("x1", "x2"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.block_size = block_size
        self.mesh = mesh
        self.decoder = decoder
        self._jax = None

    def _get_mesh(self):
        if self.mesh and self.mesh > 1:
            from ..parallel.mesh import get_mesh

            return get_mesh(self.mesh)
        return None

    def _ensure_jax(self):
        if self._jax is None:
            import jax
            import jax.numpy as jnp

            from ..ops import huf_kernels

            self._jax = (jax, jnp, huf_kernels)
        return self._jax

    # -- compression ------------------------------------------------------

    def compress_blocks(self, blocks):
        jax, jnp, huf_kernels = self._ensure_jax()
        results: list[BlockResult | None] = [None] * len(blocks)

        todo = []  # (idx, block, header, val[256], nb[256])
        for i, b in enumerate(blocks):
            n = len(b)
            if n == 0 or n < 12:
                results[i] = BlockResult.raw()
                continue
            count, max_sv, largest = hist_count(b)
            if largest == n:
                results[i] = BlockResult.rle()
                continue
            if largest <= (n >> 7) + 4:
                results[i] = BlockResult.raw()
                continue
            huff_log = fse_optimal_table_log(HUF_TABLELOG_DEFAULT, n, max_sv, minus=1, max_allowed=12)
            table = huf_build_ctable(count, max_sv, huff_log)
            header = huf_write_ctable(table, max_sv)
            if len(header) + 12 >= n:
                results[i] = BlockResult.raw()
                continue
            val = np.zeros(256, dtype=np.uint16)
            nb = np.zeros(256, dtype=np.uint8)
            val[: max_sv + 1] = table.val
            nb[: max_sv + 1] = table.nb_bits
            todo.append((i, b, header, val, nb))

        if todo:
            B = len(todo)
            S = _round_up(self.block_size, 8)
            seg_bytes = _round_up(huf_blockbound((self.block_size + 3) // 4) + 8, 8)
            src = np.zeros((B, S), dtype=np.uint8)
            ns = np.zeros(B, dtype=np.int32)
            vals = np.zeros((B, 256), dtype=np.uint16)
            nbs = np.zeros((B, 256), dtype=np.uint8)
            for k, (i, b, _h, val, nb) in enumerate(todo):
                src[k, : len(b)] = np.frombuffer(b, dtype=np.uint8)
                ns[k] = len(b)
                vals[k] = val
                nbs[k] = nb
            mesh = self._get_mesh()
            if mesh is not None:
                from .fse_codec import _pad_batch
                from ..parallel.dp import sharded_huf_encode

                srcp, nsp, valsp, nbsp = _pad_batch(
                    [src, ns, vals, nbs], mesh.devices.size)
                step = sharded_huf_encode(mesh, S, seg_bytes)
                words, sizes = step(jnp.asarray(srcp), jnp.asarray(nsp),
                                    jnp.asarray(valsp), jnp.asarray(nbsp))
            else:
                words, sizes = huf_kernels.huf_encode_4x_batch(
                    jnp.asarray(src), jnp.asarray(ns), jnp.asarray(vals), jnp.asarray(nbs),
                    S, seg_bytes,
                )
            words = np.asarray(words)[:B]
            sizes = np.asarray(sizes)[:B]
            for k, (i, b, header, _v, _nb) in enumerate(todo):
                s = sizes[k]
                if np.any(s == 0) or s[0] > 65535 or s[1] > 65535 or s[2] > 65535:
                    results[i] = BlockResult.raw()
                    continue
                jump = b"".join(int(s[j]).to_bytes(2, "little") for j in range(3))
                streams = b"".join(
                    words[k, j].astype("<u4").tobytes()[: s[j]] for j in range(4)
                )
                payload = header + jump + streams
                if len(payload) >= len(b) - 1:
                    results[i] = BlockResult.raw()
                else:
                    results[i] = BlockResult.compressed(payload)
        return results

    # -- decompression ----------------------------------------------------

    def decompress_blocks(self, items):
        jax, jnp, huf_kernels = self._ensure_jax()
        if not items:
            return []
        # raw/rle shortcuts (cSrc==dst / 1 byte) are frame-level; here every
        # payload is header + jumpTable + 4 streams
        seg_cap = (self.block_size + 3) // 4
        S = _round_up(huf_blockbound(seg_cap) + 8, 8)
        B = len(items)
        streams = np.zeros((B * 4, S), dtype=np.uint8)
        csize = np.zeros(B * 4, dtype=np.int32)
        nout = np.zeros(B * 4, dtype=np.int32)
        tlogs = np.zeros(B * 4, dtype=np.int32)
        weights = np.zeros((B, 256), dtype=np.int32)
        x2_tbl = (np.zeros((B, 4096), dtype=np.int32)
                  if self.decoder == "x2" else None)
        x2_tlogs = np.zeros(B, dtype=np.int32)
        segs = np.zeros(B, dtype=np.int32)
        for k, (payload, rsize) in enumerate(items):
            if self.decoder == "x2":
                from ..ops.huf_kernels import pack_dtable_x2
                from ..refimpl.huf import huf_read_dtable_x2

                dt2, _used2 = huf_read_dtable_x2(payload)
                x2_tbl[k] = pack_dtable_x2(dt2)
                x2_tlogs[k] = dt2.table_log
            w, rank_stats, nbsym, tlog, used = huf_read_stats(payload)
            body = payload[used:]
            if len(body) < 10:
                raise CorruptionError("huf 4X: input too small")
            l1 = int.from_bytes(body[0:2], "little")
            l2 = int.from_bytes(body[2:4], "little")
            l3 = int.from_bytes(body[4:6], "little")
            l4 = len(body) - 6 - l1 - l2 - l3
            if l4 < 0:
                raise CorruptionError("huf 4X: jump table overflow")
            seg = (rsize + 3) // 4
            segs[k] = seg
            lens = (l1, l2, l3, l4)
            pos = 6
            for j in range(4):
                sl = lens[j]
                if sl > S:
                    raise CorruptionError("huf stream larger than bound")
                streams[4 * k + j, :sl] = np.frombuffer(body[pos : pos + sl], dtype=np.uint8)
                csize[4 * k + j] = sl
                nout[4 * k + j] = seg if j < 3 else rsize - 3 * seg
                tlogs[4 * k + j] = tlog
                pos += sl
            weights[k, : len(w)] = np.frombuffer(w, dtype=np.uint8)

        # device: tables per block, replicated x4 for the stream axis
        mesh = self._get_mesh()
        if self.decoder == "x2":
            tl4 = np.repeat(x2_tlogs, 4)
            tbl4 = jnp.asarray(np.repeat(x2_tbl, 4, axis=0))
            out, err = huf_kernels.huf_decode_4x2_batch(
                jnp.asarray(streams), jnp.asarray(csize), jnp.asarray(nout),
                jnp.asarray(tl4), tbl4, max_seg=seg_cap)
        elif mesh is not None:
            from .fse_codec import _pad_batch
            from ..parallel.dp import sharded_huf_decode

            m = mesh.devices.size
            # pad the block dim to the mesh (stream rows pad 4-at-a-time so
            # each dummy block carries its 4 streams)
            weightsp, = _pad_batch([weights], m)
            Bp = weightsp.shape[0]
            rep4 = (lambda a: np.concatenate(
                [a, np.tile(a[:4], (Bp - B,) + (1,) * (a.ndim - 1))])
                if Bp > B else a)
            step = sharded_huf_decode(mesh, seg_cap)
            out, err = step(jnp.asarray(rep4(streams)), jnp.asarray(rep4(csize)),
                            jnp.asarray(rep4(nout)), jnp.asarray(rep4(tlogs)),
                            jnp.asarray(weightsp),
                            jnp.asarray(np.resize(tlogs.reshape(B, 4)[:, 0], Bp)))
        else:
            wj = jnp.asarray(weights)
            tl_blocks = jnp.asarray(tlogs.reshape(B, 4)[:, 0])
            byte_tbl, nb_tbl = huf_kernels.build_dtables_x1(wj, tl_blocks)
            byte4 = jnp.repeat(byte_tbl, 4, axis=0)
            nb4 = jnp.repeat(nb_tbl, 4, axis=0)
            out, err = huf_kernels.huf_decode_4x1_batch(
                jnp.asarray(streams), jnp.asarray(csize), jnp.asarray(nout),
                jnp.asarray(tlogs), (byte4, nb4), max_seg=seg_cap,
            )
        out = np.asarray(out)[: 4 * B]
        err = np.asarray(err)[: 4 * B]
        res = []
        for k, (_payload, rsize) in enumerate(items):
            if err[4 * k : 4 * k + 4].any():
                raise CorruptionError(f"huf block {k}: stream not fully consumed")
            seg = segs[k]
            parts = [out[4 * k + j, : (seg if j < 3 else rsize - 3 * seg)] for j in range(4)]
            res.append(np.concatenate(parts).tobytes())
        return res
