"""FSE codec pipeline: host stats/headers + batched device coder.

Stage split (SURVEY §7 design): histograms / normalization / NCount headers
are tiny sequential work done host-side in numpy; table construction and the
state-chain coder run batched on device (ops/fse_tables, ops/fse_kernels).
Wire output is byte-identical to the host twin (differentially tested).
"""
from __future__ import annotations

import numpy as np

from ..config import FSE_DEFAULT_TABLELOG, FSE_MAX_SYMBOL_VALUE, fse_blockbound
from ..errors import CorruptionError, FSEError
from ..refimpl.blocktypes import BlockResult, Kind
from ..refimpl.ncount import fse_read_ncount, fse_write_ncount
from ..refimpl.norm import fse_normalize_count, fse_optimal_table_log


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_batch(arrs, m: int):
    """Pad each array's leading dim to a multiple of m by repeating row 0
    (dummy blocks decode to garbage that callers slice away)."""
    B = arrs[0].shape[0]
    pad = (-B) % m
    if pad == 0:
        return arrs
    return [np.concatenate([a, np.repeat(a[:1], pad, axis=0)]) for a in arrs]


class FseTpuCodec:
    """Batched FSE coder. `mesh` > 1 shards the block batch data-parallel
    over that many devices (parallel/dp.py; falls back single-device with a
    warning when fewer devices are attached)."""

    def __init__(self, block_size: int = 32768, mesh: int = 0):
        self.block_size = block_size
        self.mesh = mesh
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

            from ..ops import fse_kernels, fse_tables

            self._jax = (jax, jnp, fse_tables, fse_kernels)
        return self._jax

    # -- compression ------------------------------------------------------

    def compress_blocks(self, blocks):
        jax, jnp, fse_tables, fse_kernels = self._ensure_jax()
        results: list[BlockResult | None] = [None] * len(blocks)

        # host: stats, heuristics, normalization, headers
        todo = []  # (idx, block, norm, table_log, header)
        for i, b in enumerate(blocks):
            n = len(b)
            if n <= 1:
                results[i] = BlockResult.raw()
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            count = np.bincount(arr, minlength=256)
            max_sv = int(arr.max())
            max_count = int(count.max())
            if max_count == n:
                results[i] = BlockResult.rle()
                continue
            if max_count == 1 or max_count < (n >> 7):
                results[i] = BlockResult.raw()
                continue
            tlog = fse_optimal_table_log(FSE_DEFAULT_TABLELOG, n, max_sv)
            norm, tlog = fse_normalize_count(tlog, count[: max_sv + 1], n, max_sv)
            if norm is None:
                results[i] = BlockResult.rle()
                continue
            header = fse_write_ncount(norm, max_sv, tlog)
            todo.append((i, b, norm, tlog, header))

        if todo:
            B = len(todo)
            S = _round_up(self.block_size, 8)
            src = np.zeros((B, S), dtype=np.uint8)
            norms = np.zeros((B, 256), dtype=np.int32)
            tlogs = np.zeros(B, dtype=np.int32)
            ns = np.zeros(B, dtype=np.int32)
            for k, (i, b, norm, tlog, _hdr) in enumerate(todo):
                src[k, : len(b)] = np.frombuffer(b, dtype=np.uint8)
                norms[k, : len(norm)] = norm
                tlogs[k] = tlog
                ns[k] = len(b)

            out_bytes = _round_up(fse_blockbound(self.block_size), 8)
            mesh = self._get_mesh()
            if mesh is not None:
                from ..parallel.dp import sharded_encode

                m = mesh.devices.size
                srcp, nsp, normsp, tlogsp = _pad_batch(
                    [src, ns, norms, tlogs], m)
                step = sharded_encode(mesh, S, out_bytes)
                words, csize, _total = step(
                    jnp.asarray(srcp), jnp.asarray(nsp),
                    jnp.asarray(normsp), jnp.asarray(tlogsp))
            else:
                norms_j = jnp.asarray(norms)
                tlogs_j = jnp.asarray(tlogs)
                ctables = fse_tables.build_ctables(norms_j, tlogs_j)
                words, csize = self._encode(src, ns, tlogs_j, ctables, S, out_bytes)
            words = np.asarray(words)[:B]
            csize = np.asarray(csize)[:B]
            for k, (i, b, _norm, _tlog, hdr) in enumerate(todo):
                payload = words[k].astype("<u4").tobytes()[: csize[k]]
                if csize[k] == 0 or len(hdr) + len(payload) >= len(b) - 1:
                    results[i] = BlockResult.raw()
                else:
                    results[i] = BlockResult.compressed(hdr + payload)
        return results

    def _encode(self, src, ns, tlogs_j, ctables, S, out_bytes):
        jax, jnp, fse_tables, fse_kernels = self._ensure_jax()
        return fse_kernels.fse_encode_batch(
            jnp.asarray(src), jnp.asarray(ns), tlogs_j, ctables,
            max_syms=S, out_bytes=out_bytes,
        )

    # -- decompression ----------------------------------------------------

    def decompress_blocks(self, items):
        jax, jnp, fse_tables, fse_kernels = self._ensure_jax()
        if not items:
            return []
        B = len(items)
        S = _round_up(fse_blockbound(self.block_size) + 8, 8)
        max_out = _round_up(self.block_size, 8)
        streams = np.zeros((B, S), dtype=np.uint8)
        norms = np.zeros((B, 256), dtype=np.int32)
        tlogs = np.zeros(B, dtype=np.int32)
        csize = np.zeros(B, dtype=np.int32)
        nout = np.zeros(B, dtype=np.int32)
        for k, (payload, rsize) in enumerate(items):
            norm, max_sv, tlog, used = fse_read_ncount(payload)
            body = payload[used:]
            if len(body) > S:
                raise CorruptionError("fse payload larger than bound")
            streams[k, : len(body)] = np.frombuffer(body, dtype=np.uint8)
            norms[k, : len(norm)] = norm
            tlogs[k] = tlog
            csize[k] = len(body)
            nout[k] = rsize

        mesh = self._get_mesh()
        if mesh is not None:
            from ..parallel.dp import sharded_decode

            m = mesh.devices.size
            streamsp, csizep, noutp, normsp, tlogsp = _pad_batch(
                [streams, csize, nout, norms, tlogs], m)
            step = sharded_decode(mesh, max_out)
            out, err = step(jnp.asarray(streamsp), jnp.asarray(csizep),
                            jnp.asarray(noutp), jnp.asarray(normsp),
                            jnp.asarray(tlogsp))
        else:
            tlogs_j = jnp.asarray(tlogs)
            dtables = fse_tables.build_dtables(jnp.asarray(norms), tlogs_j)
            out, err = fse_kernels.fse_decode_batch(
                jnp.asarray(streams), jnp.asarray(csize), jnp.asarray(nout), tlogs_j,
                dtables[:3], max_out=max_out,
            )
        out = np.asarray(out)[:B]
        err = np.asarray(err)[:B]
        res = []
        for k, (_payload, rsize) in enumerate(items):
            if err[k]:
                raise CorruptionError(f"fse block {k}: bitstream accounting failed")
            res.append(out[k, :rsize].tobytes())
        return res
