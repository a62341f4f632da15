"""Data-parallel sharded codec steps.

Blocks shard across the mesh's `dp` axis; tables are built per block (so they
shard with their blocks — no replication traffic); the only collective is the
all-gather of per-block compressed sizes used for order-preserving frame
assembly (SURVEY §2 parallelism table).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fse_kernels, fse_tables, huf_kernels


def _dp(mesh: Mesh):
    return NamedSharding(mesh, P("dp"))


def sharded_encode(mesh: Mesh, max_syms: int, out_bytes: int):
    """Returns a jitted fn: (src[B,S], n[B], norm[B,256], tlog[B]) ->
    (words[B,W], csize[B], total_csize scalar). B must divide the mesh."""
    dp = _dp(mesh)
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(dp, dp, dp, dp),
        out_shardings=(dp, dp, rep),
    )
    def step(src, n, norm, tlog):
        ctables = fse_tables.build_ctables(norm, tlog)
        words, csize = fse_kernels.fse_encode_batch(
            src, n, tlog, ctables, max_syms=max_syms, out_bytes=out_bytes
        )
        # order-preserving assembly needs the global size prefix — an
        # all-gather/reduction across the dp axis (rides ICI)
        total = jnp.sum(csize)
        return words, csize, total

    return step


def sharded_decode(mesh: Mesh, max_out: int):
    """Returns a jitted fn: (streams[B,S], csize[B], n[B], norm[B,256],
    tlog[B]) -> (out[B,max_out], err[B])."""
    dp = _dp(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(dp, dp, dp, dp, dp),
        out_shardings=(dp, dp),
    )
    def step(streams, csize, n, norm, tlog):
        dt = fse_tables.build_dtables(norm, tlog)
        out, err = fse_kernels.fse_decode_batch(
            streams, csize, n, tlog, dt[:3], max_out=max_out
        )
        return out, err

    return step


def sharded_huf_encode(mesh: Mesh, max_syms: int, seg_bytes: int):
    """(src[B,S], n[B], val[B,256], nb[B,256]) sharded over dp ->
    (words[B,4,W], sizes[B,4]).  B must be a multiple of the mesh size."""
    dp = _dp(mesh)

    @functools.partial(jax.jit, in_shardings=(dp, dp, dp, dp),
                       out_shardings=(dp, dp))
    def step(src, n, val, nb):
        return huf_kernels.huf_encode_4x_batch(src, n, val, nb,
                                               max_syms, seg_bytes)

    return step


def sharded_huf_decode(mesh: Mesh, max_seg: int):
    """(streams[4B,S], csize[4B], nout[4B], tlogs[4B], weights[B,256],
    tl_blocks[B]) -> (out[4B,max_seg], err[4B]).  The per-block X1 tables
    build inside the jit so they shard with their streams."""
    dp = _dp(mesh)

    @functools.partial(jax.jit, in_shardings=(dp, dp, dp, dp, dp, dp),
                       out_shardings=(dp, dp))
    def step(streams, csize, nout, tlogs, weights, tl_blocks):
        byte_tbl, nb_tbl = huf_kernels.build_dtables_x1(weights, tl_blocks)
        byte4 = jnp.repeat(byte_tbl, 4, axis=0)
        nb4 = jnp.repeat(nb_tbl, 4, axis=0)
        return huf_kernels.huf_decode_4x1_batch(
            streams, csize, nout, tlogs, (byte4, nb4), max_seg=max_seg)

    return step


def sharded_fse_step(mesh: Mesh, block_size: int = 4096):
    """Full round-trip step (encode -> decode -> verify), sharded over dp.

    This is the "training step" analogue used by the multi-chip dry run:
    per-block table build + 2-state encode + bit pack + decode, with the
    size-reduction collective, all under one jit over the mesh.
    """
    S = block_size
    out_bytes = S + (S >> 6) + 64
    dp = _dp(mesh)
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(dp, dp, dp, dp),
        out_shardings=(rep, rep),
    )
    def step(src, n, norm, tlog):
        ctables = fse_tables.build_ctables(norm, tlog)
        words, csize = fse_kernels.fse_encode_batch(
            src, n, tlog, ctables, max_syms=S, out_bytes=out_bytes
        )
        from ..ops.bitio import words_to_bytes

        streams = words_to_bytes(words)
        dt = fse_tables.build_dtables(norm, tlog)
        out, err = fse_kernels.fse_decode_batch(
            streams, csize, n, tlog, dt[:3], max_out=S
        )
        ok = jnp.all(~err) & jnp.all(
            jnp.where(
                jnp.arange(S)[None, :] < n[:, None], out == src, True
            )
        )
        return ok, jnp.sum(csize)

    return step
