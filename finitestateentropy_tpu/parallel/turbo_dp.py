"""Data-parallel TurboRANS over a device mesh.

Groups are embarrassingly parallel, so the sharding story is the reference's
block-independence seam (SURVEY §2 parallelism table) at group granularity:
group arrays shard over the mesh's `dp` axis, the Pallas kernels run
per-shard under shard_map (XLA cannot auto-partition custom kernels), and
the only collectives are the compressed-size reduction / all-gather used for
order-preserving frame assembly — they ride ICI on a real slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..turbo.rans_kernels import (rans_decode, rans_decode_v2, rans_decode_w,
                                  rans_encode, rans_encode2)


def sharded_turbo_encode(mesh: Mesh, t4_count: int, hrows_cap: int,
                         interpret: bool = False, tlog: int = 11,
                         force_chunk: int = 0):
    """(fc[G,2,128], mg[G,2,128], srcw[G,t4*8,128]) sharded over dp ->
    (stream, final_states, csize_hw sharded; total_hw replicated).

    Uses rans_encode2 (packed out words + chunked src reads) so sharded
    encode matches the single-device path exactly, including multi-MiB
    groups whose halfword-expanded v1 out buffer would not fit VMEM."""

    def local(fc, mg, srcw):
        stream, fin, csize, _ = rans_encode2(fc, mg, srcw, t4_count,
                                             hrows_cap, interpret,
                                             False, tlog, False, force_chunk)
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return stream, fin, csize, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P("dp"), P("dp"), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_decode(mesh: Mesh, t4_count: int, hrows: int,
                         interpret: bool = False, tlog: int = 11,
                         u16: bool = False, pair: bool = False):
    """(csize[G], tbl[G,16,128], init[G,8,128], hws[G,srows,128] packed
    payload words) -> (out sharded, err sharded, any_err replicated)."""

    def local(cs, tbl, init, hws):
        out, err = rans_decode(cs, tbl, init, hws, t4_count, hrows, interpret,
                               u16, tlog, False, pair)
        any_err = jax.lax.pmax(jnp.max(jnp.abs(err)), "dp")
        return out, err, any_err

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P("dp"), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_encode_v2(mesh: Mesh, t4_count: int, hrows_cap: int,
                            interpret: bool = False, tlog: int = 11,
                            force_chunk: int = 0, u16: bool = False,
                            rowloc: bool = False, quad: bool = False):
    """Production speed-mode encode (FLAG_STEPTOTS wire) sharded over dp:
    (fc, mg, srcw) -> (stream, final_states, csize_hw, steptots sharded;
    total_hw replicated).  u16 selects the 2-symbols-per-lane-slot source
    layout (fseU16-class / pair wires); rowloc the row-local placement."""

    def local(fc, mg, srcw):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, t4_count,
                                                 hrows_cap, interpret,
                                                 u16, tlog, True,
                                                 force_chunk, rowloc, quad)
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return stream, fin, csize, stots, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_decode_v2(mesh: Mesh, t4_count: int, hrows: int,
                            interpret: bool = False, tlog: int = 11,
                            u16: bool = False, pair: bool = False,
                            quad: bool = False):
    """Production v2 decode (shipped steptots) sharded over dp:
    (csize, tbl, init, hws, steptots) -> (out sharded, err sharded,
    any_err replicated).  u16/pair select the 2-symbols-per-lane-slot
    wires (fseU16-class / order-1 pair, turbo/pair.py)."""

    def local(cs, tbl, init, hws, stots):
        out, err = rans_decode_v2(cs, tbl, init, hws, stots, t4_count, hrows,
                                  interpret, tlog, u16, False, pair, quad)
        any_err = jax.lax.pmax(jnp.max(jnp.abs(err)), "dp")
        return out, err, any_err

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P("dp"), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_decode_w(mesh: Mesh, t4_count: int, hrows: int, nway: int,
                           tlog: int = 11, S: int = 32,
                           interpret: bool = False, u16: bool = False,
                           u16x: bool = False):
    """HBM-windowed decode (rans_decode_w) sharded over dp — same contract
    as sharded_turbo_decode_v2 but the packed streams stay in (per-shard)
    HBM with double-buffered VMEM windows, so big groups / near-raw
    streams keep their interleave width on every chip."""

    def local(cs, tbl, init, hws, stots):
        out, err = rans_decode_w(cs, tbl, init, hws, stots, t4_count, hrows,
                                 nway, tlog, S, interpret, u16, u16x)
        any_err = jax.lax.pmax(jnp.max(jnp.abs(err)), "dp")
        return out, err, any_err

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P("dp"), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_roundtrip_v2(mesh: Mesh, t4_count: int, hrows_cap: int,
                               interpret: bool = False, tlog: int = 11):
    """Speed-mode round-trip over the mesh — the multi-chip dry-run payload
    for the production (FLAG_STEPTOTS + v2 kernel) path: encode emits
    per-step renorm counts, decode consumes them via the fused-rank v2
    kernel.  Returns (ok replicated, total_hw replicated)."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, t4_count,
                                                 hrows_cap, interpret,
                                                 False, tlog, True)
        out, err = rans_decode_v2(csize, dtbl, fin, stream, stots,
                                  t4_count, hrows_cap, interpret, tlog)
        ok = jnp.all(out == srcw) & jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_roundtrip_w(mesh: Mesh, t4_count: int, hrows_cap: int,
                              nway: int = 1, S: int = 32,
                              interpret: bool = False, tlog: int = 11):
    """Round 4 production-path round-trip over the mesh: ROW-LOCAL encode
    placement (rans_encode2 rowloc=True) -> HBM-WINDOWED decode
    (rans_decode_w), sharded over dp.  Covers the r3 kernels the driver's
    multi-chip artifact must regress (VERDICT r3 item 5)."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, t4_count,
                                                 hrows_cap, interpret,
                                                 False, tlog, True, 0, True)
        out, err = rans_decode_w(csize, dtbl, fin, stream, stots,
                                 t4_count, hrows_cap, nway, tlog, S,
                                 interpret)
        ok = jnp.all(out == srcw) & jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo16_roundtrip(mesh: Mesh, t2_count: int, hrows_cap: int,
                              interpret: bool = False, tlog: int = 11):
    """u16 (fseU16-class) speed-mode round-trip over the mesh: encode2
    (u16 symbols, packed out) -> v2 decode, sharded over dp.  Certifies
    the u16 production wire in the multi-chip dry run (VERDICT r2 #8)."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, t2_count,
                                                 hrows_cap, interpret,
                                                 True, tlog, True)
        out, err = rans_decode_v2(csize, dtbl, fin, stream, stots,
                                  t2_count, hrows_cap, interpret, tlog, True)
        ok = jnp.all(out == srcw) & jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_pair_roundtrip(mesh: Mesh, t2_count: int, hrows_cap: int,
                                 interpret: bool = False, tlog: int = 9):
    """Pair-wire (order-1, turbo/pair.py) round-trip over the mesh: the
    r5 default dispatch for pair-eligible byte groups — encode2 u16-mode
    rowloc over pair ids, decode via the pair-mode v2 kernel (pair-value
    LUT gathered off the serial path).  Returns (ok, total_hw) replicated."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, t2_count,
                                                 hrows_cap, interpret,
                                                 True, tlog, True, 0, True)
        out, err = rans_decode_v2(csize, dtbl, fin, stream, stots,
                                  t2_count, hrows_cap, interpret, tlog,
                                  True, False, True)
        # out holds pair VALUES (LUT-mapped); srcw holds pair ids — verify
        # via err flags + csize consistency, the value check runs host-side
        ok = jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return out, ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_quad_roundtrip(mesh: Mesh, steps: int, hrows_cap: int,
                                 interpret: bool = False, tlog: int = 11):
    """Quad-wire (order-3, turbo/quad.py) round-trip over the mesh: spc=1
    encode over quad ids -> quad-mode v2 decode (one full output word per
    lane per step).  Returns (out sharded, ok, total_hw replicated)."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, stots = rans_encode2(fc, mg, srcw, steps,
                                                 hrows_cap, interpret,
                                                 False, tlog, True, 0, True,
                                                 True)
        out, err = rans_decode_v2(csize, dtbl, fin, stream, stots,
                                  steps, hrows_cap, interpret, tlog,
                                  False, False, False, True)
        ok = jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return out, ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp"), P(), P()),
                   check_vma=False)
    return jax.jit(fn)


def sharded_turbo_roundtrip(mesh: Mesh, t4_count: int, hrows_cap: int,
                            interpret: bool = False):
    """Full encode -> decode -> verify step over the mesh (the multi-chip
    dry-run payload): returns (ok replicated, total_hw replicated)."""

    def local(fc, mg, srcw, dtbl):
        stream, fin, csize, _ = rans_encode2(fc, mg, srcw, t4_count,
                                             hrows_cap, interpret,
                                             False, 11, False)
        out, err = rans_decode(csize, dtbl, fin, stream, t4_count, hrows_cap,
                               interpret)
        ok = jnp.all(out == srcw) & jnp.all(err == 0)
        ok = jax.lax.pmin(ok.astype(jnp.int32), "dp")
        total = jax.lax.psum(jnp.sum(csize), "dp")
        return ok, total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)
