"""Pallas TPU kernels for the TurboFSE lane-interleaved format.

Decode: one kernel instance per group; the inner fori_loop advances all 1024
tANS chains per step.  Per step: a 16-chunk lane-gather resolves the shared
2048-entry decode table for every lane; per-lane bit offsets come from an
MXU within-row prefix sum plus scalar row offsets (through a VMEM scratch
round-trip — Mosaic has no vector->scalar path); the bit window is a dynamic
8-row slice of the VMEM-resident stream, lane-gathered with an 8-chunk
select.  The symbol->lane mapping (format.py) makes each supercycle's
[8,128] u32 output tile land in ascending memory order, so the decoded
buffer needs no transpose.

The chain math mirrors fse_decompress.c:116-123 exactly (same tables); only
the interleave differs.

Role in the family (r2): this tANS variant is the BIT-GRANULAR wire — no
16-bit renorm rounding — and therefore the ratio ceiling of lane-interleaved
formats (8.82 on Proba80 at 4 MiB groups vs rANS ratio-mode's 8.80 and the
reference's 8.84; PERFORMANCE.md "parallelism tax").  Production uses the
rANS kernels because halfword-aligned renorm makes both coder directions
single-gather; this kernel is kept as the measured evidence that
bit-granularity buys only ~0.02 of ratio at 50x the decode cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .format import TURBO_LANES, TURBO_TABLELOG

TSIZE = 1 << TURBO_TABLELOG        # 2048
TCHUNKS = TSIZE // 128             # 16
MAX_STEP_BITS = TURBO_LANES * TURBO_TABLELOG  # 11264 < 12288 bound used below

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left


def _chunk_gather(rows, idx, n_chunks, shape):
    """rows: [n_chunks, 128] table; idx: [8,128] in [0, n_chunks*128).

    Per-lane lookup via broadcast-row lane gather + select per chunk.
    """
    hi = _srl(idx, 7)
    lo = idx & 127
    acc = jnp.zeros(shape, jnp.int32)
    for h in range(n_chunks):
        row = jnp.broadcast_to(rows[h : h + 1, :], shape)
        v = jnp.take_along_axis(row, lo, axis=1)
        acc = jnp.where(hi == h, v, acc)
    return acc


def _decode_kernel(csize_ref, table_ref, init_ref, stream_ref,
                   out_ref, scr_ref, *, t4_count, wrows):
    shape = (8, 128)
    g = pl.program_id(0)
    cursor0 = csize_ref[g]

    table = table_ref[0]
    # inclusive within-row prefix via one bf16 matmul, augmented last column
    # = row totals (values <= 128*11 = 1408, bf16-exact inputs, f32 accum)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 129), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 129), 1)
    tria = (c_iota >= r_iota).astype(jnp.bfloat16)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    def lookup(state):
        return _chunk_gather(table, state & (TSIZE - 1), TCHUNKS, shape)

    def step(state, cursor, last_mask):
        """One decode step. Returns (sym, new_state, new_cursor)."""
        e = lookup(state)
        sym = e & 0xFF
        nb = _srl(e, 8) & 0xF

        aug = jax.lax.dot_general(
            nb.astype(jnp.bfloat16), tria, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        within = aug[:, :128].astype(jnp.int32)
        scr_ref[0:8, 0:1] = aug[:, 128:129].astype(jnp.int32)
        offs = []
        acc = 0
        for r in range(8):
            offs.append(acc)
            acc = acc + scr_ref[r, 0]
        total = acc
        rowoff = jnp.zeros(shape, jnp.int32)
        for r in range(1, 8):
            rowoff = jnp.where(rows8 == r, offs[r], rowoff)
        prefix = within + rowoff

        off = cursor - prefix                       # field start bit
        base_row = jnp.clip(_srl(jnp.maximum(cursor - 12289, 0), 12), 0, wrows - 8)
        window = stream_ref[pl.ds(base_row, 8), :]
        rel = jnp.clip(_srl(jnp.maximum(off, 0), 5) - base_row * 128, 0, 1022)
        w0 = _chunk_gather(window, rel, 8, shape)
        w1 = _chunk_gather(window, rel + 1, 8, shape)
        sh = off & 31
        bits = _srl(w0, sh) | jnp.where(sh == 0, 0, _sll(w1, (32 - sh) & 31))
        bits = bits & (_sll(1, nb) - 1)

        new_state = _srl(e, 16) + bits
        state = jnp.where(last_mask, state, new_state)
        cursor = jnp.where(last_mask, cursor, cursor - total)
        return sym, state, cursor

    def body(t4, carry):
        state, cursor = carry
        last = t4 == t4_count - 1
        sym0, state, cursor = step(state, cursor, False)
        sym1, state, cursor = step(state, cursor, False)
        sym2, state, cursor = step(state, cursor, False)
        sym3, state, cursor = step(state, cursor, last)
        tile = sym0 | _sll(sym1, 8) | _sll(sym2, 16) | _sll(sym3, 24)
        out_ref[pl.ds(t4 * 8, 8), :] = tile
        return state, cursor

    state0 = init_ref[0] & (TSIZE - 1)
    _, cursor = jax.lax.fori_loop(0, t4_count, body, (state0, cursor0))
    # trailer row: cursor residue broadcast (0 on a well-formed stream)
    out_ref[pl.ds(t4_count * 8, 8), :] = jnp.full((8, 128), cursor, jnp.int32)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def turbo_fse_decode(csize_bits, tables, init_states, streams,
                     t4_count: int, wrows: int, interpret: bool = False):
    """Batched turbo decode.

    csize_bits[G] i32; tables[G,16,128] i32 packed (base<<16 | nb<<8 | sym);
    init_states[G,8,128] i32; streams[G,wrows,128] i32 payload words.
    Returns (out[G, t4_count*8, 128] i32 = decoded bytes, err[G,1,1] i32
    cursor residue, 0 = ok).
    """
    G = tables.shape[0]
    rows = t4_count * 8 + 8  # +8 trailer rows carrying the cursor residue
    kern = functools.partial(_decode_kernel, t4_count=t4_count, wrows=wrows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wrows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * rows, 128), jnp.int32),
        interpret=interpret,
    )(csize_bits, tables, init_states, streams.reshape(G * wrows, 128))
    out = out.reshape(G, rows, 128)
    return out[:, : t4_count * 8, :], out[:, t4_count * 8 :, :1].max(axis=(1, 2))


# ---------------------------------------------------------------------------
# Host-side packing helpers (group arrays <-> kernel inputs)
# ---------------------------------------------------------------------------


def wrows_for(n_payload_words: int) -> int:
    """Stream rows (128 words each) for a payload; multiple of 8 with slack."""
    rows = (n_payload_words + 127) // 128 + 16
    return (rows + 7) // 8 * 8


def pack_dtable(norm, max_sv: int, table_log: int) -> np.ndarray:
    """Reference DTable -> packed [16,128] i32 (base<<16 | nb<<8 | sym)."""
    from ..refimpl.tables import build_dtable

    dt = build_dtable(norm, max_sv, table_log)
    packed = (
        (dt.new_state.astype(np.int64) << 16)
        | (dt.nb_bits.astype(np.int64) << 8)
        | dt.symbol.astype(np.int64)
    ).astype(np.int32)
    out = np.zeros(TSIZE, np.int32)
    out[: packed.shape[0]] = packed
    return out.reshape(TCHUNKS, 128)
