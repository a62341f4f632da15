"""Batched, fully-vectorized FSE table construction.

The reference builds tables with a serial pointer walk
(fse_compress.c:108-128, fse_decompress.c:102-123).  TPU-native recast:
``(i*step) & mask`` for i = 0..tableSize-1 is a fixed permutation (step is
odd), and the reference's "skip cells above highThreshold" rule is exactly
"drop the positions that land in the low-probability region, keeping order".
So the spread becomes: generate the permutation, mask, rank by prefix-sum,
and scatter — no loop-carried state, O(tableSize) vector ops per block,
batched over B blocks with vmap.

All functions take *padded* per-block inputs: norm[B, maxSV+1] (int32,
-1 = low-prob), table_log[B], and produce tables padded to the max table size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import FSE_MAX_SYMBOL_VALUE, fse_tablestep


def _spread_cells(norm, table_log, max_table_log, num_symbols):
    """Per block: which symbol occupies each state cell (padded table).

    Returns symbol_of_cell[int32, 2^max_table_log]; cells beyond the live
    table hold 0.
    """
    max_size = 1 << max_table_log
    table_size = 1 << table_log
    mask = table_size - 1
    step = (table_size >> 1) + (table_size >> 3) + 3

    cell = jnp.arange(max_size, dtype=jnp.int32)
    live = cell < table_size

    n_low = jnp.sum((norm == -1).astype(jnp.int32))
    high_threshold = table_size - 1 - n_low

    # positive-count symbols, assigned to the filtered spread sequence
    pos_counts = jnp.maximum(norm, 0).astype(jnp.int32)
    cum = jnp.cumsum(pos_counts)  # cum[s] = total of symbols <= s
    seq = (cell * step) & mask                       # visit order
    valid = live & (seq <= high_threshold)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1   # occurrence index
    # symbol owning occurrence r: first s with cum[s] > r
    sym_of_rank = jnp.searchsorted(cum, rank, side="right").astype(jnp.int32)
    symbol_of_cell = jnp.zeros(max_size, dtype=jnp.int32)
    scatter_pos = jnp.where(valid, seq, max_size)    # drop invalid off the end
    symbol_of_cell = symbol_of_cell.at[scatter_pos].set(sym_of_rank, mode="drop")

    # low-probability symbols occupy the top cells in increasing-symbol,
    # decreasing-cell order
    is_low = norm == -1
    low_rank = jnp.cumsum(is_low.astype(jnp.int32)) - 1  # 0-based among lows
    low_cell = jnp.where(is_low, table_size - 1 - low_rank, max_size)
    syms = jnp.arange(norm.shape[0], dtype=jnp.int32)
    symbol_of_cell = symbol_of_cell.at[low_cell].set(syms, mode="drop")
    return symbol_of_cell


def _occurrence_rank(symbol_of_cell, max_size):
    """occurrence index of each cell within its symbol group, by cell order.

    Vectorized rank-within-group: stable argsort by symbol groups cells in
    (symbol, cell) order; position minus group start = rank.
    """
    order = jnp.argsort(symbol_of_cell, stable=True)          # cells sorted by symbol
    sym_sorted = symbol_of_cell[order]
    idx = jnp.arange(max_size, dtype=jnp.int32)
    # group start = first index where this symbol appears
    first_of_sym = jnp.searchsorted(sym_sorted, sym_sorted, side="left").astype(jnp.int32)
    rank_sorted = idx - first_of_sym
    rank = jnp.zeros(max_size, dtype=jnp.int32).at[order].set(rank_sorted)
    return rank


def _build_dtable_one(norm, table_log, max_table_log, num_symbols):
    """Per block: decode table {new_state, symbol, nb_bits} + fast_mode."""
    max_size = 1 << max_table_log
    table_size = 1 << table_log
    symbol_of_cell = _spread_cells(norm, table_log, max_table_log, num_symbols)
    occ = _occurrence_rank(symbol_of_cell, max_size)

    # base next-state per symbol: 1 for low-prob, else norm
    base = jnp.where(norm == -1, 1, norm).astype(jnp.int32)
    # low-prob cells sit at the table top; their occurrence among the symbol's
    # cells is 0 (single cell), so nextState = base + occ works for both,
    # EXCEPT the reference assigns low-prob nextState=1 then spreads positives
    # starting at their norm value. Low-prob symbols never also have positive
    # cells, so: nextState = (norm==-1 ? 1 : norm + occ_adjust)? No — the
    # reference's symbolNext starts at norm[s] (or 1) and increments per cell
    # in cell order; first occurrence gets norm[s], second norm[s]+1, ...
    next_state = base[symbol_of_cell] + occ

    nb_bits = (table_log - (31 - jax.lax.clz(next_state.astype(jnp.uint32)).astype(jnp.int32))).astype(jnp.int32)
    new_state = ((next_state << nb_bits) - table_size).astype(jnp.int32)

    live = jnp.arange(max_size, dtype=jnp.int32) < table_size
    nb_bits = jnp.where(live, nb_bits, 0)
    new_state = jnp.where(live, new_state, 0)
    symbol = jnp.where(live, symbol_of_cell, 0)

    large_limit = 1 << (table_log - 1)
    fast_mode = ~jnp.any((norm >= large_limit) & (norm != -1))
    return new_state, symbol, nb_bits, fast_mode


def _build_ctable_one(norm, table_log, max_table_log, num_symbols):
    """Per block: encode tables.

    state_table[max_size]: next-state value per (symbol, occurrence) slot in
    symbol-major order (the reference's tableU16);
    delta_find_state[nsym], delta_nb_bits[nsym]: per-symbol transform.
    """
    max_size = 1 << max_table_log
    table_size = 1 << table_log
    symbol_of_cell = _spread_cells(norm, table_log, max_table_log, num_symbols)
    occ = _occurrence_rank(symbol_of_cell, max_size)

    # slots per symbol (1 for low-prob), cumulative start offsets
    slots = jnp.where(norm == -1, 1, jnp.maximum(norm, 0)).astype(jnp.int32)
    cumul = jnp.cumsum(slots) - slots  # start offset per symbol

    cell = jnp.arange(max_size, dtype=jnp.int32)
    slot = cumul[symbol_of_cell] + occ
    live = cell < table_size
    state_table = (
        jnp.zeros(max_size, dtype=jnp.int32)
        .at[jnp.where(live, slot, max_size)]
        .set(jnp.where(live, table_size + cell, 0), mode="drop")
    )

    n = jnp.maximum(norm, 0)
    total = cumul  # == running "total" in the reference build
    # deltaNbBits / deltaFindState per symbol (fse_compress.c:130-154)
    hb = jnp.where(n > 1, 31 - jax.lax.clz(jnp.maximum(n - 1, 1).astype(jnp.uint32)).astype(jnp.int32), 0)
    max_bits_out = table_log - hb
    min_state_plus = n << max_bits_out
    dnb_default = (max_bits_out << 16) - min_state_plus
    dfs_default = total - n

    is_one = (norm == -1) | (norm == 1)
    dnb = jnp.where(norm == 0, ((table_log + 1) << 16) - table_size,
                    jnp.where(is_one, (table_log << 16) - table_size, dnb_default))
    dfs = jnp.where(norm == 0, 0, jnp.where(is_one, total - 1, dfs_default))
    return state_table, dfs.astype(jnp.int32), dnb.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def build_dtables(norm, table_log, max_table_log: int = 12,
                  num_symbols: int = FSE_MAX_SYMBOL_VALUE + 1):
    """norm[B, nsym] int32, table_log[B] int32 -> batched decode tables."""
    f = lambda n, t: _build_dtable_one(n, t, max_table_log, num_symbols)
    return jax.vmap(f)(norm, table_log)


@functools.partial(jax.jit, static_argnums=(2, 3))
def build_ctables(norm, table_log, max_table_log: int = 12,
                  num_symbols: int = FSE_MAX_SYMBOL_VALUE + 1):
    """norm[B, nsym] int32, table_log[B] int32 -> batched encode tables."""
    f = lambda n, t: _build_ctable_one(n, t, max_table_log, num_symbols)
    return jax.vmap(f)(norm, table_log)
