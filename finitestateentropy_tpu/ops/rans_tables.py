"""On-device batched TurboRANS table construction.

Device twins of the host packers in turbo/rans_kernels.py
(pack_rans_ctables / pack_rans_dtable), vectorized over a batch of groups
so the fused resident pipeline (hist -> normalize -> tables -> encode)
never pulls counts to the host.  The layouts are the kernels' wire-table
contracts:

* encode: fc = (cumul << 12) | freq, magic = floor(2^32 / freq) as u32
  bits (the mulhi magic-divide reciprocal; rans_kernels._rans_encode2_kernel);
* decode: slot entry (cumul << 20) | (freq << 8) | sym (turbo/rans.py
  rans_decode_table).

Unused-entry semantics differ harmlessly from the host packers (absent
symbols get cumul = tableSize here vs 0 on host); those entries are never
touched by a well-formed stream, and the differential tests compare wire
bytes, not table buffers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left


def rans_freqs_batch(norm):
    """norm [G,256] i32 (reference normalized counts, -1 = low prob,
    0 = absent) -> (freq [G,256] with absent symbols at 0, exclusive
    cumul [G,256])."""
    freq = jnp.where(norm < 0, 1, norm)
    cumul = jnp.cumsum(freq, axis=1) - freq
    return freq, cumul


def _magic_u32(f):
    """floor(2^32 / f) as u32 bit patterns in int32, for 1 <= f <= 4096.

    Base-2^16 long division of 0x1_0000_0000 (digits [1, 0, 0]); f == 1
    clamps to 0xFFFFFFFF exactly like the host packer."""
    q1 = 65536 // f
    r1 = 65536 - q1 * f
    q0 = (r1 * 65536) // f
    q = _sll(q1, 16) | q0
    return jnp.where(f == 1, jnp.int32(-1), q)


def pack_rans_ctables_batch(norm):
    """norm [G,256] -> (fc [G,2,128], magic [G,2,128]) i32 encode tables
    (byte alphabet, 12-bit freq/cumul fields; tableLog <= 12)."""
    freq, cumul = rans_freqs_batch(norm)
    f = jnp.maximum(freq, 1)
    fc = (_sll(cumul, 12) | f).astype(jnp.int32)
    G = norm.shape[0]
    return (fc.reshape(G, 2, 128), _magic_u32(f).reshape(G, 2, 128))


@functools.partial(jax.jit, static_argnums=(1,))
def pack_rans_dtable_batch(norm, table_log: int):
    """norm [G,256] -> [G, tch, 128] i32 decode tables,
    tch = max(2^tableLog / 128, 1)."""
    freq, cumul = rans_freqs_batch(norm)
    m = 1 << table_log
    slots = jnp.arange(m, dtype=jnp.int32)
    # last index with cumul <= slot; absent symbols (freq 0) duplicate the
    # next real symbol's cumul so side='right' skips them (see host
    # rans_decode_table, turbo/rans.py:69-77)
    sym = jax.vmap(
        lambda c: jnp.searchsorted(c, slots, side="right"))(cumul) - 1
    sym = sym.astype(jnp.int32)
    cs = jnp.take_along_axis(cumul, sym, axis=1)
    fs = jnp.take_along_axis(freq, sym, axis=1)
    e = (_sll(cs, 20) | _sll(fs, 8) | sym).astype(jnp.int32)
    G = norm.shape[0]
    return e.reshape(G, max(m // 128, 1), 128)
