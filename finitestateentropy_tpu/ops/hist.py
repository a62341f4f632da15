"""On-device byte histogram (reference lib/hist.c:58-133).

The reference's 4-interleaved-table CPU trick becomes an MXU counting
problem via NIBBLE DECOMPOSITION (r4): counts[16h+l] = sum_n
onehot(hi_n)[h] * onehot(lo_n)[l], i.e. a [16]x[16] outer-product
contraction over the data — two 16-wide one-hot builds (32 VPU compares
per 1024 bytes) feeding one bf16 einsum with f32 accumulation.  This
replaced the r2 direct 256-wide one-hot reduce (256 compares/byte on the
VPU): measured 16.7 GB/s vs 1.5 GB/s at 56 x 1 MiB on the v5e
(tools note: one-hot values are exactly 0/1 in bf16, products are exact,
and f32 accumulation is exact for counts < 2^24 — same bound as before).

Group prep on multi-core hosts still uses the threaded native C histogram
(native/turbofse.cc); this op is the fully-on-device pipeline's counter
(device_api fused compress), where it now composes with the 1.76 GB/s
encode instead of dominating it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _hist_nibble(data_u8, valid_bf16=None):
    hi = (data_u8 >> 4).astype(jnp.int32)
    lo = (data_u8 & 15).astype(jnp.int32)
    nib = jnp.arange(16, dtype=jnp.int32)[None, None, :]
    A = (hi[:, :, None] == nib).astype(jnp.bfloat16)
    if valid_bf16 is not None:
        A = A * valid_bf16[:, :, None]
    B = (lo[:, :, None] == nib).astype(jnp.bfloat16)
    C = jnp.einsum("gnh,gnl->ghl", A, B,
                   preferred_element_type=jnp.float32)
    return C.reshape(data_u8.shape[0], 256).astype(jnp.int32)


@jax.jit
def hist_count_batch(data_u8):
    """[G, N] uint8 -> [G, 256] int32 exact counts (N < 2^24)."""
    return _hist_nibble(data_u8)


@functools.partial(jax.jit, static_argnums=(1,))
def hist_count_masked(data_u8, max_len: int, lengths=None):
    """[G, max_len] uint8 with per-group valid lengths -> [G, 256] counts.

    Padding bytes beyond lengths[g] are excluded (the ragged-block case)."""
    if lengths is None:
        return _hist_nibble(data_u8)
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    valid = (pos < lengths[:, None]).astype(jnp.bfloat16)
    return _hist_nibble(data_u8, valid)
