"""On-device FSE count normalization (reference fse_compress.c:316-494).

Bit-identical to the host twin `refimpl/norm.py` (itself bit-identical to
the reference), vectorized over a batch of groups as pure XLA integer ops
so the device-resident compress pipeline never pulls counts to the host.

TPU has no 64-bit integers, so the reference's U64 arithmetic
(`step = 2^62/total`, `proba = (c*step) >> scale`, normalizeM2's
`rStep`/`tmpTotal` chain) is emulated exactly:

* 64/22-bit division: schoolbook long division in base 256 (the remainder
  stays < 2^22, so `rem*256 + digit` fits int32);
* 22x62-bit products: 16-bit limb multiplication with int32 accumulators
  (c = c1*2^16 + c0 with c1 < 2^6, so every partial product is exact);
* normalizeM2's 64-bit running total: per-symbol products decomposed into
  three 21-bit limbs and cumsum'd per limb (256 * 2^21 < 2^31, carry-free),
  then carry-normalized once.

The M2 fallback runs on-device too — it is NOT rare (e.g. Proba02 at the
speed-mode tableLog 10 takes it for every group), so a host fallback would
put whole corpus classes back on the host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..refimpl.norm import _RTB_TABLE

_srl = jax.lax.shift_right_logical
_sll = jax.lax.shift_left
_SIGN = np.int32(np.uint32(0x80000000))


def _u32_gt(a, b):
    """Unsigned a > b on int32 bit patterns."""
    return (a ^ _SIGN) > (b ^ _SIGN)


def _udiv64_by_u22(digits, total):
    """floor(D / total) for D given as 8 base-256 digits (MSB first, each
    an int32 array < 256) and 0 < total < 2^22.  Returns 4 16-bit limbs
    (LSB first).  rem < total < 2^22 so rem*256 + digit < 2^30."""
    rem = jnp.zeros_like(total)
    q = []
    for d in digits:
        acc = rem * 256 + d
        qd = acc // total
        rem = acc - qd * total
        q.append(qd)
    # q is 8 byte-digits MSB first -> 16-bit limbs LSB first
    s0 = q[7] | _sll(q[6], 8)
    s1 = q[5] | _sll(q[4], 8)
    s2 = q[3] | _sll(q[2], 8)
    s3 = q[1] | _sll(q[0], 8)
    return s0, s1, s2, s3


def _mul_c_by_64(c, limbs):
    """Exact c * S for c < 2^22 and S < 2^63 in 16-bit limbs (LSB first).
    Returns 16-bit digits d0..d3 of the low 64 bits (product < 2^64
    guaranteed by callers: c <= total and S <= 2^62/total)."""
    s0, s1, s2, s3 = limbs
    c0 = c & 0xFFFF
    c1 = _srl(c, 16)          # < 2^6
    a = [jnp.zeros_like(c) for _ in range(5)]
    for j, s in enumerate((s0, s1, s2, s3)):
        t = c0 * s            # true product < 2^32; int32 wraps, bits exact
        a[j] = a[j] + (t & 0xFFFF)
        a[j + 1] = a[j + 1] + _srl(t, 16)
        a[j + 1] = a[j + 1] + c1 * s   # < 2^22, headroom is ample
    d = []
    carry = jnp.zeros_like(c)
    for j in range(4):
        v = a[j] + carry
        d.append(v & 0xFFFF)
        carry = _srl(v, 16)
    return d  # d0..d3, 16 bits each (bits 0..63)


def _rtb_lookup(proba):
    """rtbTable[proba] for proba in [0,8) (fse_compress.c:445)."""
    out = jnp.zeros_like(proba)
    for k, v in enumerate(_RTB_TABLE):
        out = jnp.where(proba == k, v, out)
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def fse_normalize_batch(counts, totals, table_log: int):
    """Batched FSE_normalizeCount: counts [G,S] i32 (zero past maxSV),
    totals [G] i32 -> (norm [G,S] i32, flags [G] i32).

    flags: 0 = ok, 1 = RLE (some count == total; norm row is meaningless),
    2 = normalizeM2 underflow (host must raise, refimpl parity),
    3 = tableLog too small for the distribution (host must raise).
    Caller guarantees 5 <= table_log <= 13 and 2 <= total < 2^22."""
    tlog = table_log
    scale = 62 - tlog
    G, S = counts.shape
    c = counts.astype(jnp.int32)
    total = totals.astype(jnp.int32)[:, None]            # [G,1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)

    max_sv = jnp.max(jnp.where(c > 0, idx, -1), axis=1, keepdims=True)
    rle = jnp.any(c == total, axis=1)

    # legality (fse_min_table_log): min(highbit(total)+1, highbit(maxSV)+2)
    def _highbit(x):
        return 31 - jax.lax.clz(jnp.maximum(x, 1))

    min_bits = jnp.minimum(_highbit(total[:, 0]) + 1,
                           _highbit(max_sv[:, 0]) + 2)
    too_small = tlog < min_bits

    # ---- main path (fse_compress.c:435-494) ----
    step = _udiv64_by_u22([jnp.full((G,), 0x40, jnp.int32)]
                          + [jnp.zeros((G,), jnp.int32)] * 7,
                          total[:, 0])                    # 2^62 // total
    step_b = tuple(s[:, None] for s in step)              # [G,1] limbs
    low_threshold = total >> tlog

    d = _mul_c_by_64(c, step_b)                           # c*step digits
    proba = _srl(d[3], scale - 48)
    # rounding: (c*step) - (proba<<scale) > vStep * rtbTable[proba]
    mask3 = (1 << (scale - 48)) - 1
    r_hi = _sll(d[3] & mask3, 16) | d[2]                  # bits 32..scale-1
    r_lo = _sll(d[1], 16) | d[0]                          # bits 0..31 (u32)
    rtb = _rtb_lookup(jnp.minimum(proba, 7))
    sh = scale - 20
    if sh >= 32:
        rest_hi = _sll(rtb, sh - 32)
        rest_lo = jnp.zeros_like(rtb)
    else:
        rest_hi = _srl(rtb, 32 - sh)
        rest_lo = _sll(rtb, sh)
    beat = (r_hi > rest_hi) | ((r_hi == rest_hi) & _u32_gt(r_lo, rest_lo))
    proba = jnp.where((proba < 8) & beat, proba + 1, proba)

    low = (c > 0) & (c <= low_threshold)
    part = c > low_threshold                              # participants
    norm_main = jnp.where(low, -1, jnp.where(part, proba, 0))
    still = ((1 << tlog)
             - jnp.sum(low.astype(jnp.int32), axis=1)
             - jnp.sum(jnp.where(part, proba, 0), axis=1))  # [G]

    vals = jnp.where(part & (proba > 0), proba, -1)
    largest = jnp.argmax(vals, axis=1).astype(jnp.int32)
    largest = jnp.where(jnp.max(vals, axis=1) <= 0, 0, largest)  # [G]
    n_larg = jnp.take_along_axis(norm_main, largest[:, None], axis=1)[:, 0]
    use_m2 = (-still) >= (n_larg >> 1)
    norm_main = norm_main + jnp.where(
        idx == largest[:, None], still[:, None], 0)

    # ---- normalizeM2 fallback (fse_compress.c:348-432) ----
    NOT_YET = -2
    low_one = (total * 3) >> (tlog + 1)
    cat = jnp.where(c == 0, 0,
                    jnp.where(c <= low_threshold, -1,
                              jnp.where(c <= low_one, 1, NOT_YET)))
    consumed = jnp.where((cat == -1) | (cat == 1), c, 0)
    distributed = jnp.sum(((cat == -1) | (cat == 1)).astype(jnp.int32), axis=1)
    tot1 = total[:, 0] - jnp.sum(consumed, axis=1)
    to_dist = (1 << tlog) - distributed                   # [G]
    done0 = to_dist == 0

    widen = (to_dist > 0) & (tot1 // jnp.maximum(to_dist, 1) > low_one[:, 0])
    low_one2 = (tot1 * 3) // jnp.maximum(2 * to_dist, 1)  # [G]
    upg = (cat == NOT_YET) & (c <= low_one2[:, None]) & widen[:, None]
    cat = jnp.where(upg, 1, cat)
    distributed = distributed + jnp.sum(upg.astype(jnp.int32), axis=1)
    tot2 = tot1 - jnp.sum(jnp.where(upg, c, 0), axis=1)
    to_dist = (1 << tlog) - distributed

    all_low = distributed == (max_sv[:, 0] + 1)
    mfs = jnp.argmax(c, axis=1).astype(jnp.int32)         # first max wins
    zero_total = (~all_low) & (tot2 == 0)

    # round-robin +1 over cat==1 symbols (refimpl norm.py:99-107)
    pos1 = cat == 1
    npos = jnp.sum(pos1.astype(jnp.int32), axis=1)        # [G]
    rr_rank = jnp.cumsum(pos1.astype(jnp.int32), axis=1) - 1  # rank among 1s
    base = to_dist // jnp.maximum(npos, 1)
    rem = to_dist - base * jnp.maximum(npos, 1)
    rr_add = jnp.where(pos1, base[:, None]
                       + (rr_rank < rem[:, None]).astype(jnp.int32), 0)

    # fractional distribution: rStep = ((2^vsl * toDist) + mid) // total
    vsl = scale  # v_step_log = 62 - tableLog
    mid_c = (1 << (vsl - 1)) - 1
    # dividend D = (to_dist << vsl) + mid as 8 base-256 digits, MSB first;
    # mid's bits (< vsl-1) and to_dist's (>= vsl) never overlap in a byte
    digs = []
    for k in range(7, -1, -1):  # MSB first: byte k*8..k*8+7
        b = 8 * k
        if b >= vsl:
            td_part = _srl(to_dist, b - vsl) & 255
        elif b > vsl - 8:
            td_part = _sll(to_dist, vsl - b) & 255
        else:
            td_part = jnp.zeros_like(to_dist)
        digs.append(td_part | ((mid_c >> b) & 255))
    safe_tot2 = jnp.maximum(tot2, 1)
    r_step = _udiv64_by_u22(digs, safe_tot2)              # [G] limbs x4
    r_step_b = tuple(s[:, None] for s in r_step)
    ny = cat == NOT_YET
    vd = _mul_c_by_64(jnp.where(ny, c, 0), r_step_b)      # c*rStep digits
    # 16-bit digits -> three 21-bit limbs (bits 0..20 / 21..41 / 42..62)
    l0 = vd[0] | _sll(vd[1] & 0x1F, 16)
    l1 = _srl(vd[1], 5) | _sll(vd[2] & 0x3FF, 11)
    l2 = _srl(vd[2], 10) | _sll(vd[3] & 0x7FFF, 6)
    # inclusive cumsum per limb (max 256 * 2^21 < 2^31), plus mid, then
    # carry-normalize; take floor(T >> vsl) = l2' >> (vsl - 42)
    m_l0 = mid_c & 0x1FFFFF
    m_l1 = (mid_c >> 21) & 0x1FFFFF
    m_l2 = (mid_c >> 42) & 0x1FFFFF

    def shifted(cl0, cl1, cl2):
        t0 = cl0 + m_l0
        t1 = cl1 + m_l1 + _srl(t0, 21)
        t2 = cl2 + m_l2 + _srl(t1, 21)
        return _srl(t2, vsl - 42)

    cum0 = jnp.cumsum(l0, axis=1)
    cum1 = jnp.cumsum(l1, axis=1)
    cum2 = jnp.cumsum(l2, axis=1)
    s_end = shifted(cum0, cum1, cum2)
    s_start = shifted(cum0 - l0, cum1 - l1, cum2 - l2)
    weight = s_end - s_start
    m2_err = jnp.any(ny & (weight < 1), axis=1) & (~done0) & (~all_low) \
        & (~zero_total)
    # C would loop forever round-robining over zero positive symbols;
    # surface it as an error instead (unreachable for tableLog >= 9)
    m2_err = m2_err | (zero_total & (npos == 0) & (to_dist > 0) & (~done0)
                       & (~all_low))

    norm_m2 = jnp.where(cat == NOT_YET, weight, cat)      # fractional default
    norm_m2 = jnp.where(zero_total[:, None], cat + rr_add, norm_m2)
    norm_m2 = jnp.where(all_low[:, None],
                        cat + jnp.where(idx == mfs[:, None],
                                        to_dist[:, None], 0),
                        norm_m2)
    norm_m2 = jnp.where(done0[:, None], cat, norm_m2)     # refimpl early out

    norm = jnp.where(use_m2[:, None], norm_m2, norm_main)
    flags = jnp.where(rle, 1,
                      jnp.where(too_small, 3,
                                jnp.where(use_m2 & m2_err, 2, 0)))
    return norm, flags.astype(jnp.int32)
