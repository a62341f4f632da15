"""On-device normalization (ops/norm.py) is bit-identical to the host twin
refimpl/norm.py (itself byte-exact vs the reference) — including the
normalizeM2 fallback, which real corpora take (Proba02 at tableLog 10)."""
import numpy as np
import pytest

from finitestateentropy_tpu.errors import FSEError
from finitestateentropy_tpu.refimpl.hist import hist_count
from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
from finitestateentropy_tpu.utils import generate_proba


def _oracle(count, total, tlog):
    """(norm[256], flag) via refimpl semantics."""
    nz = np.nonzero(count)[0]
    max_sv = int(nz.max()) if len(nz) else 0
    if count.max() == total:
        return None, 1
    try:
        # max_table_log=13 mirrors the u16 callers; the byte path caps at 12
        norm, _ = fse_normalize_count(tlog, count[: max_sv + 1], total, max_sv,
                                      max_table_log=13)
    except FSEError as e:
        if "too small for distribution" in str(e):
            return None, 3
        return None, 2
    out = np.zeros(256, np.int64)
    out[: max_sv + 1] = norm
    return out, 0


def _run_batch(counts, totals, tlog):
    import jax.numpy as jnp

    from finitestateentropy_tpu.ops.norm import fse_normalize_batch

    norm, flags = fse_normalize_batch(jnp.asarray(counts, jnp.int32),
                                      jnp.asarray(totals, jnp.int32), tlog)
    return np.asarray(norm), np.asarray(flags)


def _check(counts, totals, tlog):
    norm, flags = _run_batch(counts, totals, tlog)
    for g in range(len(totals)):
        want, fwant = _oracle(counts[g].astype(np.int64), int(totals[g]), tlog)
        assert flags[g] == fwant, (g, tlog, flags[g], fwant, totals[g])
        if fwant == 0:
            assert np.array_equal(norm[g], want), (
                g, tlog, np.nonzero(norm[g] != want)[0][:8])


def _counts_of(chunks, max_len=None):
    counts = np.zeros((len(chunks), 256), np.int64)
    totals = np.zeros(len(chunks), np.int64)
    for i, ch in enumerate(chunks):
        c, _, _ = hist_count(np.frombuffer(ch, np.uint8), 255)
        counts[i, : len(c)] = c
        totals[i] = len(ch)
    return counts, totals


@pytest.mark.parametrize("tlog", [10, 11, 12])
def test_norm_device_matches_twin_on_corpora(tlog):
    chunks = []
    for p in (80, 14, 2):
        d = generate_proba(p)
        chunks += [d[i : i + 65536] for i in range(0, 524288, 65536)]
    rng = np.random.default_rng(3)
    noise = bytes(rng.integers(0, 256, 1 << 18, dtype=np.uint8))
    chunks += [noise[i : i + 65536] for i in range(0, len(noise), 65536)]
    counts, totals = _counts_of(chunks)
    _check(counts, totals, tlog)


@pytest.mark.parametrize("tlog", [9, 10, 11, 12, 13])
def test_norm_device_fuzz_random_distributions(tlog):
    """Randomized distributions spanning skews, sparse alphabets, low
    counts, power-law tails — the classifier edges (lowThreshold, lowOne,
    rtb rounding, M2 special cases) all get hit."""
    rng = np.random.default_rng(42 + tlog)
    rows = []
    totals = []
    for it in range(300):
        nsym = int(rng.integers(2, 257))
        kind = it % 5
        if kind == 0:      # geometric skew
            p = rng.uniform(0.3, 0.95)
            w = p ** np.arange(nsym)
        elif kind == 1:    # near-flat
            w = 1.0 + rng.uniform(0, 0.1, nsym)
        elif kind == 2:    # power law
            w = 1.0 / (1 + np.arange(nsym)) ** rng.uniform(0.5, 2.5)
        elif kind == 3:    # one dominant + tail
            w = np.full(nsym, 1.0)
            w[0] = nsym * rng.uniform(1, 50)
        else:              # random sparse
            w = rng.uniform(0, 1, nsym) * (rng.uniform(0, 1, nsym) > 0.5)
            w[0] = max(w[0], 0.1)
        total = int(rng.integers(max(300, 1 << (tlog - 1)), 1 << 20))
        cnt = np.floor(w / w.sum() * total).astype(np.int64)
        cnt[0] += total - cnt.sum()
        if cnt.max() == total:
            cnt[0] -= 1
            cnt[min(1, nsym - 1)] += 1
        row = np.zeros(256, np.int64)
        # scatter to random symbol positions (maxSV varies)
        pos = np.sort(rng.choice(256, nsym, replace=False))
        row[pos] = cnt
        rows.append(row)
        totals.append(total)
    _check(np.array(rows), np.array(totals), tlog)


def test_norm_device_rle_and_too_small_flags():
    counts = np.zeros((3, 256), np.int64)
    counts[0, 7] = 5000                      # RLE
    counts[1, :2] = [700, 324]               # fine at tlog 10
    counts[2, 128:192] = 16                  # 64 symbols x 16 = 1024 total
    totals = np.array([5000, 1024, 1024])
    norm, flags = _run_batch(counts, totals, 10)
    assert flags[0] == 1
    assert flags[1] == 0
    w, f = _oracle(counts[2], 1024, 10)
    assert flags[2] == f
    # tableLog smaller than the distribution needs -> flag 3
    counts2 = np.zeros((1, 256), np.int64)
    counts2[0, 200] = 3000
    counts2[0, 201] = 3000                   # maxSV 201 needs tlog >= 9
    norm, flags = _run_batch(counts2, np.array([6000]), 5)
    assert flags[0] == 3


def test_norm_device_reference_fuzzer_corners():
    """The reference fuzzer's crafted normalizeCount corner distributions
    (fuzzer.c:333-363): historical rank overflows and an M2 divide-by-0
    trigger shape."""
    rows, totals = [], []
    # fuzzer.c:333-341 shape: one huge symbol + many tiny ones
    r = np.zeros(256, np.int64)
    r[0] = 1 << 19
    r[1:129] = 1
    rows.append(r.copy())
    totals.append(int(r.sum()))
    # two dominant symbols
    r = np.zeros(256, np.int64)
    r[0] = r[1] = 1 << 18
    r[2:10] = 3
    rows.append(r.copy())
    totals.append(int(r.sum()))
    # all-low-but-one (normalizeM2 all-low path)
    r = np.zeros(256, np.int64)
    r[:256] = 2
    r[17] = 100000
    rows.append(r.copy())
    totals.append(int(r.sum()))
    for tlog in (9, 10, 11, 12):
        _check(np.array(rows), np.array(totals), tlog)
