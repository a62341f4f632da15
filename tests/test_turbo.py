"""TurboFSE format: host twin round-trips + Pallas kernel vs twin (interpret)."""
import numpy as np
import pytest

from finitestateentropy_tpu.turbo.format import (
    TURBO_LANES,
    _pad_n,
    parse_group,
    turbo_fse_compress,
    turbo_fse_decompress,
)
from finitestateentropy_tpu.utils import generate_proba


def _corpora():
    rng = np.random.default_rng(7)
    return {
        "p80": generate_proba(80)[:65536],
        "p14": generate_proba(14)[:20000],
        "noise": bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),
        "skew": bytes(rng.choice(8, 30000, p=[0.8, 0.1, 0.04, 0.02, 0.02, 0.01, 0.005, 0.005]).astype(np.uint8)),
        "tiny": b"abracadabra" * 10,
        "one": b"Z",
        "rle": b"Q" * 12345,
        "empty": b"",
    }


@pytest.mark.parametrize("name", list(_corpora()))
def test_twin_roundtrip(name):
    data = _corpora()[name]
    blob = turbo_fse_compress(data)
    assert turbo_fse_decompress(blob) == data


def test_ratio_close_to_reference():
    from finitestateentropy_tpu.refimpl.fse import fse_compress

    data = generate_proba(80)  # full 1MB corpus = one realistic group
    blob = turbo_fse_compress(data)
    ref = sum(
        len(fse_compress(data[i : i + 32768]).data)
        for i in range(0, len(data), 32768)
    )
    # interleave tax: 1024 final states (2KB/group, amortized over MB-scale
    # groups) + shared table; stays within 2% at the design group size
    assert len(blob) <= ref * 1.02


def _group_to_arrays(blob):
    g, _ = parse_group(blob)
    assert g.flags == 0
    from finitestateentropy_tpu.turbo.kernels import pack_dtable

    n_pad = _pad_n(g.n_sym)
    t4 = n_pad // TURBO_LANES // 4
    words = np.frombuffer(g.payload, "<u4").astype(np.int32)
    from finitestateentropy_tpu.turbo.kernels import wrows_for
    wrows = wrows_for(len(words))
    stream = np.zeros((1, wrows, 128), np.int32)
    stream.reshape(1, -1)[0, : len(words)] = words
    tbl = pack_dtable(g.norm, g.max_symbol_value, g.table_log)[None]
    init = g.init_states.astype(np.int32).reshape(1, 8, 128)
    cs = np.array([g.csize_bits], np.int32)
    return g, cs, tbl, init, stream, t4, wrows


def test_decode_kernel_interpret_matches_twin():
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.kernels import turbo_fse_decode

    data = generate_proba(80)[:8192]
    blob = turbo_fse_compress(data)
    g, cs, tbl, init, stream, t4, wrows = _group_to_arrays(blob)

    out, err = turbo_fse_decode(
        jnp.asarray(cs), jnp.asarray(tbl), jnp.asarray(init),
        jnp.asarray(stream), t4, wrows, True,
    )
    assert int(np.asarray(err)[0]) == 0
    out_bytes = np.asarray(out)[0].astype("<i4").tobytes()[: g.n_sym]
    assert out_bytes == data


def test_encode_kernel_interpret_matches_twin():
    import jax.numpy as jnp

    from finitestateentropy_tpu.turbo.kernels import turbo_fse_encode_arrays

    data = generate_proba(80)[:8192]
    blob = turbo_fse_compress(data)          # twin output = oracle bytes
    g, cs, tbl, init, stream, t4, wrows = _group_to_arrays(blob)

    from finitestateentropy_tpu.refimpl.tables import build_ctable
    from finitestateentropy_tpu.turbo.kernels import pack_ctable

    ct_state, ct_sym = pack_ctable(build_ctable(g.norm, g.max_symbol_value, g.table_log))
    n_pad = _pad_n(g.n_sym)
    src_pad = np.frombuffer(data, np.uint8)
    mfs = int(np.bincount(src_pad, minlength=256).argmax())
    pad = np.full(n_pad, mfs, np.uint8)
    pad[: g.n_sym] = src_pad
    src_words = pad.view("<u4").astype(np.int32).reshape(1, -1, 128)

    words, csize_bits, fin = turbo_fse_encode_arrays(
        jnp.asarray(ct_state[None]), jnp.asarray(ct_sym[None]),
        jnp.asarray(src_words), t4, wrows, True,
    )
    assert int(np.asarray(csize_bits)[0]) == g.csize_bits
    want = np.zeros(wrows * 128, np.int32)
    pw = np.frombuffer(g.payload, "<u4").astype(np.int32)
    want[: len(pw)] = pw
    got = np.asarray(words)[0].reshape(-1)
    assert np.array_equal(got, want)
    assert np.array_equal(
        np.asarray(fin)[0].reshape(-1) & 2047, g.init_states.astype(np.int32)
    )
