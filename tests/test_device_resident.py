"""Device-resident compress/decompress (turbo/device_api.py): the payload
never round-trips the host; wire bytes identical to the host-prep path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from finitestateentropy_tpu.turbo.api import turbo_compress_device
from finitestateentropy_tpu.turbo.device_api import (rans_compress_resident,
                                                     rans_decompress_resident)
from finitestateentropy_tpu.utils import generate_proba


def test_resident_matches_host_path_bytes():
    data = generate_proba(80)[: 3 * 65536 + 777]
    # NB: interpret-mode has no meaning here — on CPU the "device" arrays
    # are host arrays, but the code path (device hist, bitcast staging,
    # kernels) is identical to TPU
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    blob = rans_compress_resident(x, group_size=65536)
    # the resident pipeline is byte-wire by design: pin the host path to
    # the byte wire (the r5 auto dispatch picks pair/quad on p80)
    host_blob = turbo_compress_device(data, group_size=65536, interpret=True,
                                      pair=0, quad=0)
    assert blob == host_blob
    out = rans_decompress_resident(blob)
    assert bytes(np.asarray(out).tobytes()) == data


def test_resident_fallback_groups():
    rng = np.random.default_rng(9)
    data = (b"Z" * 9000                                        # RLE
            + bytes(rng.integers(0, 256, 12000, np.uint8))     # raw
            + generate_proba(14)[:5000])
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    blob = rans_compress_resident(x, group_size=9000)
    assert bytes(np.asarray(rans_decompress_resident(blob)).tobytes()) == data
    # interchange: the standard host-path decoder reads resident frames
    from finitestateentropy_tpu.turbo.api import turbo_decompress_device

    assert turbo_decompress_device(blob, interpret=True) == data


@pytest.mark.parametrize("kw", [{}, {"totals_only": True},
                                {"steptots": False}])
def test_resident_wire_modes(kw):
    data = generate_proba(80)[:40960]
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    blob = rans_compress_resident(x, group_size=40960, **kw)
    host_blob = turbo_compress_device(data, group_size=40960,
                                      interpret=True, pair=0, quad=0, **kw)
    assert blob == host_blob
    assert bytes(np.asarray(rans_decompress_resident(blob)).tobytes()) == data


def test_resident_empty():
    out = rans_decompress_resident(
        rans_compress_resident(jnp.zeros(0, jnp.uint8)))
    assert out.shape == (0,)


def test_resident_ragged_tail_wire_matches_host():
    """A mid-size ragged tail must be encoded at ITS OWN padded size (the
    r2 resident path encoded it at the full group span — diverging wire
    bytes and undecodable frames)."""
    data = generate_proba(80)[: 65536 + 20000]
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    blob = rans_compress_resident(x, group_size=65536)
    host_blob = turbo_compress_device(data, group_size=65536, interpret=True,
                                      pair=0, quad=0)
    assert blob == host_blob
    assert bytes(np.asarray(rans_decompress_resident(blob)).tobytes()) == data


def test_resident_group_cap_lifted():
    """r3: the resident path accepts multi-MiB groups (parity with the
    host path's 4 MiB chunked encode); >4 MiB still raises."""
    data = b"tiny"
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    blob = rans_compress_resident(x, group_size=2 << 20)  # no ValueError
    assert bytes(np.asarray(rans_decompress_resident(blob)).tobytes()) == data
    with pytest.raises(ValueError, match="VMEM"):
        rans_compress_resident(x, group_size=5 << 20)


def test_resident_roundtrip_on_device():
    """rans_resident_roundtrip: compress+decompress fully in device memory
    (decode tables built on device from the same normalized counts), host
    syncs only on scalars."""
    from finitestateentropy_tpu.turbo.device_api import rans_resident_roundtrip

    data = generate_proba(80)[: 2 * 65536]
    x = jnp.asarray(np.frombuffer(data, np.uint8))
    ok, total_cs, nbytes = rans_resident_roundtrip(x, group_size=65536)
    assert ok and nbytes == len(data)
    assert 0 < total_cs * 2 < len(data)


def test_device_table_packers_match_host():
    """ops/rans_tables batch packers == host packers (turbo/rans_kernels)
    on real normalized distributions."""
    from finitestateentropy_tpu.ops.rans_tables import (
        pack_rans_ctables_batch, pack_rans_dtable_batch)
    from finitestateentropy_tpu.refimpl.hist import hist_count
    from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
    from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_ctables,
                                                           pack_rans_dtable)

    rows, norms = [], []
    for p, tlog in ((80, 10), (14, 11), (2, 12)):
        chunk = np.frombuffer(generate_proba(p)[:65536], np.uint8)
        count, max_sv, _ = hist_count(chunk, 255)
        norm, _ = fse_normalize_count(tlog, count[: max_sv + 1], len(chunk),
                                      max_sv)
        full = np.zeros(256, np.int32)
        full[: max_sv + 1] = norm
        rows.append((full, norm, tlog, max_sv))
    for full, norm, tlog, max_sv in rows:
        fc_d, mg_d = pack_rans_ctables_batch(jnp.asarray(full[None]))
        fc_h, mg_h = pack_rans_ctables(norm)
        # entries beyond max_sv are unused (absent symbols); compare used
        used = np.zeros(256, bool)
        used[: max_sv + 1] = True
        assert np.array_equal(np.asarray(fc_d)[0].reshape(-1)[used],
                              fc_h.reshape(-1)[used])
        assert np.array_equal(np.asarray(mg_d)[0].reshape(-1)[used],
                              mg_h.reshape(-1)[used])
        dt_d = np.asarray(pack_rans_dtable_batch(jnp.asarray(full[None]), tlog))
        assert np.array_equal(dt_d[0], pack_rans_dtable(norm, tlog))
