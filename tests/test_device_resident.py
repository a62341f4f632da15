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
    host_blob = turbo_compress_device(data, group_size=65536, interpret=True)
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
                                      interpret=True, **kw)
    assert blob == host_blob
    assert bytes(np.asarray(rans_decompress_resident(blob)).tobytes()) == data


def test_resident_empty():
    out = rans_decompress_resident(
        rans_compress_resident(jnp.zeros(0, jnp.uint8)))
    assert out.shape == (0,)
