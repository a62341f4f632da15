"""TurboRANS sharded over the 8-device virtual CPU mesh (interpret kernels)."""
import numpy as np
import pytest

from finitestateentropy_tpu.utils import generate_proba


def _mesh():
    import jax
    from finitestateentropy_tpu.parallel.mesh import make_mesh

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    return make_mesh(n), n


def test_sharded_turbo_roundtrip():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from finitestateentropy_tpu.parallel.turbo_dp import sharded_turbo_roundtrip
    from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
    from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
    from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_ctables,
                                                           pack_rans_dtable)

    mesh, n_dev = _mesh()
    gsz = 8192
    G = 2 * n_dev
    base = generate_proba(80)
    n_pad = _pad_n(gsz)
    t4 = n_pad // TURBO_STEP_SYMS
    hcap = _hrows_cap(n_pad)

    fc = np.zeros((G, 2, 128), np.int32)
    mg = np.zeros((G, 2, 128), np.int32)
    dtbl = np.zeros((G, 16, 128), np.int32)
    srcw = np.zeros((G, t4 * 8, 128), np.int32)
    for g in range(G):
        chunk = np.frombuffer(base[g * gsz : (g + 1) * gsz], np.uint8)
        norm, max_sv, ncount, mfs = _prep_group(chunk)
        fc[g], mg[g] = pack_rans_ctables(norm)
        dtbl[g] = pack_rans_dtable(norm)
        pad = np.full(n_pad, mfs, np.uint8)
        pad[:gsz] = chunk
        srcw[g] = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)

    dp = NamedSharding(mesh, P("dp"))
    step = sharded_turbo_roundtrip(mesh, t4, hcap, interpret=True)
    ok, total = step(
        jax.device_put(jnp.asarray(fc), dp),
        jax.device_put(jnp.asarray(mg), dp),
        jax.device_put(jnp.asarray(srcw), dp),
        jax.device_put(jnp.asarray(dtbl), dp),
    )
    assert int(ok) == 1, "sharded round-trip failed verification"
    assert int(total) > 0
