"""Device mesh construction.

The codec's only parallel axis is data parallelism over independent blocks
(the reference's 32KB-block independence, fileio.c:292/bench.c:98, promoted
to the unit of sharding).  Multi-host runs use a 2-level (dcn, ici) mesh so
block gathers ride ICI within a slice and only final frame assembly crosses
DCN (SURVEY §5).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2level(n_hosts: int, per_host: int) -> Mesh:
    """(dcn, ici) mesh for multi-host runs."""
    devs = np.array(jax.devices()[: n_hosts * per_host]).reshape(n_hosts, per_host)
    return Mesh(devs, ("dcn", "ici"))


def get_mesh(n: int) -> Mesh | None:
    """Mesh for a user-requested data-parallel width, or None for 1-device.

    n <= 1 or fewer attached devices than requested -> None (callers fall
    back to the single-device path, matching the CLI --mesh contract)."""
    if n <= 1:
        return None
    avail = device_count()
    if avail < n:
        import warnings

        warnings.warn(f"--mesh {n} requested but only {avail} device(s) "
                      f"attached; running single-device")
        return None
    return make_mesh(n)
