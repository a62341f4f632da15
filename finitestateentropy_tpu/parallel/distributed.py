"""Multi-host setup (SURVEY §5 distributed backend).

The reference has no distributed runtime; this is the TPU-native layer added
on top: `jax.distributed.initialize` for multi-host process groups, a
2-level (dcn, ici) mesh so group gathers ride ICI within a slice while only
final frame assembly crosses DCN, and per-host shard manifests (io/jobs.py)
so an interrupted multi-host job resumes per shard.
"""
from __future__ import annotations

import jax

from .mesh import make_mesh, make_mesh_2level


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Wrapper over jax.distributed.initialize (env-driven when args omitted)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def codec_mesh():
    """Mesh for this job: (dcn, ici) across hosts, or flat dp on one host."""
    n_local = len(jax.local_devices())
    n_total = len(jax.devices())
    if n_total > n_local:
        return make_mesh_2level(n_total // n_local, n_local)
    return make_mesh(n_total)


def shard_ranges(n_groups: int, mesh=None) -> list[tuple[int, int]]:
    """Contiguous group ranges per process, the unit of per-host retry."""
    n_proc = jax.process_count()
    per = (n_groups + n_proc - 1) // n_proc
    return [(i * per, min((i + 1) * per, n_groups)) for i in range(n_proc)]
