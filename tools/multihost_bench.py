"""Multi-host scaling benchmark — the one-command runbook entry
(docs/MULTIHOST.md).  Run the SAME command on every host:

    python -m tools.multihost_bench [--coordinator HOST:PORT
        --num-processes N --process-id RANK] [--group-mib 1] [--gib 1]

Initializes jax.distributed (env-driven on TPU VMs when flags are
omitted), shards a p80 corpus over all chips through the production
shard_map kernels, verifies the roundtrip, and prints aggregate GB/s +
scaling efficiency vs a --single-chip reference (defaults to the decode
value in BENCH_r05.json / the r5 measured 50.5 GB/s).

Works single-host too (including the 8-device virtual CPU mesh:
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which is how tests/test_mesh_paths.py exercises this file's path.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--group-mib", type=int, default=1)
    ap.add_argument("--gib", type=float, default=1.0,
                    help="corpus size per measurement pass")
    ap.add_argument("--single-chip", type=float, default=0.0,
                    help="single-chip decode GB/s for the efficiency "
                         "denominator (0 = read BENCH_r05.json, else 50.5)")
    args = ap.parse_args()

    import os

    from finitestateentropy_tpu.parallel.distributed import (
        codec_mesh, initialize_multihost)

    # single-process smoke (virtual mesh / one host, no flags, no TPU-VM
    # env): skip jax.distributed — codec_mesh falls back to a flat dp mesh
    multi = (args.coordinator is not None
             or os.environ.get("COORDINATOR_ADDRESS")
             or "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))
    if multi:
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # virtual-mesh smoke: the site plugin force-sets jax_platforms in
        # config (beats the env var), override like tests/conftest.py
        jax.config.update("jax_platforms", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" in flags:
            n = int(flags.rsplit("=", 1)[1].split()[0])
            jax.config.update("jax_num_cpu_devices", n)

    mesh = codec_mesh()
    n_chips = mesh.devices.size
    print(f"[host {jax.process_index()}/{jax.process_count()}] mesh "
          f"{mesh.shape} = {n_chips} chips", flush=True)

    single = args.single_chip
    if single == 0.0:
        bench_json = Path(__file__).resolve().parent.parent / "BENCH_r05.json"
        try:
            single = float(json.loads(bench_json.read_text())["value"])
        except Exception:
            single = 50.5   # r5 measured production-dispatch decode

    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)
    from finitestateentropy_tpu.utils import generate_proba
    from finitestateentropy_tpu.utils.xxhash32 import xxh32

    interpret = jax.default_backend() == "cpu"   # virtual-mesh smoke
    group = args.group_mib << 20
    nbytes = int(args.gib * (1 << 30)) // group * group
    base = generate_proba(80)
    data = bytes((base * (nbytes // len(base) + 1))[:nbytes])

    # warm compiles
    warm = turbo_compress_device(data[: 4 * group], group_size=group,
                                 mesh=n_chips, interpret=interpret)
    turbo_decompress_device(warm, mesh=n_chips, interpret=interpret)

    t0 = time.perf_counter()
    blob = turbo_compress_device(data, group_size=group, mesh=n_chips,
                                 interpret=interpret)
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = turbo_decompress_device(blob, mesh=n_chips, interpret=interpret)
    t_dec = time.perf_counter() - t0
    assert xxh32(out) == xxh32(data), "roundtrip hash mismatch"

    enc = nbytes / t_enc / 1e9
    dec = nbytes / t_dec / 1e9
    eff = dec / (single * n_chips) * 100
    print(json.dumps({
        "chips": n_chips, "hosts": jax.process_count(),
        "ratio": round(nbytes / len(blob), 3),
        "enc_gbps": round(enc, 3), "dec_gbps": round(dec, 3),
        "dec_gbps_per_chip": round(dec / n_chips, 3),
        "scaling_efficiency_pct": round(eff, 1),
        "pass": eff >= 80.0,
    }), flush=True)


if __name__ == "__main__":
    main()
