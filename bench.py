"""Benchmark harness (driver contract: prints ONE JSON line to stdout).

Headline: FSE decode GB/s/chip on Proba80 (32KB blocks), the BASELINE.json
north-star configuration.  vs_baseline = ours / reference single-core
(0.440 GB/s, README.md:33).  Secondary metrics go to stderr.

Run: python bench.py [--blocks N] [--iters K] [--all]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

REF_MBPS = {  # reference README.md:32-42 (i7-5600U single core)
    ("fse", "decode", 80): 440.0,
    ("fse", "encode", 80): 325.0,
    ("huf", "decode", 80): 1350.0,
    ("huf", "encode", 80): 600.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prep_fse(data: bytes, n_blocks: int, block_size: int = 32768):
    """Host-side stage: stats, headers, padded device arrays."""
    from finitestateentropy_tpu.refimpl.fse import fse_compress
    from finitestateentropy_tpu.refimpl.ncount import fse_read_ncount

    base = [data[i : i + block_size] for i in range(0, len(data), block_size)]
    base = [b for b in base if len(b) == block_size]
    blocks = [base[i % len(base)] for i in range(n_blocks)]

    S = block_size
    pay_cap = S + (S >> 6) + 64
    src = np.zeros((n_blocks, S), np.uint8)
    streams = np.zeros((n_blocks, pay_cap), np.uint8)
    norms = np.zeros((n_blocks, 256), np.int32)
    tlogs = np.zeros(n_blocks, np.int32)
    csize = np.zeros(n_blocks, np.int32)
    ns = np.full(n_blocks, S, np.int32)

    cache = {}
    for i, b in enumerate(blocks):
        key = id(base[i % len(base)])
        if key not in cache:
            r = fse_compress(b)
            assert r.kind.name == "COMPRESSED"
            norm, max_sv, tlog, used = fse_read_ncount(r.data)
            cache[key] = (np.frombuffer(b, np.uint8), norm, tlog, r.data[used:])
        arr, norm, tlog, pay = cache[key]
        src[i] = arr
        norms[i, : len(norm)] = norm
        tlogs[i] = tlog
        streams[i, : len(pay)] = np.frombuffer(pay, np.uint8)
        csize[i] = len(pay)
    return src, ns, norms, tlogs, streams, csize, pay_cap


def bench_fse(n_blocks: int, iters: int, block_size: int = 32768):
    import jax
    import jax.numpy as jnp

    from finitestateentropy_tpu.ops import fse_kernels, fse_tables
    from finitestateentropy_tpu.utils import generate_proba

    log(f"devices: {jax.devices()}")
    data = generate_proba(80)
    src, ns, norms, tlogs, streams, csize, pay_cap = prep_fse(data, n_blocks, block_size)
    total_bytes = n_blocks * block_size

    d = lambda x: jax.device_put(jnp.asarray(x))
    src_d, ns_d, norms_d, tlogs_d = d(src), d(ns), d(norms), d(tlogs)
    streams_d, csize_d = d(streams), d(csize)

    dt = jax.block_until_ready(fse_tables.build_dtables(norms_d, tlogs_d))
    ct = jax.block_until_ready(fse_tables.build_ctables(norms_d, tlogs_d))

    @jax.jit
    def decode(streams, cs, n, tl, d0, d1, d2):
        out, err = fse_kernels.fse_decode_batch(streams, cs, n, tl, (d0, d1, d2),
                                                max_out=block_size)
        return out, err

    @jax.jit
    def encode(s, n, tl, c0, c1, c2):
        return fse_kernels.fse_encode_batch(s, n, tl, (c0, c1, c2),
                                            max_syms=block_size,
                                            out_bytes=pay_cap)

    # decode
    t0 = time.perf_counter()
    out, err = jax.block_until_ready(decode(streams_d, csize_d, ns_d, tlogs_d, *dt[:3]))
    log(f"decode compile+first: {time.perf_counter()-t0:.1f}s, err any: {bool(np.asarray(err).any())}")
    assert not np.asarray(err).any()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(decode(streams_d, csize_d, ns_d, tlogs_d, *dt[:3]))
        times.append(time.perf_counter() - t0)
    dec_gbps = total_bytes / min(times) / 1e9
    log(f"FSE decode: {dec_gbps:.3f} GB/s ({n_blocks} blocks, best of {iters})")

    # encode
    t0 = time.perf_counter()
    words, cs2 = jax.block_until_ready(encode(src_d, ns_d, tlogs_d, *ct))
    log(f"encode compile+first: {time.perf_counter()-t0:.1f}s")
    assert np.array_equal(np.asarray(cs2), csize), "encode size mismatch vs host twin"
    times_e = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(encode(src_d, ns_d, tlogs_d, *ct))
        times_e.append(time.perf_counter() - t0)
    enc_gbps = total_bytes / min(times_e) / 1e9
    log(f"FSE encode: {enc_gbps:.3f} GB/s")

    # verify decoded bytes
    ok = np.array_equal(np.asarray(out)[0], src[0])
    assert ok, "decode mismatch"
    return dec_gbps, enc_gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    dec_gbps, enc_gbps = bench_fse(args.blocks, args.iters)
    ref = REF_MBPS[("fse", "decode", 80)] / 1000.0  # GB/s
    print(
        json.dumps(
            {
                "metric": "FSE decode GB/s/chip, Proba80 32KB blocks (encode stderr)",
                "value": round(dec_gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(dec_gbps / ref, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
