"""Capture a jax.profiler trace of the hot kernels (SURVEY §5 tracing row).

The reference has no tracer — its profiling story is the two bench
harnesses plus DEBUGLOG. Here the TPU-native equivalent is a real XLA
trace: run the headline encode/decode under jax.profiler and dump a
TensorBoard-loadable trace directory.

Usage:  python tools/profile_trace.py [outdir]

Note: the axon tunnel backend on this box may not support device-side
profiling; the script degrades to host-side trace events in that case.
"""
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fse_tpu_trace"
    from bench import _prep
    import jax.numpy as jnp
    from finitestateentropy_tpu.turbo.rans_kernels import (
        rans_decode_v2, rans_encode)

    p = _prep(1 << 20, 80)
    fc, mg = p["fc_mg"]
    t4, hcap = p["t4"], p["hcap"]
    G = 16
    ea = (jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy()),
          jnp.asarray(np.broadcast_to(p["srcw"], (G, t4 * 8, 128)).copy()))
    # warm up compiles outside the trace window
    stream, fin, csize, stots = rans_encode(*ea, t4, hcap)
    cs = int(np.asarray(csize)[0])
    hrows = p["round8"]((cs + 127) // 128 + 16)
    hws = np.zeros((G, hrows, 128), np.int32)
    hws.reshape(G, -1)[:, :cs] = np.asarray(stream)[0].reshape(-1)[:cs]
    da = (jnp.asarray(np.full(G, cs, np.int32)),
          jnp.asarray(np.broadcast_to(p["dtbl"], (G, 16, 128)).copy()),
          jnp.asarray(np.asarray(fin)),
          jnp.asarray(hws),
          jnp.asarray(np.asarray(stots)))
    np.asarray(rans_decode_v2(*da, t4, hrows)[1])

    with jax.profiler.trace(outdir):
        np.asarray(rans_encode(*ea, t4, hcap)[2])
        np.asarray(rans_decode_v2(*da, t4, hrows)[1])
    print(f"trace written to {outdir} (open with TensorBoard)")


if __name__ == "__main__":
    main()
