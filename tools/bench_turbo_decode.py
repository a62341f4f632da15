"""Real-chip TurboFSE decode benchmark (honest sync via tiny err transfer)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.format import (
    TURBO_LANES, _pad_n, parse_group, turbo_fse_compress)
from finitestateentropy_tpu.turbo.kernels import turbo_fse_decode, pack_dtable
from finitestateentropy_tpu.utils import generate_proba

GROUP = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
G = int(sys.argv[2]) if len(sys.argv) > 2 else 4

base = generate_proba(80)
data = (base * ((GROUP // len(base)) + 1))[:GROUP]
blob = turbo_fse_compress(data)
g, _ = parse_group(blob)
print(f"group {GROUP} bytes, csize_bits {g.csize_bits}, ratio {GROUP/len(blob):.2f}")

n_pad = _pad_n(g.n_sym)
t4 = n_pad // TURBO_LANES // 4
words = np.frombuffer(g.payload, "<u4").astype(np.int32)
from finitestateentropy_tpu.turbo.kernels import wrows_for
wrows = wrows_for(len(words))
stream = np.zeros((G, wrows, 128), np.int32)
stream.reshape(G, -1)[:, : len(words)] = words
tbl = np.broadcast_to(pack_dtable(g.norm, g.max_symbol_value, g.table_log), (G, 16, 128)).copy()
init = np.broadcast_to(g.init_states.astype(np.int32).reshape(8, 128), (G, 8, 128)).copy()
cs = np.full(G, g.csize_bits, np.int32)

args = [jnp.asarray(x) for x in (cs, tbl, init, stream)]

t0 = time.perf_counter()
out, err = turbo_fse_decode(*args, t4, wrows)
e = np.asarray(err)
print(f"compile+first: {time.perf_counter()-t0:.1f}s, err residues: {e.ravel()[:4]}")
assert not e.any(), "decode cursor residue nonzero"

# verify decoded bytes for group 0
ob = np.asarray(out)[0].astype("<i4").tobytes()[: g.n_sym]
print("bytes correct:", ob == data)

ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out, err = turbo_fse_decode(*args, t4, wrows)
    np.asarray(err)
    ts.append(time.perf_counter() - t0)
best = min(ts)
total = G * GROUP
print(f"decode: {total/best/1e9:.3f} GB/s  ({total>>20} MiB in {best*1e3:.2f} ms)")
print(f"per-step: {best/(G*t4*4)*1e9:.1f} ns")
