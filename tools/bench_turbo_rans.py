"""Real-chip TurboRANS encode+decode benchmark (kernel-level, honest timing)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group, _round8
from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import rans_compress, parse_rans_group
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_rans_ctables, pack_rans_dtable, rans_decode, rans_encode)
from finitestateentropy_tpu.utils import generate_proba

GROUP = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
G = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PNAME = int(sys.argv[3]) if len(sys.argv) > 3 else 80

base = generate_proba(PNAME)
data = (base * ((GROUP // len(base)) + 1))[:GROUP]
src = np.frombuffer(data, np.uint8)
norm, max_sv, ncount, mfs = _prep_group(src)
n_pad = _pad_n(GROUP)
t4 = n_pad // TURBO_STEP_SYMS
hcap = _hrows_cap(n_pad)

fc, mg = pack_rans_ctables(norm)
fcb = jnp.asarray(np.broadcast_to(fc, (G, 2, 128)).copy())
mgb = jnp.asarray(np.broadcast_to(mg, (G, 2, 128)).copy())
pad = np.full(n_pad, mfs, np.uint8); pad[:GROUP] = src
srcw = jnp.asarray(np.broadcast_to(
    pad.view("<u4").view(np.int32).reshape(t4 * 8, 128), (G, t4 * 8, 128)).copy())

total = G * GROUP
print(f"groups: {G} x {GROUP} = {total>>20} MiB, proba{PNAME}")

# ---- encode
t0 = time.perf_counter()
stream, fin, csize, _st = rans_encode(fcb, mgb, srcw, t4, hcap)
cs = np.asarray(csize)
print(f"encode compile+first: {time.perf_counter()-t0:.1f}s, csize_hw[0]={cs[0]}, ratio {GROUP/(cs[0]*2):.2f}")

ts = []
for _ in range(4):
    t0 = time.perf_counter()
    stream, fin, csize, _st = rans_encode(fcb, mgb, srcw, t4, hcap)
    np.asarray(csize)
    ts.append(time.perf_counter() - t0)
enc = min(ts)
print(f"encode: {total/enc/1e9:.3f} GB/s ({enc*1e3:.1f} ms)  per-step {enc/(G*t4*4)*1e9:.0f} ns")

# ---- verify encode vs twin
twin = rans_compress(data)
(tn, tcs, ttl, tfl, tnorm, tmsv, tinit, tpay, _tst), _ = parse_rans_group(twin)
got_hw = np.asarray(stream)[0].reshape(-1)[: int(cs[0])].astype(np.uint16)
want_hw = np.frombuffer(tpay, "<u2")
print("encode matches twin:", int(cs[0]) == tcs and np.array_equal(got_hw, want_hw),
      "| states match:", np.array_equal(
          np.asarray(fin)[0].reshape(-1).view(np.uint32), tinit))

# ---- decode
hrows = _round8(int(cs[0] + 127) // 128 + 16)
tbl = jnp.asarray(np.broadcast_to(pack_rans_dtable(norm), (G, 16, 128)).copy())
hws = np.zeros((G, hrows, 128), np.int32)
hws.reshape(G, -1)[:, : int(cs[0])] = got_hw.astype(np.int32)
hws = jnp.asarray(hws)
initd = jnp.asarray(np.broadcast_to(tinit.view(np.int32).reshape(8, 128), (G, 8, 128)).copy())
csd = jnp.asarray(np.full(G, int(cs[0]), np.int32))

t0 = time.perf_counter()
outw, err = rans_decode(csd, tbl, initd, hws, t4, hrows)
e = np.asarray(err)
print(f"decode compile+first: {time.perf_counter()-t0:.1f}s, err: {e[:4]}")
assert not e.any()
ob = np.asarray(outw)[0].astype("<i4").tobytes()[:GROUP]
print("decode bytes correct:", ob == data)

ts = []
for _ in range(4):
    t0 = time.perf_counter()
    outw, err = rans_decode(csd, tbl, initd, hws, t4, hrows)
    np.asarray(err)
    ts.append(time.perf_counter() - t0)
dec = min(ts)
print(f"decode: {total/dec/1e9:.3f} GB/s ({dec*1e3:.1f} ms)  per-step {dec/(G*t4*4)*1e9:.0f} ns")
