"""Scratch differential test: device FSE kernels vs the host twin."""
import numpy as np
import jax.numpy as jnp

from finitestateentropy_tpu.refimpl.fse import fse_compress
from finitestateentropy_tpu.refimpl.ncount import fse_read_ncount
from finitestateentropy_tpu.ops.fse_tables import build_dtables, build_ctables
from finitestateentropy_tpu.ops.fse_kernels import fse_decode_batch, fse_encode_batch
from finitestateentropy_tpu.utils import generate_proba

BS = 4096
data = generate_proba(80)
blocks = [data[i * BS : (i + 1) * BS] for i in range(6)]
rng = np.random.default_rng(0)
blocks.append(
    rng.choice(8, BS - 37, p=np.r_[0.7, np.full(7, 0.3 / 7)]).astype(np.uint8).tobytes()
)  # ragged block
blocks.append(rng.choice(3, 101, p=[0.8, 0.15, 0.05]).astype(np.uint8).tobytes())  # tiny odd

norms, tlogs, paylens, payloads, lens = [], [], [], [], []
S = 8192
streams = np.zeros((len(blocks), S), np.uint8)
for i, b in enumerate(blocks):
    r = fse_compress(b)
    norm, max_sv, tlog, used = fse_read_ncount(r.data)
    norms.append(norm + [0] * (256 - len(norm)))
    tlogs.append(tlog)
    pay = r.data[used:]
    streams[i, : len(pay)] = np.frombuffer(pay, np.uint8)
    paylens.append(len(pay))
    payloads.append(pay)
    lens.append(len(b))

norm_arr = jnp.array(np.array(norms, np.int32))
tlog_arr = jnp.array(np.array(tlogs, np.int32))
nsarr = jnp.array(np.array(lens, np.int32))
cs = jnp.array(np.array(paylens, np.int32))

nst, sym, nb, fm = build_dtables(norm_arr, tlog_arr)
out, err = fse_decode_batch(jnp.array(streams), cs, nsarr, tlog_arr, (nst, sym, nb), max_out=BS)
out = np.asarray(out)
err = np.asarray(err)
print("decode err flags:", err)
for i, b in enumerate(blocks):
    assert not err[i], f"err flag set on valid block {i}"
    assert out[i][: len(b)].tobytes() == b, f"decode mismatch block {i}"
print("DEVICE DECODE matches original on all blocks")

st, dfs, dnb = build_ctables(norm_arr, tlog_arr)
src = np.zeros((len(blocks), BS), np.uint8)
for i, b in enumerate(blocks):
    src[i, : len(b)] = np.frombuffer(b, np.uint8)
words, csize = fse_encode_batch(
    jnp.array(src), nsarr, tlog_arr, (st, dfs, dnb), max_syms=BS, out_bytes=BS + BS // 2
)
words = np.asarray(words)
csize = np.asarray(csize)
for i, b in enumerate(blocks):
    got = words[i].astype("<u4").tobytes()[: csize[i]]
    assert got == payloads[i], f"encode mismatch block {i}: {csize[i]} vs {len(payloads[i])}"
print("DEVICE ENCODE byte-identical to twin on all blocks")
