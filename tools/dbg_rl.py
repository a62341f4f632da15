"""Localize probe_encode5 row-local divergence vs shipped encode2 (interpret, tiny input)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans import RANS_SPEED_TABLELOG
from finitestateentropy_tpu.turbo.rans_kernels import (
    pack_rans_ctables, rans_encode2)
from finitestateentropy_tpu.refimpl.norm import fse_normalize_count
from finitestateentropy_tpu.refimpl.hist import hist_count
from finitestateentropy_tpu.utils import generate_proba
from tools.probe_encode5 import rl_encode, _round8

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64 << 10
data = generate_proba(80)[:N]
src = np.frombuffer(data, np.uint8)
n = len(src)
count, max_sv, _mc = hist_count(src, 255)
norm, tlog = fse_normalize_count(RANS_SPEED_TABLELOG, count[: max_sv + 1], n, max_sv)
fc, mg = pack_rans_ctables(norm)
n_pad = _pad_n(n)
t4 = n_pad // TURBO_STEP_SYMS
hcap = _round8((n_pad + 127) // 128 + 16)
pad = np.full(n_pad, int(np.argmax(count)), np.uint8)
pad[:n] = src
srcw = pad.view("<u4").view(np.int32).reshape(t4 * 8, 128)
G = 1
args = [jnp.asarray(np.broadcast_to(a, s).copy()) for a, s in
        [(fc, (G, 2, 128)), (mg, (G, 2, 128)), (srcw, (G, t4 * 8, 128))]]

sb, fb, cb, tb = rans_encode2(*args, t4, hcap, True, False, tlog)
s, f, c, t = rl_encode(*args, t4, hcap, tlog, False, True)
print("csize:", int(c[0]), int(cb[0]))
sb = np.asarray(sb)[0]; s = np.asarray(s)[0]
diff = np.argwhere(s != sb)
print("diff words:", len(diff), "of", s.size)
if len(diff):
    for r, l in diff[:12]:
        print(f"  word[{r},{l}]  rl={s[r,l]:#010x} base={sb[r,l]:#010x}  flatw={r*128+l}")
    print("  last diff:", diff[-1], "cursor words ~", int(cb[0]) // 2)
print("finals equal:", np.array_equal(np.asarray(f), np.asarray(fb)))
print("stots equal:", np.array_equal(np.asarray(t), np.asarray(tb)))
