"""Mesh-sharded codec paths produce byte-identical output to single-device
(VERDICT r1: CLI --mesh must be live and the v2 kernel must run under
shard_map).  Runs on the 8-device virtual CPU mesh from conftest."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from finitestateentropy_tpu.io import frame as fio
from finitestateentropy_tpu.models.fse_codec import FseTpuCodec
from finitestateentropy_tpu.models.huf_codec import HufTpuCodec
from finitestateentropy_tpu.utils import generate_proba

BS = 4096
DATA = generate_proba(80)[: BS * 6 + 1234]  # ragged tail, 7 blocks (pads to 8)

MESH = 8


def test_fse_mesh_frames_byte_identical():
    solo = fio.compress_bytes(DATA, "fse", block_size_id=2,
                              compressor=FseTpuCodec(block_size=BS).compress_blocks)
    meshed_codec = FseTpuCodec(block_size=BS, mesh=MESH)
    meshed = fio.compress_bytes(DATA, "fse", block_size_id=2,
                                compressor=meshed_codec.compress_blocks)
    assert meshed == solo
    back = fio.decompress_bytes(meshed,
                                decompressor=meshed_codec.decompress_blocks)
    assert back == DATA


def test_huf_mesh_frames_byte_identical():
    solo = fio.compress_bytes(DATA, "huf", block_size_id=2,
                              compressor=HufTpuCodec(block_size=BS).compress_blocks)
    meshed_codec = HufTpuCodec(block_size=BS, mesh=MESH)
    meshed = fio.compress_bytes(DATA, "huf", block_size_id=2,
                                compressor=meshed_codec.compress_blocks)
    assert meshed == solo
    back = fio.decompress_bytes(meshed,
                                decompressor=meshed_codec.decompress_blocks)
    assert back == DATA


@pytest.mark.parametrize("steptots", [True, False])
def test_turbo_mesh_blobs_byte_identical(steptots):
    """The production wire (speed mode incl. the v2 decode kernel) under
    shard_map must produce/consume identical bytes to single-device."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    data = generate_proba(80)[: 3 * 8192 + 777]
    solo = turbo_compress_device(data, group_size=8192, interpret=True,
                                 steptots=steptots)
    meshed = turbo_compress_device(data, group_size=8192, interpret=True,
                                   steptots=steptots, mesh=MESH)
    assert meshed == solo
    assert turbo_decompress_device(meshed, interpret=True, mesh=MESH) == data


def test_mesh_fallback_warns_when_too_few_devices():
    from finitestateentropy_tpu.parallel.mesh import get_mesh

    with pytest.warns(UserWarning, match="single-device"):
        assert get_mesh(512) is None
    assert get_mesh(1) is None
    assert get_mesh(MESH) is not None


def test_cli_mesh_device_tpu_matches_host(tmp_path):
    from finitestateentropy_tpu.cli import main

    src = tmp_path / "in.bin"
    src.write_bytes(DATA)
    a, b = tmp_path / "mesh.fse", tmp_path / "host.fse"
    assert main(["-e", "--device", "tpu", "--mesh", str(MESH), "-B", "4K",
                 "-f", str(src), str(a)]) == 0
    assert main(["-e", "-B", "4K", "-f", str(src), str(b)]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_multihost_init_single_process(tmp_path):
    """initialize_multihost / codec_mesh / shard_ranges smoke: a 1-process
    'cluster' must initialize, build a mesh, and shard ranges.  Runs in a
    subprocess because jax.distributed must init before the backend."""
    script = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# the axon site plugin force-sets jax_platforms in config (beats the env
# var) -- override both before any backend init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
from finitestateentropy_tpu.parallel.distributed import (
    initialize_multihost, codec_mesh, shard_ranges)
initialize_multihost("localhost:12399", num_processes=1, process_id=0)
assert jax.process_count() == 1
mesh = codec_mesh()
assert mesh.devices.size == 4, mesh
ranges = shard_ranges(10)
assert ranges == [(0, 10)], ranges
# and a sharded turbo step runs under the distributed-initialized runtime
from finitestateentropy_tpu.parallel.mesh import make_mesh
from finitestateentropy_tpu.parallel.turbo_dp import sharded_turbo_roundtrip_v2
import numpy as np
from finitestateentropy_tpu.turbo.api import _hrows_cap, _prep_group
from finitestateentropy_tpu.turbo.format import TURBO_STEP_SYMS, _pad_n
from finitestateentropy_tpu.turbo.rans_kernels import (pack_rans_ctables,
                                                       pack_rans_dtable)
from finitestateentropy_tpu.utils import generate_proba
base = generate_proba(80)
gsz = 8192
n_pad = _pad_n(gsz); t4 = n_pad // TURBO_STEP_SYMS; hcap = _hrows_cap(n_pad)
G = 4
fc = np.zeros((G,2,128),np.int32); mg = np.zeros((G,2,128),np.int32)
dtbl = np.zeros((G,16,128),np.int32); srcw = np.zeros((G,t4*8,128),np.int32)
for g in range(G):
    chunk = np.frombuffer(base[g*gsz:(g+1)*gsz], np.uint8)
    norm, _sv, _nc, mfs = _prep_group(chunk)
    fc[g], mg[g] = pack_rans_ctables(norm)
    dtbl[g] = pack_rans_dtable(norm)
    pad = np.full(n_pad, mfs, np.uint8); pad[:gsz] = chunk
    srcw[g] = pad.view("<u4").view(np.int32).reshape(t4*8,128)
import jax.numpy as jnp
step = sharded_turbo_roundtrip_v2(mesh, t4, hcap, interpret=True)
ok, total = step(jnp.asarray(fc), jnp.asarray(mg), jnp.asarray(srcw),
                 jnp.asarray(dtbl))
assert int(ok) == 1
print("MULTIHOST_OK", int(total))
"""
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent) + \
        ((":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else "")
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MULTIHOST_OK" in r.stdout
