import os
import subprocess
import sys
from pathlib import Path

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; force it (the environment may preset a TPU platform)
# before jax import anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon site plugin force-sets jax_platforms in config (beats the env
# var), so override both; jax_num_cpu_devices is the jax>=0.7 spelling of
# the virtual-device-count flag
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest

REPO = Path(__file__).resolve().parent.parent

# persistent compilation cache: repeat suite runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
REF_BIN = REPO / "tools" / "ref" / "bin"


def _ensure_ref_binaries():
    if (REF_BIN / "fse").exists() and (REF_BIN / "probagen").exists():
        return True
    build = REPO / "tools" / "ref" / "build.sh"
    try:
        subprocess.run(["sh", str(build)], check=True, capture_output=True)
        return True
    except Exception:
        return False


HAVE_REF = _ensure_ref_binaries()

requires_ref = pytest.mark.skipif(not HAVE_REF, reason="reference oracle binaries unavailable")


@pytest.fixture(scope="session")
def ref_fse():
    assert HAVE_REF
    return str(REF_BIN / "fse")


@pytest.fixture(scope="session")
def ref_probagen():
    assert HAVE_REF
    return str(REF_BIN / "probagen")
