"""Round-4 regression tests: observable kernel fallbacks and the bench
smoke harness (VERDICT r3 items 2c and 8)."""
import subprocess
import sys

import numpy as np
import pytest

from finitestateentropy_tpu.utils.debug import set_debuglevel


def test_windows_fallback_is_logged(capsys):
    """The windowed-decode eligibility gate (turbo/api.py) must say WHY it
    falls back to the resident kernel instead of silently changing the
    performance profile (VERDICT r3 weak #6)."""
    from finitestateentropy_tpu.turbo.api import (turbo_compress_device,
                                                  turbo_decompress_device)

    rng = np.random.default_rng(7)
    # 16 KiB -> t4 = 4, not a multiple of 64 -> windowed path ineligible
    data = bytes(rng.integers(0, 8, 16384, dtype=np.uint8))
    blob = turbo_compress_device(data, interpret=True)
    set_debuglevel(2)
    try:
        out = turbo_decompress_device(blob, interpret=True, windows=8)
    finally:
        set_debuglevel(0)
    assert out == data
    err = capsys.readouterr().err
    assert "windows=8 requested but falling back" in err
    assert "t4=4" in err


def test_windows_fallback_u16_is_logged(capsys):
    from finitestateentropy_tpu.turbo.api import (turbo16_compress_device,
                                                  turbo16_decompress_device)

    rng = np.random.default_rng(8)
    # skewed so the group actually codes (uniform data goes raw and never
    # reaches the kernel dispatch); 4096 syms -> t2 = 2, window-ineligible
    syms = np.clip((rng.pareto(1.2, 4096) * 50).astype(np.int64),
                   0, 1023).astype(np.uint16)
    blob = turbo16_compress_device(syms, interpret=True)
    set_debuglevel(2)
    try:
        out = turbo16_decompress_device(blob, interpret=True, windows=8)
    finally:
        set_debuglevel(0)
    assert np.array_equal(out, syms)
    err = capsys.readouterr().err
    assert "turbo16 decode: windows=8 requested but falling back" in err


@pytest.mark.slow
def test_bench_smoke():
    """bench.py --smoke must execute EVERY section end-to-end on the CPU
    backend (r3 shipped two silently-broken sections; this is the CI gate
    from VERDICT r3 item #2c)."""
    r = subprocess.run([sys.executable, "bench.py", "--smoke"],
                       capture_output=True, text=True, timeout=1800,
                       cwd=str(__import__("pathlib").Path(__file__).parent.parent))
    assert r.returncode == 0, r.stderr[-4000:]
    assert "smoke: every bench section executed" in r.stderr
    import json

    line = r.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert "metric" in parsed and "value" in parsed
