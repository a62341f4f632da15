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


def test_window_dispatch_u16_model():
    """u16 kernel dispatch, calibrated on v5e (probe_sweep_b.py r4):
    resident v2 wins at 1 MiB groups (19.9 vs 17.7 GB/s — the u16 step
    amortizes per-step cost over 2 bytes, so v2's nv=5 does not collapse
    like the bytes wire), windowed wins at 2-4 MiB (17.9 vs 6.2 at nv=1);
    and the window span S must never exceed 64 rows — S=128 crashes the
    Mosaic remote compiler deterministically on v5e, so even a forced
    windows=N request is capped."""
    from finitestateentropy_tpu.turbo.api import _window_dispatch

    def hrows(cs):
        return ((cs + 127) // 128 + 16 + 7) // 8 * 8

    # 1 MiB u16 group at ratio ~2 -> nv = 5 -> resident v2
    assert _window_dispatch(0, 256, hrows(268500), 11, 32, False, True) \
        == (0, 0)
    # 4 MiB -> nv = 1 -> windowed, S capped at 64 (t2 % 128 == 0)
    assert _window_dispatch(0, 1024, hrows(1 << 20), 11, 32, False, True) \
        == (8, 64)
    # forced windowed must also cap S
    nway, S = _window_dispatch(8, 256, hrows(268500), 11, 32, False, True)
    assert (nway, S) == (8, 64)
    # bytes wire unchanged: 1 MiB p80 -> windowed 8-way S=64
    assert _window_dispatch(0, 256, hrows(63200), 10, 56, False) == (8, 64)


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
