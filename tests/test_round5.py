"""Round-5 regression tests: bench hygiene (VERDICT r4 items 3a-c) and
pair-wire dispatch invariants."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_rate_pos_resamples_nonpositive(monkeypatch, capsys):
    """BENCH_r04 shipped a 0.000 GB/s line because bench_group_sweep
    printed a single raw queue-k sample; every section now goes through
    _rate_pos, which discards and resamples non-positive samples
    (VERDICT r4 weak #1 / next #3a)."""
    calls = {"n": 0}

    def fake_rate_b(dispatch, bpc, k1=2, k2=10, reps=3):
        calls["n"] += 1
        return (0.0, (0.01, 0.009)) if calls["n"] < 3 else (7.5, (0.01, 0.02))

    monkeypatch.setattr(bench, "_rate_b", fake_rate_b)
    gbps, ts = bench._rate_pos(lambda: None, 1 << 20, label="unit")
    assert gbps == 7.5 and calls["n"] == 3
    err = capsys.readouterr().err
    assert err.count("non-positive queue-k sample discarded") == 2


def test_rate_pos_gives_up_after_max_tries(monkeypatch):
    monkeypatch.setattr(bench, "_rate_b",
                        lambda d, b, k1=2, k2=10, reps=3: (0.0, (0.01, 0.009)))
    gbps, _ = bench._rate_pos(lambda: None, 1 << 20, max_tries=3, label="unit")
    assert gbps == 0.0


def test_bench_sections_use_rate_pos():
    """No bench section may print a raw single _rate_b sample: every
    measurement call site outside _rate_pos itself must go through the
    resample wrapper."""
    src = Path(bench.__file__).read_text()
    body = src.split("def _rate_pos", 1)[1]
    assert "_rate_b(" not in body.split("def bench_rans", 1)[1], \
        "a bench section calls _rate_b directly (no resample loop)"


def test_pair_wins_respects_give():
    """The dispatch trades at most PAIR_RATIO_GIVE predicted size."""
    from finitestateentropy_tpu.turbo.api import (PAIR_RATIO_GIVE, _pair_wins,
                                                  _prep_group)
    from finitestateentropy_tpu.turbo.pair import prep_pair_group
    from finitestateentropy_tpu.utils import generate_proba

    data = np.frombuffer(generate_proba(80)[: 1 << 17], np.uint8)
    prep = _prep_group(data, 10)
    pp = prep_pair_group(data)
    assert pp is not None
    assert _pair_wins(data, prep, 10, pp, False)  # p80: pair wins

    # near-uniform: prep is None upstream (raw), but even a coded
    # wide-alphabet corpus must reject pair when ineligible
    d14 = np.frombuffer(generate_proba(14)[: 1 << 17], np.uint8)
    assert prep_pair_group(d14) is None
    assert not _pair_wins(d14, _prep_group(d14, 10), 10, None, False)


import pytest


@pytest.mark.slow
def test_headline_json_contract(tmp_path):
    """bench.py --smoke prints exactly one JSON line on stdout with the
    driver-contract keys, and no section ships a 0.000 rate silently
    (smoke numbers are meaningless but must be present and well-formed).
    Marked slow: the CI bench-smoke job runs the same gate."""
    import json
    import subprocess

    r = subprocess.run([sys.executable, str(Path(bench.__file__)),
                        "--smoke"], capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    j = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(j)
