"""probaGenerator twin must be byte-identical to the reference binary."""
import hashlib
import subprocess

import pytest

from finitestateentropy_tpu.utils.probagen import generate_proba
from tests.conftest import requires_ref

# md5 of corpora produced by the reference `probagen N%` binary
GOLDEN = {
    80: "7eadfac6f83805f07fdf9345fba9d673",
    14: "ac6f59cd6545e7a44aa362832ec8da2b",
    2: "7b73bf489a99e28828b6667f23927baa",
}


@pytest.mark.parametrize("pct", [80, 14, 2])
def test_probagen_matches_golden_md5(pct):
    data = generate_proba(pct)
    assert len(data) == (1 << 20) - 1
    assert hashlib.md5(data).hexdigest() == GOLDEN[pct]


@requires_ref
def test_probagen_matches_binary(tmp_path, ref_probagen):
    subprocess.run([ref_probagen, "20%"], cwd=tmp_path, check=True, capture_output=True)
    ref = (tmp_path / "proba.bin").read_bytes()
    assert generate_proba(20) == ref
