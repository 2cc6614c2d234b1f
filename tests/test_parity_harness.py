"""The parity harness (scripts/parity.py) must run end-to-end the moment
data/weights appear — validate its plumbing now on the synthetic smoke
path: golden capture on first run, golden comparison on the second
(identical weights → zero deltas → OK), report JSON written.
"""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "parity.py")


@pytest.mark.slow
def test_parity_smoke_capture_then_compare(tmp_path):
    golden = str(tmp_path / "goldens.json")
    report = str(tmp_path / "report.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def run():
        return subprocess.run(
            [sys.executable, SCRIPT, "--dataset", "synthetic", "--cpu",
             "--golden", golden, "--golden_images", "2", "--limit", "4",
             "--batch_size", "2", "--out", report],
            capture_output=True, text=True, timeout=900, env=env)

    r1 = run()
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert "captured" in r1.stdout
    assert os.path.exists(golden)

    r2 = run()
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "golden check" in r2.stdout and "OK" in r2.stdout

    rep = json.load(open(report))
    assert rep["golden"]["ok"] is True
    assert rep["golden"]["max_box_delta"] == 0.0
    assert "mAP" in rep
