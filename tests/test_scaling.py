"""Weak-scaling proxy harness (scripts/scaling_dryrun.py): the GSPMD train
step runs at 1 and 2 virtual devices with fixed per-device batch and the
report is well-formed.  Assertion-light by design — CPU "devices" share one
host, so only structure (and sharding, asserted inside the script) is
checked, not timing."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_scaling_dryrun_report():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "scaling_dryrun.py"),
            "--devices=1,2",
            "--iters=2",
            "--size=64",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["metric"] == "weak_scaling_cpu_mesh_proxy"
    rows = report["rows"]
    assert [r["devices"] for r in rows] == [1, 2]
    assert [r["global_batch"] for r in rows] == [1, 2]
    for r in rows:
        assert r["step_ms"] > 0
        assert r["efficiency"] > 0
