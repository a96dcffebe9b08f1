"""Golden-image comparison vs the reference's committed competition output
(rtcamp6_1000x4spp.png).  Opt-in: a converged render takes minutes, so the
check runs only when RUN_GOLDEN=1 (see tools/compare_golden.py for the
standalone tool).

Recorded result (2026-08-17, 12 passes @ 192x108 on CPU):
  luminance_corr=0.906, mean_abs_err=0.036, rmse=0.065
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_GOLDEN") != "1",
    reason="set RUN_GOLDEN=1 to run the multi-minute golden comparison",
)


def test_rtcamp6_matches_reference_structure(tmp_path):
    out = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [
            sys.executable, "-m", "hanamaru_tpu",
            "-w", "192", "-h", "108", "-s", "12", "-t", "100000", "-i", "99999",
            "--platform", "cpu", "--out-dir", str(out),
        ],
        cwd=repo, check=True, timeout=1800,
    )
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "compare_golden.py"),
            str(out / "result.png"), "--scale", "10",
        ],
        capture_output=True, text=True, check=True, timeout=120,
    )
    stats = json.loads(r.stdout)
    assert stats["luminance_corr"] > 0.85, stats
    assert stats["mean_abs_err"] < 0.06, stats
