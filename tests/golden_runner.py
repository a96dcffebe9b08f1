"""Render the golden scenes in one process (invoked by test_golden.py).

One process = one jit cache: every scene after the first reuses the
compiled raygen/bounce/accumulate/finalize programs (all goldens share
96x54 s4), cutting the golden tier's wall time roughly 3x.

Usage: python tests/golden_runner.py <out_root> <scene> [<scene> ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hanamaru_tpu.runtime.cli import main as cli_main


def main() -> int:
    out_root, scenes = sys.argv[1], sys.argv[2:]
    for scene in scenes:
        rc = cli_main([
            "-w", "96", "-h", "54", "-s", "4",
            "-t", "100000", "-i", "99999",
            "--platform", "cpu", "--scene", scene,
            "--out-dir", os.path.join(out_root, scene),
        ])
        if rc:
            return rc
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
