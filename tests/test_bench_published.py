"""Every bench log (round >= 5) must be published in BENCH.jsonl or cited
in BENCH.md — the mechanical publish-everything rule (VERDICT r4 next #3)."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_bench_logs_published():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "check_bench_published.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
