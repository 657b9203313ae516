"""The README/PERF fps headline must equal the newest BENCH_r*.json.

Rounds 2 and 3 both shipped a stale hand-typed headline; this test makes
drift a CI failure.  Regenerate with ``make readme``.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_headline_matches_newest_bench():
    rc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "gen_readme.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
