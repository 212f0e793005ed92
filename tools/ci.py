"""Round gate: refuse to call a round done while anything is red.

Runs, in order, the three checks the driver snapshot grades on:

  1. ``pytest tests/ -q``               (unit + oracle + plan-audit suite)
  2. ``tools/check_oracle.py <sf_dir>`` (driver correctness-gate mirror)
  3. ``python bench.py``                (must exit 0 and print its JSON line)

Exit code is non-zero if ANY stage fails, so ``python tools/ci.py`` is
the one command to run before ending a round (VERDICT r3: a red suite
was committed because no final gate ran).

Usage: python tools/ci.py [sf_dir=/root/testdata/sf0.01] [--skip-bench]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    t0 = time.time()
    print(f"=== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    ok = proc.returncode == 0
    print(
        f"=== {label}: {'OK' if ok else f'FAILED (rc={proc.returncode})'} "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    py = sys.executable
    ok = run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    ok = run("oracle-gate", [py, "tools/check_oracle.py", sf_dir]) and ok
    if "--skip-bench" not in sys.argv:
        ok = run("bench", [py, "bench.py"]) and ok
    print(f"\nROUND GATE: {'GREEN' if ok else 'RED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
