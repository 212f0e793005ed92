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

import json
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


# Suite shards for the parallel gate (no pytest-xdist in the image, so
# file-level sharding with one subprocess + one Spark JVM each).
# Groupings balance measured wall time: the oracle sweep is its own
# shard (the longest), plan-audit + streaming together, the store/merge
# family, and the rest. Files created later fall into shard 3 via the
# catch-all so a new test file cannot silently drop out of the gate.
_SHARDS: list[list[str]] = [
    ["tests/test_oracle.py"],
    ["tests/test_plan_audit.py", "tests/test_streaming.py"],
    [
        "tests/test_flows.py",
        "tests/test_sinks.py",
        "tests/test_merge.py",
        "tests/test_merge_properties.py",
        "tests/test_catalog_drift.py",
    ],
    # the SPARQL compiler suites (incl. Hypothesis differential runs)
    # grew past the rest-shard budget in r7 — their own shard keeps
    # the gate's critical path near the oracle sweep's
    ["tests/test_sparql.py", "tests/test_sparql_properties.py"],
]


def run_pytest_sharded(py: str) -> bool:
    import glob
    import tempfile

    named = {f for shard in _SHARDS for f in shard}
    rest = sorted(
        f for f in glob.glob("tests/test_*.py") if f not in named
    )
    shards = _SHARDS + [rest]
    t0 = time.time()
    print(f"=== pytest: {len(shards)} parallel shards", flush=True)
    procs = []
    for i, files in enumerate(shards):
        env = dict(os.environ)
        env["SPARK_DRIVER_MEMORY"] = env.get("SPARK_DRIVER_MEMORY", "8g")
        env["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(prefix=f"ci_wh{i}_")
        procs.append(
            (
                i,
                files,
                subprocess.Popen(
                    [py, "-m", "pytest", *files, "-q"],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )
    ok = True
    for i, files, proc in procs:
        out, _ = proc.communicate()
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        print(f"  shard {i} ({len(files)} files): rc={proc.returncode} {tail}")
        if proc.returncode != 0:
            print("\n".join(out.strip().splitlines()[-40:]))
            ok = False
    print(
        f"=== pytest: {'OK' if ok else 'FAILED'} ({time.time() - t0:.0f}s)",
        flush=True,
    )
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    py = sys.executable
    if "--serial" in sys.argv:
        ok = run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    else:
        ok = run_pytest_sharded(py)
    ok = run("oracle-gate", [py, "tools/check_oracle.py", sf_dir]) and ok
    if "--skip-bench" not in sys.argv:
        t0 = time.time()
        print("=== bench: python bench.py", flush=True)
        proc = subprocess.run(
            [py, "bench.py"], cwd=REPO, capture_output=True, text=True
        )
        bench_ok = proc.returncode == 0
        print(proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "")
        if not bench_ok and proc.stderr:
            # Surface the failure diagnostics (the traceback goes to
            # stderr; swallowing it would force a manual bench re-run
            # just to see why the gate went red).
            print("\n".join(proc.stderr.strip().splitlines()[-30:]))
        print(
            f"=== bench: {'OK' if bench_ok else f'FAILED (rc={proc.returncode})'} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        ok = bench_ok and ok
        # Bench contract (SURVEY §6): warn — don't fail — when the stable
        # 20-query prefix at sf0.1 exceeds the 12 s quiet-host budget
        # (9.3 s measured + 30% headroom). Contention shows in loadavg.
        if bench_ok:
            try:
                parsed = json.loads(proc.stdout.strip().splitlines()[-1])
                prefix = parsed.get("prefix20_sec")
                if (
                    parsed.get("sf") == 0.1
                    and prefix is not None
                    and prefix > 12.0
                ):
                    print(
                        f"WARNING: prefix20_sec={prefix} exceeds the 12 s "
                        f"quiet-host budget (loadavg "
                        f"{parsed.get('loadavg_start')}->"
                        f"{parsed.get('loadavg_end')}) — see SURVEY §6 "
                        f"bench contract",
                        flush=True,
                    )
            except (json.JSONDecodeError, IndexError):
                pass
    print(f"\nROUND GATE: {'GREEN' if ok else 'RED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
