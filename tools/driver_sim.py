"""Driver simulation: run registry entries on a PLAIN SparkSession.

The correctness driver runs `queries()` on ITS OWN session — none of
session.py's tuned configs (16 GB driver memory, raised codegen cache,
AQE partition seeding) apply. r8 lesson: every harness-side check ran
green at 16 GB while the heavy verbatim queries OOM'd a default-sized
(1 GB) JVM on task-binary accumulation — invisible until executed
under the driver's conditions. This tool IS those conditions: default
memory, local[N], no tuning; it executes (row-counts, no oracle —
tools/check_oracle.py grades values) every DRIVER_WINDOW entry, or the
names given.

Usage: python tools/driver_sim.py [sf_dir] [cores] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    cores = int(args.pop(0)) if args and args[0].isdigit() else 8

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(f"local[{cores}]").getOrCreate()

    from prefect_flow_arc_kg_postgres_etl_spark.plans import registry

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args or registry.DRIVER_WINDOW
    failed = []
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"OK   {name}: {n} rows ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"ERR  {name}: {str(ex)[:300]}", flush=True)
    print(f"\n{len(names) - len(failed)} ok, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
