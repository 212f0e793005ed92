"""Time individual registry queries with the bench methodology (noop
sink, one warmup pass, min-of-N timed passes) — the per-query probe for
optimization work (guide §1.4/§1.5).

Usage: python tools/time_query.py [sf_dir] [passes] query [query ...]
Prints one line per query: name, cold (first) pass, min of timed passes.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    passes = int(args.pop(0)) if args and args[0].isdigit() else 3

    from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
    from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark

    spark = get_spark("time-query")
    for name in args:
        builder = QUERIES[name].builder
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        best = None
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"{name}: warm {i}")
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None or el < best else best
        print(f"{name}: cold={cold:.3f}s warm_min={best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
