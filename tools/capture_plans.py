"""Capture ``.explain("formatted")`` for headline queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
artifact (guide §1: record the plan shape before and after each change).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  e.g. python tools/capture_plans.py r12 before kg_construct_real_query_issues
With no query names, captures every bench.py HEADLINE query.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    from bench import HEADLINE
    from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
    from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark

    if not names:
        names = HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exchange = text.count("Exchange")
        n_scan = text.count("Scan parquet")
        print(
            f"{name}: {n_exchange} Exchange, {n_scan} parquet scans -> {path}",
            flush=True,
        )


if __name__ == "__main__":
    main()
