"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares with the
``oracle_sql()`` DuckDB result: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, every value
stringified, rows sorted, md5). Catches name/type/value drift before the
driver does.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark
from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import TABLES


def norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def table_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.sql(spec.oracle)
            d_cols = list(res.columns)
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            s_ord = [s_cols.index(c) for c in sorted(s_cols)]
            d_ord = [d_cols.index(c) for c in sorted(d_cols)]
            hs, hd = table_hash(s_rows, s_ord), table_hash(d_rows, d_ord)
            if hs != hd:
                problems.append("value-hash mismatch")
                s_set = {tuple(norm_cell(r[i]) for i in s_ord) for r in s_rows}
                d_set = {tuple(norm_cell(r[i]) for i in d_ord) for r in d_rows}
                s_only = list(s_set - d_set)[:3]
                d_only = list(d_set - s_set)[:3]
                problems.append(f"spark-only={s_only} duck-only={d_only}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
