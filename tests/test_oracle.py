"""The driver's correctness gate, run locally: every oracle-backed
registry query must hash-match its DuckDB result at sf0.001 (fast tier;
tools/check_oracle.py runs the sf0.01 tier the driver uses)."""

from __future__ import annotations

import pytest

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE
from tools.check_oracle import norm_cell, table_hash

import duckdb

from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import TABLES


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_SMOKE)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert s_rows is not None  # rows-only contract: runs, stable schema
        return
    res = duck.sql(spec.oracle)
    d_cols = list(res.columns)
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} != {len(d_rows)}"
    assert sorted(s_cols) == sorted(d_cols)
    s_ord = [s_cols.index(c) for c in sorted(s_cols)]
    d_ord = [d_cols.index(c) for c in sorted(d_cols)]
    assert table_hash(s_rows, s_ord) == table_hash(d_rows, d_ord), "value hash"


def test_approx_distinct_within_rsd(spark):
    """HLL estimates land within 3x the configured rsd of exact."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.relational import (
        distinct_agg,
        distinct_agg_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r.l_returnflag: (r.n_parts, r.n_supps) for r in distinct_agg(spark, sf).collect()}
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_supps)
        for r in distinct_agg_approx(spark, sf).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) / e < 0.06, (k, e, a)
