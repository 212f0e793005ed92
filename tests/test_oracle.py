"""The driver's correctness gate, run locally: every oracle-backed
registry query must hash-match its DuckDB result at sf0.001 (fast tier;
tools/check_oracle.py runs the sf0.01 tier the driver uses)."""

from __future__ import annotations

import pytest

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE
from tools.check_oracle import _reject_unhashable, compare

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
    s_pd = spec.builder(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        # rows-only contract: runs, stable schema, and STILL no
        # list-typed cells (the driver's canonicalizer must not err).
        assert _reject_unhashable(s_pd, "spark") is None
        return
    d_pd = duck.sql(spec.oracle).df()
    assert compare(s_pd, d_pd) == []


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
