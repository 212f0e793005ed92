"""Semantics tests for the round-5 analytics additions that are not
fully captured by the SQL-oracle harness: the approx-quantile sketch
tier's error bound, and CDC diff classification invariants."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES


def test_approx_quantiles_within_rank_window(spark):
    """The sketch guarantee is on RANK, not value: approx_percentile
    returns an actual sample whose rank is within the accuracy bound,
    so in a heavy tail its VALUE may sit a whole order statistic away
    from the interpolated exact quantile. Assert each approx value
    falls between the exact quantiles at q +/- 0.05 — a generous rank
    window the sketch must beat at any data size."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    approx = {
        r.event_type: r
        for r in QUERIES["events_quantiles_approx"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.expr(f"percentile(value, {q})").alias(f"b{i}")
                for i, q in enumerate(
                    [0.45, 0.55, 0.85, 0.95, 0.94, 1.0]
                )
            ]
        )
        .collect()
    }
    assert approx.keys() == bounds.keys()
    for et, a in approx.items():
        b = bounds[et]
        assert b.b0 <= a.p50 <= b.b1, (et, "p50", a.p50, b.b0, b.b1)
        assert b.b2 <= a.p90 <= b.b3, (et, "p90", a.p90, b.b2, b.b3)
        assert b.b4 <= a.p99 <= b.b5, (et, "p99", a.p99, b.b4, b.b5)


def test_table_diff_cdc_classification_counts(spark):
    """The planted mutation recipe fixes the class structure: every
    11th key appears as 'added' (+10M echo), every 13th as 'removed',
    and 'changed' keys are exactly the re-priced (%7) keys that were
    not also removed. No key may appear twice."""
    rows = QUERIES["table_diff_cdc"].builder(spark, SF_SMOKE).collect()
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))
    by = {}
    for r in rows:
        by.setdefault(r.change, set()).add(r.o_orderkey)
    assert all(k >= 10_000_000 and (k - 10_000_000) % 11 == 0 for k in by["added"])
    assert all(k % 13 == 0 for k in by["removed"])
    assert all(k % 7 == 0 and k % 13 != 0 for k in by["changed"])
