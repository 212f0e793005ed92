"""Value-coercion rules (stream.ts:29-42, database.ts:121-144)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.functions.coercion import (
    bool_default_false,
    clamp_min_year,
    iso_duration_seconds,
    safe_timestamp,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "s,expected",
    [
        ("PT1H", 3600.0),
        ("PT90S", 90.0),
        ("P1D", 86400.0),
        ("P1DT2H3M4.5S", 86400 + 7200 + 180 + 4.5),
        ("P2W", 1209600.0),
        ("P1Y1M", 31536000.0 + 2592000.0),
        ("PT0.5S", 0.5),
        ("not a duration", None),
        ("P", None),
    ],
)
def test_iso_duration_seconds(spark, s, expected):
    got = _one(spark, iso_duration_seconds(F.lit(s)))
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


def test_safe_timestamp_invalid_is_null(spark):
    assert _one(spark, safe_timestamp(F.lit("1-URGENT"))) is None
    assert _one(spark, safe_timestamp(F.lit("2024-05-06 07:08:09"))) is not None


def test_bool_default_false(spark):
    assert _one(spark, bool_default_false(F.lit(None))) is False
    assert _one(spark, bool_default_false(F.lit(True))) is True


def test_clamp_min_year(spark):
    # compare as strings: Python datetime cannot hold year-1 instants
    # shifted through local time on collect
    t = F.to_timestamp(F.lit("0001-01-01 00:00:00"))
    got = _one(spark, clamp_min_year(t).cast("string"))
    assert got.startswith("0001-01-01")
    later = F.to_timestamp(F.lit("2020-06-01 12:00:00"))
    assert _one(spark, clamp_min_year(later).cast("string")).startswith("2020-06-01")
