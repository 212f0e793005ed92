"""CSV/NDJSON source-sink (sources/text_formats.py): value-exact round
trips for catalog tables and hostile string content."""

from __future__ import annotations

from prefect_flow_arc_kg_postgres_etl_spark.sources import text_formats
from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _assert_equal(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_csv_round_trip_orders_with_dates_and_doubles(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_csv")
    text_formats.write_csv(orders, out)
    _assert_equal(text_formats.read_csv(spark, out, orders.schema), orders)


def test_ndjson_round_trip_events_with_timestamps(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_json")
    text_formats.write_ndjson(events, out)
    _assert_equal(
        text_formats.read_ndjson(spark, out, events.schema), events
    )


def test_csv_round_trip_hostile_strings_multiline_opt_in(spark, tmp_path):
    """Quoted embedded newlines need the multi_line opt-in (per-file
    parsing); everything else round-trips in the default splittable
    mode — both modes stay covered."""
    df = spark.createDataFrame(
        [
            (1, 'comma, separated'),
            (2, 'quote " inside'),
            (3, "newline \n inside"),
            (4, 'both ",\n" mixed'),
            (5, ""),
            (6, None),
        ],
        "id bigint, s string",
    )
    out = str(tmp_path / "hostile_csv")
    text_formats.write_csv(df, out)
    _assert_equal(
        text_formats.read_csv(spark, out, df.schema, multi_line=True), df
    )


def test_csv_round_trip_hostile_strings_default_splittable(spark, tmp_path):
    """The DEFAULT (line-splittable) mode round-trips every hostile
    case except embedded newlines — quotes, delimiters, empty-vs-null."""
    df = spark.createDataFrame(
        [
            (1, 'comma, separated'),
            (2, 'quote " inside'),
            (3, 'tab \t ok'),
            (4, ""),
            (5, None),
        ],
        "id bigint, s string",
    )
    out = str(tmp_path / "hostile_csv_splittable")
    text_formats.write_csv(df, out)
    _assert_equal(text_formats.read_csv(spark, out, df.schema), df)
