"""Triple-model semantics: melt/pivot round-trip, the reference's
first-value + 'nl'-override rule (stream.ts:97-103), and CONSTRUCT
pattern joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
    construct,
    melt,
    pivot_records,
)


def test_melt_pivot_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "y", None)], "id long, name string, n int"
    )
    t = melt(df, "id", ["name", "n"])
    back = pivot_records(t, ["name", "n"])
    rows = {(r.subject, r.name, r.n) for r in back.collect()}
    assert rows == {("1", "x", "10"), ("2", "y", None)}


def test_pivot_language_override(spark):
    """An 'nl' literal wins over earlier values; otherwise the smallest
    value is kept deterministically."""
    t = spark.createDataFrame(
        [
            ("s1", "label", "english", "en"),
            ("s1", "label", "nederlands", "nl"),
            ("s2", "label", "zzz", None),
            ("s2", "label", "aaa", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = {(r.subject, r.label) for r in pivot_records(t, ["label"]).collect()}
    assert out == {("s1", "nederlands"), ("s2", "aaa")}


def test_construct_joins_on_shared_vars(spark):
    triples = spark.createDataFrame(
        [
            ("c1", "nation", "n1", None),
            ("c2", "nation", "n2", None),
            ("n1", "name", "BE", None),
            ("n2", "name", "NL", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = construct(
        triples,
        patterns=[("?c", "nation", "?n"), ("?n", "name", "?nm")],
    )
    assert {(r.c, r.nm) for r in out.collect()} == {("c1", "BE"), ("c2", "NL")}


def test_construct_constant_filter(spark):
    triples = spark.createDataFrame(
        [
            ("a", "type", "Person", None),
            ("b", "type", "Org", None),
            ("a", "name", "Ann", None),
            ("b", "name", "Acme", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = construct(
        triples, patterns=[("?s", "type", "Person"), ("?s", "name", "?n")]
    )
    assert [(r.s, r.n) for r in out.collect()] == [("a", "Ann")]
