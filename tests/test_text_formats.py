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


def test_csv_corrupt_records_are_isolated_not_fatal(spark, tmp_path):
    """Production ingest robustness: a malformed line must neither
    kill the read (FAILFAST) nor silently corrupt neighbors —
    PERMISSIVE mode yields the well-formed rows intact and surfaces
    the broken line in the corrupt-record column for quarantine."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "1,alice,10.5\n"
        "not,enough\n"          # wrong arity
        "2,bob,oops\n"          # bad double
        "3,carol,30.25\n"
    )
    schema = (
        "id bigint, name string, amount double, _corrupt_record string"
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    good = df.filter("_corrupt_record IS NULL").collect()
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    assert {(r.id, r.name, r.amount) for r in good} == {
        (1, "alice", 10.5),
        (3, "carol", 30.25),
    }
    assert len(bad) == 2
    assert {r._corrupt_record for r in bad} == {"not,enough", "2,bob,oops"}
    df.unpersist()


# ------------------------------------------------ ALTO XML (operators/alto)
def test_alto_synth_extract_round_trip(spark):
    """Synthesized ALTO parses back to the exact source text with
    word order preserved across TextLine boundaries, and the
    confidence mass matches the closed form."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.operators import alto

    rows = [
        (1, "aa bbb c dddd ee fff gg hhhh iiii j"),  # 10 words, 2 lines
        (2, "solo"),
        (3, " ".join(f"w{i}" for i in range(17))),  # 17 words, 3 lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = alto.extract_transcript(
        df.select(
            "doc_id",
            "text",
            alto.synth_alto_xml(
                F.col("text"), F.concat(F.lit("P"), F.col("doc_id"))
            ).alias("alto_xml"),
        )
    ).collect()
    by_id = {r.doc_id: r for r in out}
    for doc_id, text in rows:
        r = by_id[doc_id]
        assert r.transcript == text
        words = text.split(" ")
        assert r.n_words == len(words)
        assert r.n_lines == (len(words) + 7) // 8
        assert r.sum_wc_e2 == sum(len(w) % 10 for w in words)
        assert r.page_id == f"P{doc_id}"


def test_alto_extract_on_handwritten_nested_xml(spark):
    """The extractor is schema-driven, not synthesis-driven: a
    hand-written ALTO with multiple TextBlocks and attribute order
    variations parses identically."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators import alto

    xml = (
        '<alto><Layout><Page ID="pg9">'
        '<TextBlock><TextLine><String WC="0.03" CONTENT="hello"/>'
        '<String CONTENT="old" WC="0.09"/></TextLine></TextBlock>'
        '<TextBlock><TextLine><String CONTENT="world" WC="0.05"/>'
        "</TextLine></TextBlock>"
        "</Page></Layout></alto>"
    )
    df = spark.createDataFrame([(1, xml)], "doc_id long, alto_xml string")
    r = alto.extract_transcript(df).collect()[0]
    assert r.transcript == "hello old world"
    assert r.page_id == "pg9"
    assert (r.n_words, r.n_lines) == (3, 2)
    assert r.sum_wc_e2 == 3 + 9 + 5


def test_alto_extract_namespaced_payloads(spark):
    """Real ALTO carries the loc.gov namespace — as the default
    namespace or with an explicit element prefix; both must parse."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators import alto

    ns = "http://www.loc.gov/standards/alto/ns-v2#"
    default_ns = (
        f'<alto xmlns="{ns}"><Layout><Page ID="p1"><TextBlock>'
        '<TextLine><String CONTENT="hoi" WC="0.03"/>'
        '<String CONTENT="daar" WC="0.04"/></TextLine>'
        "</TextBlock></Page></Layout></alto>"
    )
    prefixed = (
        f'<a:alto xmlns:a="{ns}"><a:Layout><a:Page ID="p1">'
        '<a:TextBlock><a:TextLine><a:String CONTENT="hoi" WC="0.03"/>'
        '<a:String CONTENT="daar" WC="0.04"/></a:TextLine>'
        "</a:TextBlock></a:Page></a:Layout></a:alto>"
    )
    df = spark.createDataFrame(
        [(1, default_ns), (2, prefixed)], "doc_id long, alto_xml string"
    )
    rows = {r.doc_id: r for r in alto.extract_transcript(df).collect()}
    for doc_id in (1, 2):
        r = rows[doc_id]
        assert (r.page_id, r.transcript) == ("p1", "hoi daar")
        assert (r.n_words, r.n_lines, r.sum_wc_e2) == (2, 1, 7)
