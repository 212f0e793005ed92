"""N-Triples source/sink (sources/rdf.py): escaping round trips, IRI
vs literal objects, language tags, grammar noise tolerance."""

from __future__ import annotations

from pyspark.sql import Row

from prefect_flow_arc_kg_postgres_etl_spark.sources import rdf

NASTY = [
    'plain text',
    'quote " inside',
    "backslash \\ inside",
    "newline \n inside",
    "tab \t and cr \r",
    "escaped-looking \\n literal backslash-n",
    'mix "\\" \n end',
    "",
    # control characters — the r4-ADVICE case: a U+0001 in-band sentinel
    # corrupted literals containing that byte; the sentinel-free
    # split/decode/join unescape must round-trip them exactly, also when
    # adjacent to real escape sequences.
    "ctl \x01 byte",
    "ctl pair \x01\x02 and backslash \\ after",
    "\x01\\n\x02 sentinel-adjacent escapes",
    "\\\x01\\\\n trailing trap \\\\",
]


def _quads(spark, objs, lang=None):
    return spark.createDataFrame(
        [(f"s{i}", "p", o, lang) for i, o in enumerate(objs)],
        "subject string, predicate string, object string, lang string",
    )


def test_escape_round_trip_identity(spark):
    """serialize -> parse must be the identity on any literal content,
    including sequences that look like escapes (the '\\\\n' case that
    breaks naive chained-replace unescaping)."""
    quads = _quads(spark, NASTY)
    back = rdf.parse_ntriples(rdf.to_ntriples(quads))
    got = {(r.subject, r.object) for r in back.collect()}
    want = {(f"s{i}", o) for i, o in enumerate(NASTY)}
    assert got == want


def test_language_tags_round_trip(spark):
    quads = _quads(spark, ["hallo wereld"], lang="nl")
    out = rdf.parse_ntriples(rdf.to_ntriples(quads)).first()
    assert (out.object, out.lang) == ("hallo wereld", "nl")
    # and untagged literals parse with NULL lang
    out2 = rdf.parse_ntriples(rdf.to_ntriples(_quads(spark, ["x"]))).first()
    assert out2.lang is None


def test_iri_objects_and_noise_lines(spark):
    lines = spark.createDataFrame(
        [
            Row(line="<urn:arc:s:a> <urn:arc:p:knows> <urn:arc:s:b> ."),
            Row(line="# a comment line"),
            Row(line=""),
            Row(line='<urn:arc:s:a> <urn:arc:p:name> "Alice"@en .'),
        ]
    )
    rows = {
        (r.subject, r.predicate, r.object, r.lang)
        for r in rdf.parse_ntriples(lines).collect()
    }
    assert rows == {
        ("a", "knows", "urn:arc:s:b", None),
        ("a", "name", "Alice", "en"),
    }


def test_write_read_files_round_trip(spark, tmp_path):
    quads = _quads(spark, NASTY[:4])
    rdf.write_ntriples(quads, str(tmp_path / "dump.nt"))
    back = rdf.read_ntriples(spark, str(tmp_path / "dump.nt"))
    assert back.count() == 4
    assert {r.object for r in back.collect()} == set(NASTY[:4])
