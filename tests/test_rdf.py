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


# ----------------------------------------------------------- Turtle (r10)

from prefect_flow_arc_kg_postgres_etl_spark.sources import turtle  # noqa: E402


def test_turtle_escape_round_trip_identity(spark, tmp_path):
    """write_turtle -> read_turtle is the identity on any literal
    content (the same NASTY set the N-Triples path pins), through the
    subject-grouped ';'/',' block form with per-file @prefix headers."""
    quads = _quads(spark, NASTY)
    out = str(tmp_path / "g")
    turtle.write_turtle(
        quads, out, prefixes={"s": rdf.SUBJECT_BASE, "p": rdf.PREDICATE_BASE}
    )
    back = turtle.read_turtle(spark, out)
    got = {(r.subject, r.object) for r in back.collect()}
    want = {(f"s{i}", o) for i, o in enumerate(NASTY)}
    assert got == want


def test_turtle_language_tags_and_grouping(spark, tmp_path):
    """Repeated predicates serialize with ',' and multiple predicates
    with ';' — one block per subject — and language tags survive."""
    quads = spark.createDataFrame(
        [
            ("s1", "name", "hallo", "nl"),
            ("s1", "name", "hello", "en"),
            ("s1", "kind", "greeting", None),
            ("s2", "kind", "farewell", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    blocks = [r.block for r in turtle.to_turtle(quads).collect()]
    assert len(blocks) == 2
    s1 = next(b for b in blocks if "s1" in b)
    assert '"hallo"@nl' in s1 and '"hello"@en' in s1
    assert s1.count(";") == 1 and s1.count(",") == 1
    out = str(tmp_path / "g")
    turtle.write_turtle(quads, out)
    back = turtle.read_turtle(spark, out)
    got = {(r.subject, r.predicate, r.object, r.lang) for r in back.collect()}
    assert got == {
        ("s1", "name", "hallo", "nl"),
        ("s1", "name", "hello", "en"),
        ("s1", "kind", "greeting", None),
        ("s2", "kind", "farewell", None),
    }


def test_turtle_parses_foreign_document():
    """The parser covers the machine-emitted subset a TriplyDB-style
    exporter produces (1_kg_view_construct.ts:66-80): prefixed names,
    'a', typed literals (lexical form kept), bare numbers/booleans,
    blank nodes, comments, dangling ';'."""
    doc = """@prefix schema: <https://schema.org/> .
@prefix ex: <urn:ex:> .
# header comment
ex:e1 a schema:CreativeWork ;
  schema:name "Krant"@nl , "Journal"@fr ;
  schema:position "2"^^<http://www.w3.org/2001/XMLSchema#integer> ;
  schema:ratio 0.5 ;
  schema:ok true ;
  .
_:b0 ex:rel ex:e1 .
"""
    got = set(turtle.parse_turtle_document(doc))
    assert got == {
        ("urn:ex:e1", turtle.RDF_TYPE, "https://schema.org/CreativeWork", None),
        ("urn:ex:e1", "https://schema.org/name", "Krant", "nl"),
        ("urn:ex:e1", "https://schema.org/name", "Journal", "fr"),
        ("urn:ex:e1", "https://schema.org/position", "2", None),
        ("urn:ex:e1", "https://schema.org/ratio", "0.5", None),
        ("urn:ex:e1", "https://schema.org/ok", "true", None),
        ("_:b0", "urn:ex:rel", "urn:ex:e1", None),
    }


def test_turtle_each_part_file_standalone(spark, tmp_path):
    """Every written part file is a complete Turtle document (its own
    @prefix header), so a directory listing is embarrassingly
    parallel and any single file survives being handed to another
    tool."""
    import glob

    quads = _quads(spark, [f"v{i}" for i in range(20)]).repartition(4)
    out = str(tmp_path / "g")
    turtle.write_turtle(
        quads, out, prefixes={"s": rdf.SUBJECT_BASE, "p": rdf.PREDICATE_BASE}
    )
    parts = [p for p in glob.glob(out + "/part-*") if not p.endswith(".crc")]
    total = []
    for p in parts:
        with open(p) as f:
            text = f.read()
        if text.strip():
            assert text.startswith("@prefix"), p
            total.extend(turtle.parse_turtle_document(text))
    assert len(total) == 20
