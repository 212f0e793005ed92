"""RDF N-Triples source/sink: serialize the quad model to N-Triples
lines and parse N-Triples text back into quads.

The reference's store is RDF: its SPARQL CONSTRUCT queries emit triple
streams that stream.ts consumes record-by-record (reference:
typescript/src/stream.ts triple ingestion; queries/*.sparql CONSTRUCT
output). N-Triples is the line-oriented interchange form of that data
— one triple per line, ``<s> <p> <o|"literal"@lang> .`` — which makes
it the natural bulk format for a Spark engine: a text file of
N-Triples lines is splittable, so a 100 TB dump parses with ordinary
partition parallelism, entirely in JVM string expressions (no UDF, no
shuffle; both directions fuse with the scan).

Escaping follows the N-Triples grammar's ECHAR set for the characters
the testdata can contain: ``\\ \" \n \r \t``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUBJECT_BASE = "urn:arc:s:"
PREDICATE_BASE = "urn:arc:p:"

def _escape(col: Column) -> Column:
    """Literal-escape: backslash FIRST (so later escapes aren't
    double-escaped), then quote and control characters."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _unescape(col: Column) -> Column:
    """Inverse of ``_escape``. Chained replaces alone mis-parse
    sequences like ``\\\\n`` (an escaped backslash followed by a
    literal n), and any in-band sentinel character can collide with
    literal content (a U+0001 sentinel corrupted literals containing
    that byte — r4 ADVICE). Sentinel-free instead: SPLIT on the
    escaped-backslash pair (the pieces then contain only single-char
    escapes, decoded unambiguously) and ARRAY_JOIN the decoded pieces
    back with a real backslash. Still pure scan-side expressions."""
    pieces = F.split(col, r"\\\\", -1)  # regex for the literal pair \\
    decode = lambda p: F.replace(
        F.replace(
            F.replace(
                F.replace(p, F.lit('\\"'), F.lit('"')),
                F.lit("\\n"),
                F.lit("\n"),
            ),
            F.lit("\\r"),
            F.lit("\r"),
        ),
        F.lit("\\t"),
        F.lit("\t"),
    )
    return F.array_join(F.transform(pieces, decode), "\\")


def to_ntriples(
    triples: DataFrame,
    subject_base: str = SUBJECT_BASE,
    predicate_base: str = PREDICATE_BASE,
) -> DataFrame:
    """(subject, predicate, object[, lang]) quads -> one N-Triples line
    per row (column ``line``). Objects render as literals with an
    optional language tag (the reference's preferred-language pivot
    reads them back — stream.ts:51-116). Pure projection."""
    lang = (
        F.col("lang")
        if "lang" in triples.columns
        else F.lit(None).cast("string")
    )
    line = F.concat(
        F.lit("<" + subject_base),
        F.col("subject"),
        F.lit("> <" + predicate_base),
        F.col("predicate"),
        F.lit('> "'),
        _escape(F.col("object")),
        F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang)).otherwise(
            F.lit("")
        ),
        F.lit(" ."),
    )
    return triples.select(line.alias("line"))


def parse_ntriples(
    lines: DataFrame,
    line_col: str = "line",
    subject_base: str = SUBJECT_BASE,
    predicate_base: str = PREDICATE_BASE,
) -> DataFrame:
    """N-Triples lines -> (subject, predicate, object, lang) quads.

    Handles literal objects (with optional ``@lang``) and IRI objects
    (``object`` then carries the IRI, ``lang`` NULL). Comment and blank
    lines are dropped, as the grammar allows. Base prefixes are
    stripped so a serialize->parse round trip is the identity on the
    quad model — that equality is the oracle for the registry entry.
    All regexp/replace expressions run scan-side in codegen."""
    c = F.col(line_col)
    spo = r"^\s*<([^>]*)>\s+<([^>]*)>\s+(.*?)\s*\.\s*$"
    subject = F.regexp_extract(c, spo, 1)
    predicate = F.regexp_extract(c, spo, 2)
    obj_term = F.regexp_extract(c, spo, 3)
    lit = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*))?$'
    is_literal = obj_term.rlike(lit)
    obj = F.when(is_literal, _unescape(F.regexp_extract(obj_term, lit, 1))).otherwise(
        F.regexp_extract(obj_term, r"^<([^>]*)>$", 1)
    )
    lang = F.when(
        is_literal & (F.regexp_extract(obj_term, lit, 2) != ""),
        F.regexp_extract(obj_term, lit, 2),
    )
    strip = lambda col, base: F.when(
        col.startswith(base), col.substr(F.lit(len(base) + 1), F.length(col))
    ).otherwise(col)
    return (
        lines.filter(c.rlike(spo))
        .select(
            strip(subject, subject_base).alias("subject"),
            strip(predicate, predicate_base).alias("predicate"),
            obj.alias("object"),
            lang.alias("lang"),
        )
    )


def write_ntriples(triples: DataFrame, path: str, **to_kwargs) -> None:
    """Land quads as splittable N-Triples text files."""
    to_ntriples(triples, **to_kwargs).write.mode("overwrite").text(path)


def read_ntriples(spark, path: str, **parse_kwargs) -> DataFrame:
    """Parse an N-Triples dump directory/file into the quad model."""
    return parse_ntriples(
        spark.read.text(path).withColumnRenamed("value", "line"),
        **parse_kwargs,
    )
