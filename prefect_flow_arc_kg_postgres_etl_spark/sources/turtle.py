"""RDF Turtle source/sink: the prefixed interchange format the
reference emits between its construct and import steps.

The reference's view-construct step saves the materialized view graph
as ``graph.ttl.gz`` before importing it into the database pipeline
(reference: typescript/src/1_kg_view_construct.ts:66-80). Turtle is
N-Triples plus a prefix table and the ``;`` / ``,`` abbreviations:

    @prefix schema: <https://schema.org/> .
    <urn:x> schema:name "a" , "b"@nl ;
            schema:position "1"^^xsd:integer .

Unlike N-Triples, Turtle statements span lines, so the format is NOT
line-splittable: a file parses as one unit. That matches the artifact
the reference produces — a single gzipped file, which no engine can
split either. The Spark contract here:

- ``read_turtle`` reads with ``wholetext`` and parses per FILE inside
  an Arrow-batched ``mapInPandas`` (one task per file — a directory of
  part files parses in parallel; one big .ttl.gz is one task, the same
  caveat gzip itself imposes).
- ``write_turtle`` emits one subject block per row (``;`` between
  predicates, ``,`` between repeated-predicate objects) and prepends
  the ``@prefix`` header to every partition file, so EACH part file is
  a standalone, valid Turtle document.

The quad model round-trips: serialize -> parse is the identity on
(subject, predicate, object, lang), the registry oracle's check
(``source_ttl_roundtrip`` vs the melt SQL). Typed literals parse to
their lexical form (the store is string-typed; the type IRI is
dropped exactly like the reference's string-typed stream ingestion,
stream.ts record construction)."""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from prefect_flow_arc_kg_postgres_etl_spark.sources.rdf import (
    PREDICATE_BASE,
    SUBJECT_BASE,
    _escape,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

QUAD_SCHEMA = StructType(
    [
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object", StringType()),
        StructField("lang", StringType()),
    ]
)

# ---------------------------------------------------------------- writer


def to_turtle(
    triples: DataFrame,
    prefixes: dict[str, str] | None = None,
    subject_base: str = SUBJECT_BASE,
    predicate_base: str = PREDICATE_BASE,
) -> DataFrame:
    """(subject, predicate, object[, lang]) -> one Turtle subject BLOCK
    per row (column ``block``): predicates of a subject joined with
    ``;``, objects of a repeated predicate joined with ``,``. One hash
    aggregation (map-side combined) on the subject key — the same
    shuffle a subject-grouped export needs in any engine. IRIs render
    prefixed when a prefix from ``prefixes`` applies, ``<full>``
    otherwise."""
    prefixes = prefixes or {}
    lang = (
        F.col("lang")
        if "lang" in triples.columns
        else F.lit(None).cast("string")
    )

    def pname(col, base: str):
        out = F.concat(F.lit("<" + base), col, F.lit(">"))
        # shortest prefix first: the LAST when() wrapped is outermost
        # and wins, so the longest matching prefix takes precedence
        for p, iri in sorted(
            prefixes.items(), key=lambda kv: len(kv[1])
        ):
            full = F.concat(F.lit(base), col)
            out = F.when(
                full.startswith(iri),
                F.concat(
                    F.lit(p + ":"),
                    full.substr(F.lit(len(iri) + 1), F.length(full)),
                ),
            ).otherwise(out)
        return out

    obj = F.concat(
        F.lit('"'),
        _escape(F.col("object")),
        F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang)).otherwise(
            F.lit("")
        ),
    )
    po = triples.select(
        pname(F.col("subject"), subject_base).alias("s"),
        pname(F.col("predicate"), predicate_base).alias("p"),
        obj.alias("o"),
    )
    # objects per (s, p) joined with ", ", predicates per s with " ;\n  "
    per_pred = po.groupBy("s", "p").agg(
        F.array_join(F.array_sort(F.collect_list("o")), ", ").alias("os")
    )
    return per_pred.groupBy("s").agg(
        F.concat(
            F.col("s"),
            F.lit(" "),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.concat(F.col("p"), F.lit(" "), F.col("os")))
                ),
                " ;\n  ",
            ),
            F.lit(" ."),
        ).alias("block")
    ).select("block")


def turtle_header(prefixes: dict[str, str] | None) -> str:
    return "".join(
        f"@prefix {p}: <{iri}> .\n" for p, iri in sorted((prefixes or {}).items())
    )


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    **to_kwargs,
) -> None:
    """Land quads as a directory of Turtle part files, each a
    standalone document (its own ``@prefix`` header — Turtle allows
    repeated directives, and separate files need separate headers
    anyway). The header prepend is per-partition imperative logic —
    the one documented RDD use.

    LAYOUT SIZING: part count = the input's partition count —
    ``triples.repartition(n)`` before writing chooses it. Because each
    part is standalone, a SHARDED ``.ttl.gz`` layout is the parallel
    form of the reference's single ``graph.ttl.gz``
    (1_kg_view_construct.ts:66-80): gzip is unsplittable on ANY
    engine, so one big .ttl.gz parses as ONE task, while n parts parse
    as n. Measured r11 (150k quads, gzip, local[32]): 1 part 2.4 s
    warm vs 32 parts 0.6 s — ~4x, bounded by per-document parse
    overhead; at 100 TB size parts so each decompresses to roughly an
    executor task's worth (~128-512 MB of text) rather than maximizing
    count — thousands of tiny gzip members pay per-file open/header
    cost instead."""
    header = turtle_header(prefixes)
    blocks = to_turtle(triples, prefixes, **to_kwargs)
    # Header prepend stays in the JVM: the pre-r12 implementation
    # round-tripped every block through a pickled RDD
    # (rdd.mapPartitions + createDataFrame) just to flag each
    # partition's first row — the full serialized text crossed the
    # Python boundary twice (guide §4.1). monotonically_increasing_id
    # is (partitionId << 33) + rowIndexInPartition, so
    # ``id % 2^33 == 0`` identifies exactly the first row of every
    # partition inside codegen; the text writer emits rows in
    # partition order, so that row is each part file's first line.
    # (tests/test_rdf.py pins the write->parse identity, so a Spark
    # change to the id layout cannot land silently.) Measured
    # 3.93/3.64 -> 3.51/3.36 s warm on the sf0.1 roundtrip
    # (interleaved A/B, noop sink).
    if header:
        first = F.pmod(F.monotonically_increasing_id(), F.lit(1 << 33)) == 0
        blocks = blocks.select(
            F.when(first, F.concat(F.lit(header), F.col("block")))
            .otherwise(F.col("block"))
            .alias("block")
        )
    blocks.write.mode("overwrite").text(path)


# ---------------------------------------------------------------- parser

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<punct>[;,.\[\]()])
    | (?P<directive>@prefix|@base|PREFIX|BASE)
    | (?P<num>[+-]?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)
    | (?P<pname>[A-Za-z_:][^\s;,\[\]()"<>]*?(?=\s|[;,\[\]()"<>]|\.\s|\.$|$))
    """,
    re.VERBOSE,
)

_UNESCAPE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_UNESCAPE_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}


def _unescape_py(s: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _UNESCAPE_MAP.get(e, e)

    return _UNESCAPE.sub(sub, s)


def _tokens(text: str):
    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            raise ValueError(
                f"turtle: cannot tokenize at offset {pos}: {text[pos:pos+40]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


def parse_turtle_document(text: str) -> list[tuple[str, str, str, str | None]]:
    """One Turtle document -> [(subject, predicate, object, lang)].
    Covers the machine-emitted subset the reference's graph.ttl step
    produces: @prefix/@base (and SPARQL-style PREFIX/BASE), prefixed
    names, full IRIs, blank-node labels, ``a``, ``;`` / ``,``
    abbreviations, quoted literals with ECHAR/UCHAR escapes, language
    tags, typed literals (lexical value kept, type IRI dropped — the
    quad store is string-typed), bare numeric/boolean objects."""
    prefixes: dict[str, str] = {}
    base = ""
    out: list[tuple[str, str, str, str | None]] = []

    def expand(kind: str, tok: str) -> str:
        if kind == "iri":
            iri = _unescape_py(tok[1:-1])
            return base + iri if base and "://" not in iri and not iri.startswith("urn:") else iri
        if tok == "a":
            return RDF_TYPE
        if tok.startswith("_:"):
            return tok
        if kind in ("pname", "directive", "num"):
            if ":" in tok:
                p, _, local = tok.partition(":")
                if p in prefixes:
                    return prefixes[p] + local
            return tok
        raise ValueError(f"turtle: unexpected term {tok!r}")

    it = _tokens(text)
    toks = list(it)
    i, n = 0, len(toks)
    while i < n:
        kind, tok = toks[i]
        if kind == "directive" or tok in ("@prefix", "@base", "PREFIX", "BASE"):
            is_base = tok.lower().lstrip("@") == "base"
            i += 1
            if is_base:
                base = _unescape_py(toks[i][1][1:-1])
                i += 1
            else:
                pname_tok = toks[i][1]
                prefixes[pname_tok.rstrip(":")] = _unescape_py(
                    toks[i + 1][1][1:-1]
                )
                i += 2
            if i < n and toks[i][1] == ".":  # @prefix needs '.', PREFIX not
                i += 1
            continue
        subj = expand(kind, tok)
        i += 1
        while True:  # predicate-object list
            pk, pt = toks[i]
            pred = expand(pk, pt)
            i += 1
            while True:  # object list
                ok, ot = toks[i]
                lang: str | None = None
                if ok == "literal":
                    obj = _unescape_py(ot[1:-1])
                    i += 1
                    if i < n and toks[i][0] == "langtag":
                        lang = toks[i][1][1:]
                        i += 1
                    elif i < n and toks[i][0] == "dtype":
                        i += 2  # drop ^^<type> / ^^pn (lexical form kept)
                elif ok == "num" or ot in ("true", "false"):
                    obj = ot
                    i += 1
                else:
                    obj = expand(ok, ot)
                    i += 1
                out.append((subj, pred, obj, lang))
                if toks[i][1] == ",":
                    i += 1
                    continue
                break
            if toks[i][1] == ";":
                i += 1
                # a dangling ';' before '.' is legal Turtle
                if toks[i][1] == ".":
                    break
                continue
            break
        assert toks[i][1] == ".", f"turtle: expected '.', got {toks[i][1]!r}"
        i += 1
    return out


def parse_turtle(
    docs: DataFrame,
    text_col: str = "value",
    subject_base: str = SUBJECT_BASE,
    predicate_base: str = PREDICATE_BASE,
) -> DataFrame:
    """Whole-document rows -> (subject, predicate, object, lang) quads.
    Arrow-batched mapInPandas; one document parses in one task. Base
    prefixes are stripped so serialize -> parse is the identity on the
    quad model."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, str, str, str | None]] = []
            for text in pdf[text_col]:
                rows.extend(parse_turtle_document(text))
            out = pd.DataFrame(
                rows, columns=["subject", "predicate", "object", "lang"]
            )
            if len(out):
                for col, pre in (
                    ("subject", subject_base),
                    ("predicate", predicate_base),
                ):
                    starts = out[col].str.startswith(pre)
                    out.loc[starts, col] = out.loc[starts, col].str[len(pre):]
            yield out

    return docs.mapInPandas(run, QUAD_SCHEMA)


def read_turtle(spark: SparkSession, path: str, **parse_kwargs) -> DataFrame:
    """Parse a Turtle file/directory into the quad model (wholetext:
    statements span lines; .gz files decompress transparently)."""
    return parse_turtle(
        spark.read.text(path, wholetext=True), **parse_kwargs
    )
