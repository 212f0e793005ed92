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
array (no Python), extraction is the JVM-side Hive ``xpath`` family
(``F.xpath`` / ``F.xpath_string``), so a 100 TB ALTO corpus parses
scan-side with zero Python workers and no shuffle at all until the
caller aggregates. Confidence mass is summed in exact integer e2 units
(WC attributes carry 2 decimals; ``0.07`` -> 7) — float summation
order can never drift the result.
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
    strs = F.transform(
        words,
        lambda w: F.format_string(
            '<String CONTENT="%s" WC="0.0%d"/>',
            w,
            (F.length(w) % 10).cast("int"),
        ),
    )
    n_lines = F.ceil(F.size(words) / F.lit(WORDS_PER_LINE)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.lit("<TextLine>"),
            F.array_join(
                F.slice(strs, i * WORDS_PER_LINE + 1, WORDS_PER_LINE), ""
            ),
            F.lit("</TextLine>"),
        ),
    )
    return F.concat(
        F.lit('<alto><Layout><Page ID="'),
        page_id,
        F.lit('"><TextBlock>'),
        F.array_join(lines, ""),
        F.lit("</TextBlock></Page></Layout></alto>"),
    )


def extract_transcript(df: DataFrame, xml_col: str = "alto_xml") -> DataFrame:
    """Parse the ALTO payload column into transcript columns:
    ``page_id``, ``transcript`` (CONTENT attributes joined in document
    order — xpath preserves it), ``n_words``, ``n_lines`` and
    ``sum_wc_e2`` (total word confidence in integer hundredths). All
    xpath evaluation is JVM-side; no UDFs, no shuffle."""
    xml = F.col(xml_col)
    contents = F.xpath(xml, F.lit("//String/@CONTENT"))
    wc_e2 = F.transform(
        F.xpath(xml, F.lit("//String/@WC")),
        lambda w: F.substring(w, 3, 2).cast("long"),
    )
    return df.select(
        *[c for c in df.columns if c != xml_col],
        F.xpath_string(xml, F.lit("/alto/Layout/Page/@ID")).alias("page_id"),
        F.array_join(contents, " ").alias("transcript"),
        F.size(contents).cast("long").alias("n_words"),
        F.size(F.xpath(xml, F.lit("//TextLine"))).cast("long").alias(
            "n_lines"
        ),
        F.aggregate(
            wc_e2, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_wc_e2"),
    )
