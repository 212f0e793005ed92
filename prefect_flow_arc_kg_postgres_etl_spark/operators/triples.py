"""Triple-model operators: the knowledge-graph layer.

The reference's data model is an RDF graph streamed as triples; its two
fundamental moves are
  (1) CONSTRUCT: pattern-match the graph, emit relational-shaped triples
      (typescript/queries/*.sparql via 1_kg_view_construct.ts), and
  (2) record pivot: consecutive same-subject triples -> one wide record
      (typescript/src/stream.ts:51-116 RecordContructor).

Spark-first redesign:
- A graph is a DataFrame (subject, predicate, object, lang). ``melt``
  turns any relational table into that shape (pure projection + stack —
  narrow, no shuffle, scan-fused).
- ``pivot_records`` is ONE hash aggregation keyed by subject: for each
  wanted column take the value with the smallest (lang_priority, object)
  — deterministic at any parallelism, unlike the reference's
  stream-order-dependent first-value rule. lang='nl' overrides, as in
  stream.ts:97-103.
- ``construct`` compiles a SPARQL-like basic graph pattern into
  self-joins on the triples DataFrame; shared variables become join
  keys. Catalyst/AQE then picks physical join strategies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    subject_prefix: str = "",
) -> DataFrame:
    """Wide table -> (subject, predicate, object string, lang) triples.

    Inverse of the reference's record pivot; lang is NULL (testdata has
    no language-tagged literals). stack() is a generator expression —
    no shuffle, runs fused with the parquet scan.
    """
    cols = columns or [c for c in df.columns if c != key]
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    subject = F.concat(F.lit(subject_prefix), F.col(key).cast("string"))
    return (
        df.select(
            subject.alias("subject"),
            F.expr(f"stack({len(cols)}, {pairs}) as (predicate, object)"),
        )
        .withColumn("lang", F.lit(None).cast("string"))
        .filter(F.col("object").isNotNull())
    )


def pivot_records(
    triples: DataFrame,
    predicates: list[str],
    subject_col: str = "subject",
    preferred_lang: str = "nl",
) -> DataFrame:
    """Triples -> one record per subject; first-value-wins, language
    override (stream.ts:51-116).

    Deterministic distributed semantics: per (subject, predicate) keep
    the object of the triple minimizing (lang != preferred_lang, object).
    Single hash-aggregate shuffle on subject; min(struct) gives map-side
    partial aggregation, so the shuffle carries one row per
    (subject, predicate) — this survives a 100 TB triple scan.
    """
    prio = F.when(F.col("lang") == preferred_lang, 0).otherwise(1)
    picked = F.struct(prio.alias("p"), F.col("object").alias("o"))
    aggs = [
        F.min(F.when(F.col("predicate") == p, picked)).getField("o").alias(p)
        for p in predicates
    ]
    return triples.groupBy(F.col(subject_col).alias("subject")).agg(*aggs)


def construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: dict[str, str] | None = None,
    filters: list[Column] | None = None,
) -> DataFrame:
    """Evaluate a basic graph pattern (SPARQL WHERE clause) and project
    bound variables — the CONSTRUCT core of 1_kg_view_construct.ts.

    ``patterns``: (subject_var, predicate, object_var) entries; names
    starting with '?' are variables, anything else is a constant.
    Each pattern is a predicate-filtered scan of the triples DataFrame;
    shared variables across patterns become equi-join keys. With the
    triples source bucketed/partitioned by subject, consecutive
    subject-keyed patterns co-locate; Catalyst/AQE handles the rest.

    Returns one column per variable (without the '?').
    """
    out: DataFrame | None = None
    bound: set[str] = set()
    for i, (s, p, o) in enumerate(patterns):
        t = triples
        sel = []
        if p.startswith("?"):
            sel.append(F.col("predicate").alias(p[1:]))
        else:
            t = t.filter(F.col("predicate") == p)
        for term, col in ((s, "subject"), (o, "object")):
            if term.startswith("?"):
                sel.append(F.col(col).alias(term[1:]))
            else:
                t = t.filter(F.col(col) == term)
        t = t.select(*sel)
        new_vars = {c for c in t.columns}
        if out is None:
            out = t
        else:
            keys = sorted(bound & new_vars)
            out = out.join(t, on=keys, how="inner") if keys else out.crossJoin(t)
        bound |= new_vars
    assert out is not None, "empty pattern list"
    if filters:
        for f in filters:
            out = out.filter(f)
    if select:
        out = out.select(*[F.col(v).alias(a) for v, a in select.items()])
    return out


def to_table_triples(
    records: DataFrame, table_name: str, id_col: str
) -> DataFrame:
    """Tag records with the reference's ':tableName' routing triple
    (stream.ts:90-91 TABLE_PRED) — relational-shaped triples ready for
    the batch/stage step. Kept as a column, not a row, Spark-side."""
    return records.withColumn("table_name", F.lit(table_name)).withColumn(
        "record_id", F.col(id_col).cast("string")
    )
