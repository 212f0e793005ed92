"""C-block plans: Structured Streaming (SURVEY.md §2 C1-C2).

stream_windowed_agg is hash-checked against the BATCH oracle (complete
mode over a bounded file source == the batch tumbling aggregation) —
the strongest correctness statement available for a streaming op.
stream_incremental_upsert is rows-only (its per-batch sequencing is
engine-internal; final-state semantics are tested in tests/).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from prefect_flow_arc_kg_postgres_etl_spark.plans.relational import TUMBLING_ORACLE
from prefect_flow_arc_kg_postgres_etl_spark.streaming.sync import (
    dedup_stream,
    es_feed_stream,
    incremental_upsert_stream,
    sessionize_stream,
    windowed_agg_stream,
)

_COUNTER = {"n": 0}


def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _COUNTER["n"] += 1
    return windowed_agg_stream(
        spark, sf_dir, query_name=f"stream_windowed_agg_{_COUNTER['n']}"
    )


STREAM_WINDOWED_ORACLE = TUMBLING_ORACLE


def stream_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = tempfile.mkdtemp(prefix="stream_upsert_") + "/target"
    return incremental_upsert_stream(spark, sf_dir, target)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: custom stateful operator via applyInPandasWithState. Rows-only
    for the driver (emits CLOSED sessions; each user's final session
    stays in state); tests/test_streaming.py checks exact equivalence
    with the batch sessionize operator on the closed set."""
    _COUNTER["n"] += 1
    return sessionize_stream(
        spark, sf_dir, query_name=f"stream_sessionize_{_COUNTER['n']}"
    )


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: watermarked streaming dedup of a doubled source; final table
    == the plain events table, which is the batch-SQL oracle."""
    _COUNTER["n"] += 1
    return dedup_stream(spark, sf_dir, query_name=f"stream_dedup_{_COUNTER['n']}")


STREAM_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""


def stream_es_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: foreachBatch ES bulk feed; the landed NDJSON line count is
    2x the source rows (action + source line per doc) — asserted in
    tests; rows-only for the driver."""
    out = tempfile.mkdtemp(prefix="stream_es_") + "/feed"
    return es_feed_stream(spark, sf_dir, out)
