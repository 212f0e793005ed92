"""CSV / NDJSON source-sink for catalog tables.

The reference's surface is parquet/Postgres, but bulk interchange in
and out of the ETL is line-oriented text (the same role its ES bulk
NDJSON feed plays on the sink side — sinks/es_bulk.py). Both formats
here are splittable text: a 100 TB dump reads with ordinary partition
parallelism.

Round-trip fidelity: the reader takes the WRITER's schema (callers
pass the catalog table's schema), so types survive exactly — Spark
serializes doubles at full precision and CSV quoting covers embedded
delimiters/newlines. Verified value-exact (hash-level) against the
parquet originals in tests and by the ``source_csv_roundtrip`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Microsecond-precision timestamp formats: both writers default to
# millis and silently truncate parquet's micros — a lossy round trip
# the fidelity tests catch.
_TS_OPTS = {
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}

_CSV_OPTS = {
    "header": "true",
    # Escape quotes by doubling (RFC 4180) and quote anything that
    # needs it — embedded commas/newlines/quotes survive.
    "quote": '"',
    "escape": '"',
    # NULL is a sentinel distinct from the empty string; without it the
    # reader collapses "" to null.
    "nullValue": "\\N",
    **_TS_OPTS,
}

def write_csv(df: DataFrame, path: str) -> None:
    w = df.write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv(
    spark: SparkSession, path: str, schema, multi_line: bool = False
) -> DataFrame:
    """DEFAULT plan is line-splittable: every 100 TB dump reads with
    ordinary partition parallelism. Quoted embedded newlines are legal
    CSV but require ``multi_line=True``, which parses each file on ONE
    task — opt in only for data that actually contains them (dims,
    small interchange); for newline-bearing content at scale use NDJSON
    (escaped \\n inside JSON strings keeps files splittable)."""
    r = spark.read.schema(schema)
    opts = {**_CSV_OPTS, "multiLine": "true"} if multi_line else _CSV_OPTS
    for k, v in opts.items():
        r = r.option(k, v)
    return r.csv(path)


def write_ndjson(df: DataFrame, path: str) -> None:
    w = df.write.mode("overwrite")
    for k, v in _TS_OPTS.items():
        w = w.option(k, v)
    w.json(path)


def read_ndjson(spark: SparkSession, path: str, schema) -> DataFrame:
    r = spark.read.schema(schema)
    for k, v in _TS_OPTS.items():
        r = r.option(k, v)
    return r.json(path)
