"""Versioned parquet table store — copy-on-write table landing.

The reference merges into live tables DB-side (database.ts:214-222
MERGE INTO); a filesystem store can't overwrite a parquet directory it
is currently reading from, and the naive workaround (write tmp dir,
re-read, rewrite the target) doubles write I/O per table per merge —
at 100 TB that is a second full pass over every landed byte.

Layout instead:

    <table>.parquet/
        v_1/ ... v_N/     parquet data, one directory per version
        _current          text file holding N (the live version)

A merge reads ``v_N``, writes ``v_{N+1}`` ONCE, then atomically swaps
the ``_current`` pointer (tmp file + ``os.replace``) and prunes old
versions. Readers resolve the pointer first, so a crash mid-write
leaves the previous version live (the half-written ``v_{N+1}`` is
replaced wholesale by the retry). Flat legacy directories (plain
parquet files, no ``_current``) read as version-less tables, and their
first merge converts them to the versioned layout.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_current"


def current_version(table_path: str) -> int | None:
    """The live version number, or None for flat/absent tables."""
    try:
        with open(os.path.join(table_path, _POINTER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def version_dir(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"v_{version}")


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the live version (pointer-resolved), or the flat legacy
    layout when the table predates versioning."""
    v = current_version(table_path)
    if v is None:
        return spark.read.parquet(table_path)
    return spark.read.parquet(version_dir(table_path, v))


def table_exists(table_path: str) -> bool:
    """True when the path holds a versioned table (live pointer) or a
    flat legacy parquet directory. Callers that treat 'no table yet'
    as a valid initial state must use THIS, not a bare try/except
    around read_table — swallowing every read error turns a transient
    failure (FS hiccup, corrupted footer) into 'no state', and a
    subsequent write then silently destroys the previous state."""
    if current_version(table_path) is not None:
        return True
    return os.path.isdir(table_path) and any(
        f.endswith(".parquet") or f == "_SUCCESS"
        for f in os.listdir(table_path)
    )


def write_table(df: DataFrame, table_path: str, prune: bool = True) -> int:
    """Land ``df`` as the next version of the table: ONE data write,
    then an atomic pointer swap. Returns the new version number.

    ``prune`` removes superseded version directories after the swap
    (pointer-first readers can no longer reach them; at cluster scale
    this is the async GC job, here it runs inline)."""
    prev = current_version(table_path)
    v = (prev or 0) + 1
    df.write.mode("overwrite").parquet(version_dir(table_path, v))
    tmp = os.path.join(table_path, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(table_path, _POINTER))
    if prune and prev is not None:
        for k in range(1, prev + 1):
            shutil.rmtree(version_dir(table_path, k), ignore_errors=True)
    return v


def compact_files(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
):
    """Small-files compaction — the maintenance pass every streaming
    sink needs: micro-batches land one-file-per-trigger, and a 100 TB
    table accumulates millions of KB-sized files whose per-file open
    and listing cost dominates scans. Rewrite to
    ceil(total_bytes / target) files (one round-robin shuffle; 128 MB
    default matches the scan split size, so post-compaction file count
    == scan task count). Returns the compacted DataFrame reader.

    Sizing reads FILE METADATA only (the JVM FileSystem listing — no
    data scan); the rewrite is the unavoidable one full read+write,
    which is why compaction runs as scheduled maintenance, not inline.
    """
    import math

    df = spark.read.parquet(in_path)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
