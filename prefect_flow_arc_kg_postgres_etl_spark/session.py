"""SparkSession factory.

Tuned for the harness (local[N], single JVM) but every setting is the one
you would ship to a 1000-executor cluster: AQE on (runtime coalesce +
skew-join), UTC session timezone (oracle comparison + sanity), Arrow for
the few Pandas-UDF paths, shuffle partitions sized to cores locally
(cluster: size to total cores / target partition bytes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "arc-kg-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start shuffles at 512 partitions and let AQE coalesce down:
        # sized-to-cores partitions (32) hold per-partition aggregation
        # state 50x too large once the data outgrows the tuning point —
        # measured on the 50x key-shifted index_documents blowup:
        # 40.7 s at 32 fixed partitions vs 24.9 s with this setting,
        # with the sf0.1 1x queries unchanged or faster (AQE coalesces
        # them back to a handful of post-shuffle partitions). This is
        # the cluster posture: initial partitions scale with data,
        # runtime coalesce handles the small case.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512"
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan the OUTPUT partitioning of cached/persisted
        # plans (default false pins every .persist() at the
        # pre-coalesce initialPartitionNum): with 512 initial
        # partitions, a persisted tiny frame (the reference pivot's
        # wide table) otherwise materializes as 512 cached partitions
        # and EVERY downstream consumer pays a 512-task scan —
        # measured on the composed main flow at sf0.001: 86 s -> 15 s
        # body wall with this on, identical results. At cluster scale
        # the setting is strictly better for small cached dims and
        # neutral for large ones (coalesce only shrinks below target
        # size).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Parallel CI shards run one JVM each; give every shard its own
        # warehouse dir so concurrent managed-table tests cannot
        # collide on ./spark-warehouse (unset => Spark's cwd default).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(os.getcwd(), "spark-warehouse"),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The generated-class cache defaults to 100 entries; a session
        # running the full 43-query headline suite compiles well over 100
        # codegen units per pass, so the LRU evicts everything and every
        # timed pass re-pays janino compilation (~0.1-0.3 s/query,
        # uniformly). Size it to hold the whole suite. Read once at
        # CodeGenerator static init, so it must be set at session build.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
