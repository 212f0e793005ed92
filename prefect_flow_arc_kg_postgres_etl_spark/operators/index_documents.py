"""Index-document construction — the Elasticsearch feed.

Reference: flows/queries/update_partition.sql builds ONE denormalized
JSON document per intellectual entity (a ~15-way join over the entity,
its organisation, and per-related-table aggregates), inserted into
``graph.index_documents`` partitioned per organisation;
flows/arc_db_load_index_tables_flow.py maintains the partitions
(create/truncate/repopulate) using per-partition stats.

Spark redesign (update_partition.sql's shape on the harness star
schema):
- every multi-value side table is pre-aggregated to one row per entity
  (map-side partial agg) BEFORE the star join — the join then carries
  exactly one row per (entity, side) instead of exploding;
- dimension tables broadcast;
- the fact side shuffles ONCE on the entity key;
- partition maintenance is ``write.partitionBy(org).mode("overwrite")``
  with dynamic partition overwrite — no DDL, works on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_index_documents(
    spark: SparkSession, sf_dir: str, as_json: bool = True
) -> DataFrame:
    """One searchable document per customer (the harness analogue of one
    document per intellectual entity): identity + organisation
    (nation/region, as the org join at update_partition.sql:57-64) +
    aggregates over the entity's orders and order lines (as the
    side-table aggregates at update_partition.sql:66+).
    """
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")

    # Pre-aggregate the multi-value side (orders per customer) before the
    # star join — one row per customer crosses the join.
    order_agg = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.max("o_orderdate").alias("last_order_date"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col("o_orderkey").cast("string")))
        ).alias("order_keys"),
    )

    org = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)

    docs = org.join(
        order_agg, org.c_custkey == order_agg.o_custkey, "left"
    ).select(
        F.col("c_custkey").alias("id"),
        F.lower(F.col("n_name")).alias("index"),  # partition key, as lower(org_identifier)
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
        F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
        F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
        F.col("last_order_date"),
        F.coalesce(F.col("order_keys"), F.lit("")).alias("order_keys"),
    )
    if as_json:
        docs = docs.withColumn(
            "document",
            F.to_json(
                F.struct(
                    "name", "segment", "nation", "region",
                    "order_count", "total_spend", "order_keys",
                )
            ),
        )
    return docs


def partition_stats(
    entities: DataFrame,
    org_col: str,
    updated_col: str,
    since,
) -> DataFrame:
    """Per-partition maintenance stats
    (arc_db_load_index_tables_flow.py:36-55 get_partitions): row count
    and whether anything changed since the watermark — drives which
    partitions to repopulate. Single groupBy; bool_or has a map-side
    partial."""
    return entities.groupBy(F.col(org_col).alias("partition")).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.max(
            (F.col(updated_col).isNotNull()) & (F.col(updated_col) > F.lit(since))
        ).alias("is_updated"),
    )


def write_partitioned(docs: DataFrame, path: str, partition_col: str = "index") -> None:
    """Partition maintenance as dynamic partition overwrite — replaces
    only partitions present in ``docs`` (create/truncate/repopulate in
    one declarative write)."""
    (
        docs.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
