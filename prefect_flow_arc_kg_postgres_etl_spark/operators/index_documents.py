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
    lineitem = load_table(spark, sf_dir, "lineitem")

    # Every aggregate shape of update_partition.sql, pre-reduced to ONE
    # row per customer BEFORE the star join (map-side partials; the join
    # carries no multi-value fan-out):

    # (a) plain aggs + (b) LATERAL pick-one-with-priority
    # (update_partition.sql:62-74 dcterms_format ORDER BY CASE LIMIT 1):
    # min over (case-rank, value) — deterministic, single agg pass.
    prio_rank = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .otherwise(3)
    )
    order_agg = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.max("o_orderdate").alias("last_order_date"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col("o_orderkey").cast("string")))
        ).alias("order_keys"),
        F.min(F.struct(prio_rank.alias("r"), F.col("o_orderpriority").alias("p")))
        .getField("p")
        .alias("preferred_priority"),
        F.max("o_totalprice").alias("_max_order_total"),
        F.sort_array(F.collect_set(F.year("o_orderdate"))).alias("_order_years"),
        F.collect_list("o_orderpriority").alias("_prios"),
    )
    # (c) jsonb_agg of typed objects (update_partition.sql:76-81
    # premis_identifier): per-priority counts as a sorted list — derived
    # from the already-collected priority list with array expressions,
    # NOT a second (custkey, prio) aggregation + join (one shuffle
    # fewer; the per-customer list is bounded by order count). The doc
    # field is the reference's jsonb_agg *string* (update_partition.sql
    # emits strings into the document, not SQL arrays), serialized as a
    # deterministic comma-joined string.
    order_agg = order_agg.withColumn(
        "priority_counts",
        F.concat_ws(
            ",",
            F.sort_array(
                F.transform(
                    F.array_distinct("_prios"),
                    lambda p: F.concat_ws(
                        ":", p, F.size(F.filter("_prios", lambda x: x == p))
                    ),
                )
            ),
        ),
    ).drop("_prios")

    # (d) MAX over a UNION of two derivations (update_partition.sql:83-103
    # schema_duration: file-based ∪ fragment-based): the customer's max
    # item price from the order-total leg ∪ the lineitem leg, plus
    # (e) distinct-agg over the union of both legs' years.
    li_leg = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max("l_extendedprice").alias("_max_line_price"),
            F.sort_array(F.collect_set(F.year("l_shipdate"))).alias("_ship_years"),
        )
        .withColumnRenamed("o_custkey", "_li_custkey")
    )

    org = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)

    docs = (
        org.join(order_agg, org.c_custkey == order_agg.o_custkey, "left")
        .join(li_leg, org.c_custkey == F.col("_li_custkey"), "left")
        .select(
            F.col("c_custkey").alias("id"),
            F.lower(F.col("n_name")).alias("index"),  # partition key, as lower(org_identifier)
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            # nested maintainer object (update_partition.sql:56-60
            # jsonb_build_object) rendered as a JSON string column.
            F.to_json(
                F.struct(
                    F.lower(F.col("n_name")).alias("schema_identifier"),
                    F.col("n_name").alias("schema_name"),
                    F.col("r_name").alias("organization_sector"),
                )
            ).alias("maintainer"),
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
            F.col("last_order_date"),
            F.coalesce(F.col("order_keys"), F.lit("")).alias("order_keys"),
            F.col("preferred_priority"),
            F.coalesce(F.col("priority_counts"), F.lit("")).alias("priority_counts"),
            F.round(
                F.greatest(
                    F.coalesce(F.col("_max_order_total"), F.lit(0.0)),
                    F.coalesce(F.col("_max_line_price"), F.lit(0.0)),
                ),
                2,
            ).alias("max_item_price"),
            # active_years as a comma-joined string (doc field, same
            # serialization rationale as priority_counts above).
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.array_union(
                            F.coalesce(
                                F.col("_order_years"), F.array().cast("array<int>")
                            ),
                            F.coalesce(
                                F.col("_ship_years"), F.array().cast("array<int>")
                            ),
                        )
                    ),
                    lambda y: y.cast("string"),
                ),
            ).alias("active_years"),
        )
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
