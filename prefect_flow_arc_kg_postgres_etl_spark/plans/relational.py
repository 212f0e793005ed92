"""B-block plans: the relational query layer over the loaded store
(SURVEY.md §2 B1-B10).

The reference's consumers run analyst queries over the Postgres store it
maintains (hetarchief.be V3); this is that query layer, Spark-native.
Every aggregate over doubles is rounded identically on both sides
(parallel FP summation order differs between engines); every top-k has a
deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table


# ------------------------------------------------------------- B1 TPC-H Q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------- B2 TPC-H Q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with sf — no broadcast hint; AQE picks the
        # strategy from runtime size (broadcast at small sf, SMJ at scale).
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ------------------------------------------------------------- B3 TPC-H Q5
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem against the dims; supplier and customer
    must share the nation (the TPC-H Q5 'local' condition). Only the
    fixed-size nation/region dims carry broadcast hints — supplier and
    customer scale with sf, so AQE picks their join strategy."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # supplier/customer scale with sf — no broadcast hints; only the
        # fixed-size nation/region dims below keep theirs.
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q5_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --------------------------------------------------------- B4 top-k/group
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # customer scales with sf — AQE chooses the join strategy.
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
    )


TOPK_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""


# ------------------------------------------------------ B5 running window
def windowed_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
"""


# ---------------------------------------------------------- B6 rollup agg
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# -------------------------------------------------------- B7 distinct agg
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------- B8 tumbling window
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the streaming windowed aggregation (C2): tumbling
    1-hour windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


TUMBLING_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------- B9 sessionize
_GAP_MIN = 30


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session breaks after >30 min idle.
    lag + cumulative-sum-of-breaks — two window passes over ONE shuffle
    on user_id (same partitioning reused by both windows and the final
    groupBy)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is timestamp_ntz (catalog-normalized); ntz has no direct long
    # cast, so route through ltz (exact under the catalog's pinned UTC
    # session tz) to get epoch seconds.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > _GAP_MIN * 60), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY 1, 2
"""


# -------------------------------------------------------- B10 as-of join
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest order of the same key at
    or before the event time (Spark has no native ASOF).

    Scale-path implementation: merge both sides into ONE timeline,
    shuffle ONCE on the key, and carry the most recent order forward
    with last(ignorenulls) — linear in input, no key-range explosion,
    unlike the join-then-filter-then-rank approach the oracle uses.
    Ties: an order at exactly the event time is visible; among orders
    with the same timestamp the highest o_orderkey wins.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    # Map the order timeline into the events' key/time domain
    # deterministically so the two domains overlap: order time = ts-domain
    # start + orderdate offset scaled into January 2024.
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        # 1704067200 = 2024-01-01T00:00:00Z — maps the order timeline
        # into the events' January-2024 window deterministically.
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.col("o_orderkey") * 977, 2592000)
        ).cast("timestamp_ntz").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    timeline = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("is_order"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        timeline.withColumn(
            "last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_totalprice", F.last("o_totalprice", ignorenulls=True).over(w)
        )
        .filter(F.col("is_order") == 0)
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "last_orderkey",
        "last_totalprice",
    )


ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey AS k,
         TIMESTAMP '2024-01-01 00:00:00'
           + ((o_orderkey * 977) % 2592000) * INTERVAL 1 SECOND AS t,
         o_orderkey, o_totalprice
  FROM orders
)
SELECT e.event_id, e.user_id, e.ts,
       oo.o_orderkey AS last_orderkey,
       oo.o_totalprice AS last_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM o
  WHERE o.k = e.user_id AND o.t <= e.ts
  ORDER BY o.t DESC, o.o_orderkey DESC
  LIMIT 1
) oo ON TRUE
"""


# ---------------------------------------- B11 exists / anti-join (Q21/Q22 shape)
def exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with a positive balance and NO urgent order (TPC-H
    Q22's anti-join core): left-anti join — Spark's decorrelated NOT
    EXISTS — aggregated per nation. The filter on orders is pushed to
    the scan BEFORE the anti join; the join shuffles on custkey only,
    and AQE turns it into a broadcast anti when the filtered side
    fits."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    no_orders = cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .select(F.col("c_nationkey").alias("nationkey"), "numcust", "totacctbal")
    )


EXISTS_ANTI_ORACLE = """
SELECT c_nationkey AS nationkey,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# ------------------------------- B12 correlated scalar subquery (Q17 shape)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems below 20%% of their part's average quantity (TPC-H
    Q17's correlated scalar subquery), decorrelated the way Catalyst
    does it: pre-aggregate per part, then join — one shuffle on
    partkey, no per-row subquery execution."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    small = li.join(avg_qty, on="l_partkey").filter(
        F.col("l_quantity") < F.col("qty_limit")
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_lineitems"),
    )


CORRELATED_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey
)
"""


# -------------------------------------------------- B13 grouping sets
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate in one pass: GROUPING SETS over
    (returnflag, linestatus), (returnflag), () — Spark expands to a
    single shuffle with grouping-id, not three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ------------------------------------- B7b approx distinct (HLL sketch)
def distinct_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts — the sketch tier of
    B7 for cardinalities where exact distinct's shuffle is the
    bottleneck. Rows-only for the driver (sketch estimates are
    engine-specific); relative error vs the exact tier is asserted in
    tests (rsd=0.02)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------- B14 Q7-shape nation volume
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nation pairs,
    grouped by supplier nation / customer nation / ship year. The
    nation-pair disjunction is evaluated AFTER the dim joins (only the
    fixed-size nation aliases are broadcast-hinted); the facts shuffle
    once for the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with sf — no broadcast hints; the
        # fixed-size nation aliases keep theirs.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair_ok)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# ----------------------------- B15 Q19-shape disjunctive predicates
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over joined columns. The
    part-side conjuncts (brand x size band) stay evaluable at the part
    scan; the residual disjunction runs post-join. AQE picks the join
    strategy (part scales with sf); one agg shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity") >= 20)
        )
    )
    return (
        # part scales with sf (200k × sf) — AQE chooses the strategy.
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20)
"""


# ---------------------------------------------- B16 TPC-H Q2 shape
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small part, the supplier(s) achieving the
    MINIMUM observed unit cost — a correlated-min subquery decorrelated
    into [per-(part,supplier) agg] -> [per-part window min] -> filter.
    The window formulation (not a second agg + self-join) matters for
    the plan: Spark does not reuse a subplan across branches, so the
    agg+join form scans the 100 TB fact TWICE; the window min scans it
    once (one agg shuffle + one window exchange on the much smaller
    aggregated set) — pinned by the plan audit. Double equality on the
    filter is sound: both columns carry identical IEEE results."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    winners = (
        unit.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("l_partkey", "l_suppkey", "min_cost")
    )
    return (
        winners.join(part, winners.l_partkey == part.p_partkey)
        .join(supp, winners.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("min_cost", 4).alias("min_cost"),
        )
    )


Q2_ORACLE = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
), part_min AS (
  SELECT l_partkey, MIN(cost) AS min_cost FROM unit GROUP BY 1
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
       ROUND(pm.min_cost, 4) AS min_cost
FROM unit u
JOIN part_min pm ON pm.l_partkey = u.l_partkey AND u.cost = pm.min_cost
JOIN part p ON p.p_partkey = u.l_partkey AND p.p_size < 15
JOIN supplier s ON s.s_suppkey = u.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""


# ---------------------------------------------- B17 TPC-H Q4 shape
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders in a quarter with at least one late-shipping line
    (EXISTS -> left-semi join), counted per priority. The date filter
    pushes to the orders scan; the semi join shrinks to matching keys
    before the agg."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------- B18 TPC-H Q12 shape
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: conditional aggregation after the fact join — one shuffle
    for the join (AQE may broadcast the filtered year of lineitem),
    one for the tiny group-by; the CASE sums compute map-side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


# ------------------------------- B19 time-interval range-frame window
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour aggregate over event TIME (RANGE
    frame), not row count — the sliding-window shape tumbling windows
    can't express. One shuffle on event_type; the frame bound is on
    epoch micros so Spark's numeric rangeBetween and the SQL INTERVAL
    frame agree exactly (RANGE frames include all ts peers, so ties
    need no ordering tiebreak — the result is deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


WINDOW_RANGE_ORACLE = """
SELECT event_id, event_type,
       COUNT(*) OVER w AS n_1h,
       ROUND(SUM(value) OVER w, 4) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------- B20 funnel / sequence detection
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user A->B conversion detection (view followed by purchase
    within 1 hour) WITHOUT a self-join: a running MAX over the
    preceding rows carries each user's latest view time to every later
    event, and purchases filter on the gap — one shuffle on user_id,
    no range join, no state blowup (the MATCH_RECOGNIZE shape funnels
    actually need at scale). The (ts, event_id) ordering is a total
    order per user, so the ROWS frame is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(F.when(F.col("event_type") == "view", us)).over(w)
    return (
        ev.withColumn("us", us)
        .withColumn("last_view_us", last_view)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_us").isNotNull()
            & (F.col("us") - F.col("last_view_us") <= 3_600_000_000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event"),
            (F.col("us") - F.col("last_view_us")).alias("gap_us"),
        )
    )


FUNNEL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_us
  FROM events
)
SELECT user_id, event_id AS purchase_event,
       CAST(us - last_view_us AS BIGINT) AS gap_us
FROM seq
WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
  AND us - last_view_us <= 3600000000
"""


# ---------------------------------------------- B21 TPC-H Q9 shape
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by nation and order year over a 5-way join
    (lineitem x part x supplier x orders x nation). The testdata has no
    partsupp, so unit cost is proxied as 60% of p_retailprice — the
    expression shape (revenue minus cost*quantity, aggregated two
    levels up) is what Q9 exercises, not the cost source. The p_name
    filter prunes part BEFORE the join; nation broadcasts (fixed 25
    rows); supplier/orders scale with sf so AQE picks their strategy.
    One shuffle per join plus the final tiny group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ---------------------------------------------- B22 TPC-H Q10 shape
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers ranked by revenue lost to returned items in a
    quarter — fact join shrunk by BOTH pushed filters (returnflag on
    lineitem, quarter on orders) before touching customer; top-20 with
    a deterministic custkey tiebreak."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            )
            .cast("long")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------- B23 TPC-H Q14 shape
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — a conditional-sum RATIO computed in
    ONE aggregation over the month's lineitem x part join (two CASE
    sums, no second scan). The month filter pushes to the lineitem
    scan; part is the smaller side and AQE broadcasts it at low sf."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


Q14_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# ---------------------------------------------- B24 TPC-H Q16 shape
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute group,
    EXCLUDING a suppliers-with-complaints set (the NOT IN subquery;
    negative account balance stands in for the comment scan). The
    exclusion set is a FILTER of the sf-scaled supplier table, so it
    carries no broadcast hint (the repo rule: hints only on fixed-size
    dims) — AQE broadcasts the anti join while the set is small and
    falls back to a shuffled anti join if it ever is not. The anti
    join runs BEFORE the fact join; count distinct shuffles once on
    the group keys. The part/supplier
    relation is derived from lineitem (the testdata has no partsupp) —
    same shape: fact-derived pairs, dim attributes, distinct agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").join(
        bad, li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------- B25 TPC-H Q18 shape
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds a threshold (the
    HAVING-on-agg -> join-back shape). The qualifying keys come from
    ONE lineitem aggregation (map-side partial sums shrink the
    shuffle); the join back to orders/customer attaches attributes
    only for qualifying orders — at 100 TB the qualifying set is tiny,
    so AQE broadcasts it into both attach joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING ROUND(SUM(l_quantity), 2) > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------- B26 TPC-H Q11 shape
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups exceeding a GLOBAL-aggregate threshold — the
    scalar subquery over the whole fact, decorrelated into [per-part
    agg] x [1-row global agg broadcast cross join]. The global side is
    derived FROM the per-part aggregate (an avg over it), so the fact
    is scanned once and the second pass runs over the ~million-row
    aggregate, not the 100 TB fact. Threshold = 1.5x the mean per-part
    revenue — scale-free, unlike Q11's literal fraction (which pins
    the result count to one SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("part_rev"))
    threshold = per_part.agg(
        (F.lit(1.5) * F.avg("part_rev")).alias("cutoff")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_rev") > F.col("cutoff"))
        .select("l_partkey", F.round("part_rev", 2).alias("part_rev"))
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS part_rev
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, ROUND(part_rev, 2) AS part_rev
FROM per_part
WHERE part_rev > (SELECT 1.5 * AVG(part_rev) FROM per_part)
"""


# ---------------------------------------------- B27 wide pivot
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot: per-user event-type count matrix (the inverse
    of A1's unpivot/melt). The pivot values are DECLARED, not
    discovered — with an explicit list Spark skips the extra distinct
    pass over the fact AND the plan stays a single hash aggregation
    (pivot compiles to one agg with |values| conditional counts, no
    per-value shuffle). Missing cells fill 0 like the SQL CASE sums."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [*_EVENT_TYPES])
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES],
        )
    )


EVENTS_PIVOT_ORACLE = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


# ---------------------------------------------- B28 cohort retention
def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, then
    distinct actives per (cohort, months-since). The cohort month rides
    a WINDOW MIN over the customer partition (one shuffle on custkey,
    fact scanned once — same single-scan discipline as q2/q11), and the
    retention matrix is one more aggregation on the tiny (cohort,
    offset) key space. Month arithmetic is integer (y*12+m), identical
    in the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    return (
        orders.withColumn("order_ym", ym)
        .withColumn("cohort_ym", F.min("order_ym").over(w))
        .groupBy(
            F.col("cohort_ym").cast("bigint").alias("cohort_ym"),
            (F.col("order_ym") - F.col("cohort_ym"))
            .cast("bigint")
            .alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


COHORT_RETENTION_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS order_ym,
         MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate))
           OVER (PARTITION BY o_custkey) AS cohort_ym
  FROM orders
)
SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
       CAST(order_ym - cohort_ym AS BIGINT) AS months_since,
       COUNT(DISTINCT o_custkey) AS active_customers
FROM o
GROUP BY 1, 2
"""


# ---------------------------------------------- B29 histogram profiling
_HIST_WIDTH = 25000.0


def orders_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (data-profiling shape):
    bin assignment is a scan-side floor division, so the whole
    histogram is ONE map-side-combining aggregation — no sort, no
    window, bounded output (|bins| rows) at any scale. Bin edges use
    exact double division + floor, identical IEEE ops in the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / F.lit(_HIST_WIDTH)).cast("bigint")
    return (
        orders.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


VALUE_HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT) AS bin,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS bin_min,
       ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders
GROUP BY 1
"""


# ---------------------------------------------- B30 exact quantiles
def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of event value per type —
    percentile() in Spark and quantile_cont() in DuckDB implement the
    same linear-interpolation definition, so the results agree to
    rounding. Exact percentile sorts within each group; the APPROX
    path at 100 TB is distinct_agg_approx's sketch tier
    (approx_percentile), which trades exactness for one pass —
    this entry is the ground-truth twin."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


EVENTS_QUANTILES_ORACLE = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
"""


# ------------------------------- B31 three-step funnel composition
def events_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step funnel (view -> click -> purchase, each hop within
    24 hours — sized to the testdata's event cadence so every sf has
    conversions) by COMPOSING running windows instead of self-joining:
    window 1 carries the latest view time to every later event, which
    qualifies clicks; window 2 carries the latest QUALIFIED click time
    to every later event, which qualifies purchases. Both windows share
    the (user_id, ts, event_id) sort, so Spark plans ONE shuffle and
    ONE sort — the k-step generalization stays linear in steps while
    the join formulation is O(events^k) per user."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hour = 24 * 3_600_000_000
    last_view = F.max(F.when(F.col("event_type") == "view", us)).over(w)
    base = ev.withColumn("us", us).withColumn("last_view_us", last_view)
    qual_click = F.when(
        (F.col("event_type") == "click")
        & F.col("last_view_us").isNotNull()
        & (F.col("us") - F.col("last_view_us") <= hour),
        F.col("us"),
    )
    staged = base.withColumn(
        "last_qual_click_us", F.max(qual_click).over(w)
    )
    return staged.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_qual_click_us").isNotNull()
        & (F.col("us") - F.col("last_qual_click_us") <= hour)
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_event"),
        (F.col("us") - F.col("last_qual_click_us")).alias("click_gap_us"),
    )


FUNNEL3_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_us
  FROM events
), staged AS (
  SELECT user_id, event_id, event_type, us,
         MAX(CASE WHEN event_type = 'click' AND last_view_us IS NOT NULL
                       AND us - last_view_us <= 86400000000
                  THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_qual_click_us
  FROM seq
)
SELECT user_id, event_id AS purchase_event,
       CAST(us - last_qual_click_us AS BIGINT) AS click_gap_us
FROM staged
WHERE event_type = 'purchase' AND last_qual_click_us IS NOT NULL
  AND us - last_qual_click_us <= 86400000000
"""


# ------------------------- B30b approx quantiles (sketch tier of B30)
def events_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass mergeable-sketch quantiles (approx_percentile /
    KLL-style) — the 100 TB path: exact percentile sorts every group,
    the sketch streams and merges map-side. Engine-specific sketch
    internals => rows-only entry; the error bound vs the exact twin
    (B30) is pinned in tests/test_relational_extras.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 4).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 10000)"), 4).alias("p90"),
        F.round(F.expr("approx_percentile(value, 0.99, 10000)"), 4).alias("p99"),
    )


# ------------------------------- B32 semi-structured JSON extraction
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload parsing: the events table carries a JSON
    properties string; extract a typed field SCAN-SIDE (from_json with
    an explicit schema — JVM-parsed, fused into the scan projection,
    no UDF) and aggregate it per event type and value decile. At 100 TB
    the JSON never reaches a shuffle: parsing, field extraction and the
    decile bucket are all map-side, and the agg ships |types x 10|
    partial rows. Explicit schema beats schema_of_json discovery
    (a driver-side sample pass) and get_json_object re-parsing per
    field."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k BIGINT").getField("k")
    )
    return (
        parsed.groupBy(
            "event_type",
            (F.floor(F.col("k") / 10) * 10).cast("bigint").alias("k_decade"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


EVENTS_JSON_ORACLE = """
SELECT event_type,
       CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10)
            * 10 AS BIGINT) AS k_decade,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
"""


# ------------------------------- B33 multiset set operations
def orders_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-preserving set algebra (EXCEPT ALL / INTERSECT ALL)
    over two order-priority projections — the bag semantics
    reconciliation queries rely on (row-count-sensitive diffs, unlike
    the DISTINCT set ops). Spark plans both as a single aggregation of
    signed counts per row value (no sort); the two branches union into
    one labeled result so the whole comparison is one query."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 50_000).select(
        "o_custkey", "o_orderpriority"
    )
    b = orders.filter(F.col("o_orderdate") >= "1996-01-01").select(
        "o_custkey", "o_orderpriority"
    )
    ex = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    ix = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    return (
        ex.unionByName(ix)
        .groupBy("op", "o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


SET_OPS_ORACLE = """
WITH a AS (
  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 50000
), b AS (
  SELECT o_custkey, o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
), ex AS (
  SELECT 'except_all' AS op, * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
), ix AS (
  SELECT 'intersect_all' AS op, * FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
)
SELECT op, o_custkey, o_orderpriority, COUNT(*) AS n
FROM (SELECT * FROM ex UNION ALL SELECT * FROM ix)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------- B34 TPC-H Q13 shape
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: the distribution of customers by order count, INCLUDING
    zero-order customers — the left-outer + double-aggregation shape
    (per-customer counts off the outer join, then a histogram of those
    counts). The outer join preserves customerless rows as NULL order
    keys, which count() correctly scores as 0; both aggregations
    shuffle on shrinking key spaces (custkey, then the tiny count
    domain). The order filter (non-urgent only, Q13's comment-pattern
    exclusion analogue) applies BEFORE the join at the orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------- B35 TPC-H Q6 shape
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecasting revenue change — the canonical PUSHDOWN query.
    Every predicate (date range, discount band, quantity cap) is a
    scan-side comparison on a native parquet column, so the whole WHERE
    clause reaches the reader as PushedFilters and row groups outside
    the 1996 shipdate range never leave disk; the single conditional
    sum combines map-side and ships one partial per partition. No
    join, no window — the query is exactly one scan and one exchange
    of 1-row partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            # Exact e4-unit arithmetic (price and discount are 2-decimal
            # values, so revenue terms are exact 4-decimal numbers and a
            # double ROUND(x,2) would sit exactly on .xx5 half-way
            # points where the engines round differently — see A35).
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * F.round(F.col("l_discount") * 100).cast("long")
                )
                / 10000.0
            ).alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------- B36 TPC-H Q8 shape
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: national market share — the DOUBLE-ROLE dimension shape: the
    nation table joins twice under different roles (customer's nation
    restricts the market region; supplier's nation is the share
    numerator), and the share is a conditional-sum ratio per year in
    ONE aggregation. Only fixed-size dims (nation, region) carry
    broadcast hints; customer/supplier/orders are sf-scaled and join
    shuffled (AQE may still broadcast the filtered survivors). Date
    and type filters push to the orders/part scans before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").alias("n1")
    n_supp = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    # Exact e4 units (see q6/q15): price and discount are exact
    # 2-decimal values, so summing doubles puts mkt_share's 4th
    # decimal on .xxxx5 boundaries where Spark and DuckDB round
    # apart; integer sums divide once at the end instead.
    vol = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(n_cust),
            cust.c_nationkey == F.col("n1.n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n1.n_regionkey") == region.r_regionkey,
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(n_supp),
            supp.s_nationkey == F.col("n2.n_nationkey"),
        )
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n2.n_name") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("long")
                    )
                ).cast("double")
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


Q8_ORACLE = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
"""


# ---------------------------------------------- B37 TPC-H Q15 shape
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: top revenue supplier — the EQUALITY-TO-GLOBAL-MAX shape:
    aggregate revenue per supplier over a quarter, take the global max
    of that aggregate, and join the (tiny, 1-row) max back to select
    the winner(s). Like q11, both branches read the SAME per-supplier
    aggregate, so Catalyst plans a ReusedExchange — the fact table is
    scanned and shuffled once, not twice. The explicit l_suppkey
    not-null filter matters for that: the supplier equi-join INFERS it
    on the join branch only, which would make the two exchange
    subtrees canonically different and silently kill the reuse (found
    by the executed-plan audit). Revenue is rounded BEFORE the
    max/equality so parallel FP summation order cannot make the
    winner's value miss its own max. The 1-row max side is a
    broadcast-nested-loop by construction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
        & F.col("l_suppkey").isNotNull()
    )
    supp = load_table(spark, sf_dir, "supplier")
    # Exact e4 units (see q6/A35): revenue terms are exact 4-decimal
    # values, so the earlier ROUND(sum, 2) sat exactly on .xx5 points
    # where the engines round apart — worse here than a flaky hash,
    # because the max-equality join could then pick DIFFERENT winners.
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = li.groupBy("l_suppkey").agg(
        (F.sum(rev_e4) / 10000.0).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(mx, rev.total_revenue == mx.max_revenue)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) / 10000.0
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# ---------------------------------------------- B38 TPC-H Q20 shape
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the CORRELATED-THRESHOLD SEMI-JOIN CHAIN — suppliers
    who, for some PROMO part, shipped more than 20% of that part's
    total 1996 volume (the availqty > 0.5 * sum(l_quantity) analogue;
    the testdata has no partsupp, so the supplier-part relation is
    derived from lineitem). The correlated per-part total is a window
    over the ALREADY-AGGREGATED (part, supplier) set — the raw fact
    shuffles once into the groupBy; the window repartitions only the
    aggregate. Quantities are integral doubles, so the sums and the
    0.2 threshold compare exactly in both engines. The qualifying
    supplier set semi-joins the supplier table (no payload
    duplication), then a fixed-dim broadcast restricts to the target
    nations."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    per_pair = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        per_pair.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.2 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
           AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty,
           SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS part_total
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
  )
  WHERE qty > 0.2 * part_total
)
"""


# ---------------------------------------------- B39 TPC-H Q21 shape
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who kept orders waiting — the classic
    EXISTS + NOT-EXISTS double self-join on the fact table (another
    supplier contributed to the order / no OTHER supplier was late),
    re-planned as ONE aggregation: per finished order, count distinct
    suppliers, count distinct LATE suppliers (late = shipped >60 days
    after the order date — the receipt>commit analogue this schema
    supports), and keep orders with >1 supplier but exactly 1 late
    one. numwait counts that lone supplier's late LINES, matching the
    row-per-l1 semantics of the EXISTS formulation. Aggregation is
    TWO-LEVEL — per (order, supplier), then per order — because the
    direct form (two countDistinct over DIFFERENT expressions in one
    agg) plans Spark's EXPAND strategy and shuffles the fact at 3x
    volume (seen in .explain); the two-level form shuffles the fact
    once on (orderkey, suppkey) and everything after runs over the
    aggregate. The supplier name attach joins the (small) aggregate,
    never the fact."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_os = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(late, 1).otherwise(0)).alias("is_late"),
        F.sum(F.when(late, 1).otherwise(0)).alias("supp_late_lines"),
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"),
        F.sum("is_late").alias("nlate"),
        F.min(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
        F.sum(
            F.when(F.col("is_late") == 1, F.col("supp_late_lines")).otherwise(0)
        ).alias("late_lines"),
    )
    qual = per_order.filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        qual.groupBy("late_supp")
        .agg(F.sum("late_lines").alias("numwait"))
        .join(supp, F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


# ---------------------------------------------- B40 sliding window agg
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) event-time windows — 1-hour width, 15-min
    slide: each event lands in exactly width/slide = 4 windows. Spark's
    F.window(slide) plans this as a scan-side 4-row expansion feeding
    ONE hash aggregation (map-side combining) — no self-join, no
    per-offset shuffle; output cardinality is bounded by time range /
    slide regardless of input size. The batch twin of the streaming
    windowed aggs (C2/C2b), which accept the same slide parameter."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "n",
            "total_value",
        )
    )


EVENTS_SLIDING_ORACLE = """
WITH e AS (
  -- microseconds, not CAST(EPOCH(..)), which ROUNDS fractional seconds
  SELECT EPOCH_US(ts) AS us, value FROM events
), expanded AS (
  SELECT (us // 900000000 - i) * 900000000 AS wstart, value
  FROM e, UNNEST(generate_series(0, 3)) AS t(i)
)
SELECT TIMESTAMP '1970-01-01 00:00:00'
         + to_microseconds(CAST(wstart AS BIGINT)) AS window_start,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total_value
FROM expanded
GROUP BY 1
"""


# ---------------------------------------------- B41 time-series gap fill
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type: hours with no events
    appear with n=0 (the resample/fill step every downstream
    time-series consumer needs). The hour spine is GENERATED IN-PLAN —
    sequence() over the min/max hour bounds (a 1-row aggregate joined
    broadcast), exploded, cross-joined with the distinct type set —
    never a driver-side date loop; the fact aggregates BEFORE joining
    the spine, so the outer join fills from |hours x types| rows
    against |observed buckets|, both tiny next to the fact at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    return (
        spine.join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )


EVENTS_GAP_FILL_ORACLE = """
WITH bounds AS (
  SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi
  FROM events
), spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.hour, t.event_type, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
"""


# ------------------------------------- B42 ranking-function parity
def orders_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over ONE window spec — rank,
    dense_rank, percent_rank, cume_dist, ntile, lag/lead — computed in
    a single Window pass (one shuffle on the partition key, one sort;
    Spark fuses same-spec window functions into one WindowExec). The
    ORDER BY carries the PK tiebreak, so every function is
    deterministic in both engines. percent_rank/cume_dist are exact
    rationals computed identically (same operand order) — rounded only
    to normalize the textual repr."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


ORDERS_WINDOW_FUNCS_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(RANK() OVER w AS INT) AS rnk,
       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# ---------------------------------------------- B43 robust anomaly flag
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly detection: median + MAD (median absolute
    deviation) thresholding — the outlier rule that survives the
    outliers themselves, where mean/stddev get dragged by the very
    points being hunted. Two grouped percentile passes (median of
    value, then median of |value - median|) joined back, threshold
    |x - med| > k * MAD as a scan-side filter; output = per-type
    anomaly counts + the thresholds, so the result set is bounded by
    |event types| at any scale. percentile() == quantile_cont()
    definitionally (B30), making the whole rule SQL-oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    withmed = ev.join(med, "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    k = 5.0
    flagged = (
        ev.join(mad, "event_type")
        .withColumn("is_anom", F.abs(F.col("value") - F.col("med")) > k * F.col("mad"))
    )
    return flagged.groupBy("event_type").agg(
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.sum(F.when(F.col("is_anom"), 1).otherwise(0)).alias("n_anomalies"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_ANOMALY_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, m.med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1, 2
)
SELECT e.event_type,
       ROUND(MIN(m.med), 4) AS med,
       ROUND(MIN(m.mad), 4) AS mad,
       CAST(SUM(CASE WHEN abs(e.value - m.med) > 5.0 * m.mad
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       COUNT(*) AS n_events
FROM events e JOIN mad m USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------- B44 CUBE aggregation
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping combinations —
    (both), (priority), (status), (grand total) — in ONE aggregation
    pass (Spark plans an Expand of 4 grouping sets into a single hash
    agg, exactly like ROLLUP/GROUPING SETS; with B6 and B13 this
    completes the grouping-analytics family). NULL group values are
    disambiguated from genuine NULLs by grouping_id, surfaced as the
    level column so the oracle compares structurally. Totals sum in
    exact integer cents (the grand-total cell sums the WHOLE table —
    maximum exposure to the .xx5 double-rounding divergence the e4
    entries document)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("total"),
            F.grouping_id().alias("level"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "level", "n_orders", "total"
        )
    )


CUBE_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS level,
       COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------- B45 market-basket pairs
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part PAIRS with support and directed confidence — the
    size-2 association-rule pass (market-basket analysis) over order
    baskets. The pair build is a SELF-JOIN ON THE BASKET KEY, which is
    safe where the generic token self-join (banned in the bigram
    build) is not: fan-out per order is bounded by basket size (~4
    lines), so pairs grow linearly with orders, not quadratically
    with the corpus. One shuffle builds pairs, one aggregates support;
    per-part totals attach from a separate small aggregate for the
    confidence ratio. min_support prunes BEFORE the confidence join,
    so the attach handles surviving pairs only."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "okey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    totals = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    ta = totals.select(
        F.col("l_partkey").alias("part_a"), F.col("n_baskets").alias("na")
    )
    tb = totals.select(
        F.col("l_partkey").alias("part_b"), F.col("n_baskets").alias("nb")
    )
    return (
        pairs.join(ta, "part_a")
        .join(tb, "part_b")
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.col("na"), 6).alias("conf_a_to_b"),
            F.round(F.col("support") / F.col("nb"), 6).alias("conf_b_to_a"),
        )
    )


BASKET_PAIRS_ORACLE = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS support
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
totals AS (
  SELECT l_partkey, COUNT(*) AS n_baskets FROM baskets GROUP BY 1
)
SELECT part_a, part_b, support,
       ROUND(support * 1.0 / ta.n_baskets, 6) AS conf_a_to_b,
       ROUND(support * 1.0 / tb.n_baskets, 6) AS conf_b_to_a
FROM pairs
JOIN totals ta ON ta.l_partkey = part_a
JOIN totals tb ON tb.l_partkey = part_b
"""


# ------------------------------- B46 bucketed range join (r6)
_RANGE_US = 60_000_000  # ±60 s proximity window


def events_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: pure RANGE join — pair rows by time proximity alone, with
    NO equi key (unlike B10's as-of join, which is keyed per user).
    The naive plan is a cartesian/inequality join (O(n^2) compare —
    a BroadcastNestedLoopJoin Spark would happily pick); the scale
    shape BUCKETIZES time into range-width buckets and expands one
    side to its adjacent buckets, turning the range predicate into an
    EQUI join on bucket + a residual filter: each probe row meets only
    the rows of three buckets, cost O(n * density), shuffle keyed
    uniformly by time bucket. A (p, v) pair shares exactly one of the
    three expanded buckets, so no post-join dedup is needed.

    Here: for every purchase, the number of view events (any user)
    within ±60 s. Plan-audited: no cartesian/nested-loop node."""
    ev = load_table(spark, sf_dir, "events")
    # exact epoch micros (ntz -> ltz under the pinned UTC session tz)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event"), us.alias("p_us")
    )
    v = ev.filter(F.col("event_type") == "view").select(us.alias("v_us"))
    bucket_p = (F.col("p_us") / F.lit(_RANGE_US)).cast("long")
    v_expanded = v.select(
        "v_us",
        F.explode(
            F.array(
                (F.col("v_us") / F.lit(_RANGE_US)).cast("long") - 1,
                (F.col("v_us") / F.lit(_RANGE_US)).cast("long"),
                (F.col("v_us") / F.lit(_RANGE_US)).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    hits = (
        p.withColumn("bucket", bucket_p)
        .join(v_expanded, "bucket")
        .filter(F.abs(F.col("p_us") - F.col("v_us")) <= _RANGE_US)
        .groupBy("purchase_event")
        .agg(F.count(F.lit(1)).alias("n_nearby_views"))
    )
    return (
        p.select("purchase_event")
        .join(hits, "purchase_event", "left")
        .select(
            "purchase_event",
            F.coalesce(F.col("n_nearby_views"), F.lit(0)).alias(
                "n_nearby_views"
            ),
        )
    )


EVENTS_RANGE_JOIN_ORACLE = """
SELECT p.event_id AS purchase_event,
       COUNT(v.ts) AS n_nearby_views
FROM events p
LEFT JOIN events v
  ON v.event_type = 'view'
 AND ABS(EPOCH_US(p.ts) - EPOCH_US(v.ts)) <= 60000000
WHERE p.event_type = 'purchase'
GROUP BY 1
"""


# ------------------------- B47 native session_window twin of B9 (r6)
def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: gap sessionization via Spark's NATIVE ``session_window``
    aggregate — the built-in twin of B9's lag+cumsum plan (one
    merging-session aggregation instead of two window passes; the
    same operator powers streaming session windows with state-store
    merging). Boundary semantics verified identical: a gap of EXACTLY
    the threshold merges, strictly greater splits — so both
    implementations share one oracle shape. ``session_window.end`` is
    last_ts + gap (the close horizon), so session_end re-derives as
    MAX(ts) to match B9's definition."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{_GAP_MIN} minutes"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


SESSIONIZE_NATIVE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w)
                   > {_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
"""


# ------------------------------------- B48 interval-overlap join (r6)
_IVL_BUCKET_US = 21_600_000_000  # 6 h bucket width


def sessions_overlap_join(
    spark: SparkSession, sf_dir: str, handoff_bytes: int | None = None
) -> DataFrame:
    """B48: INTERVAL x INTERVAL overlap join — B46 generalized from
    point proximity to arbitrary-length intervals. For every session
    (B9's gap sessionization), count concurrent sessions of OTHER
    users (overlap = a.start <= b.end AND b.start <= a.end).

    The naive plan is an inequality self-join (cartesian). r12 shipped
    the span-bucket equi join (explode to 6-h buckets, pair kept at
    its canonical bucket) — but measured at sf0.1 the per-bucket cross
    product is the whole cost: 95 k sessions with MEDIAN span 0 s
    (avg 43 s) over a 30-day range pack ~800 intervals into each of
    120 six-hour buckets, and the equi join emits 76 M candidate rows
    before the overlap filter keeps a tiny fraction (r12 bench:
    3.44 s, top-5 in the suite).

    r13: SWEEP-LINE RANK COUNT — no pair is ever materialized. Since
    the count only needs |overlapping other sessions| and gap
    sessionization guarantees same-user sessions NEVER overlap
    (consecutive sessions are separated by > the 30-min gap), for any
    session a over ALL sessions:

        n_concurrent(a) = #{b: b.start <= a.end}
                        - #{b: b.end   <  a.start} - 1   (self)

    Both counts are order statistics over the 2n start/end points:
    one shuffle by time bucket, per-bucket running counts (window),
    plus broadcast per-bucket offsets from a bounded prefix sum (one
    row per 6-h bucket — calendar-bounded, never corpus-bounded). Ties
    resolve by sorting starts before ends at equal timestamps, which
    encodes exactly the <= / < asymmetry of the overlap predicate.
    Cost is O(n log n_bucket) with zero quadratic term; bucket width
    now only sets sweep parallelism, not candidate volume.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > _GAP_MIN * 60), 1).otherwise(0)
    sess = (
        ev.withColumn(
            "session_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("e_us"),
            F.min("ts").alias("session_start"),
        )
    )
    # The session set feeds the sweep's point stream, which is
    # consumed twice (per-bucket totals for the offsets + the ranked
    # sweep itself) — left inline, the sessionization pipeline
    # executes twice. r7/r13: SIZE-GATED handoff — when the events
    # source exceeds ``handoff_bytes`` (file metadata, no scan), the
    # session set materializes once; below the gate the recompute is
    # measured faster at sf0.1 (checkpoint write + lost pipeline
    # overlap exceed one extra sessionize).
    import os

    if handoff_bytes is None:
        handoff_bytes = 512 * 1024 * 1024  # above sf0.1 (~8 MB): bench keeps
        # the measured-faster recompute; a 100x events table crosses it
    try:
        src_bytes = os.stat(os.path.join(sf_dir, "events.parquet")).st_size
    except OSError:
        src_bytes = 0
    if src_bytes > handoff_bytes:
        sess = sess.localCheckpoint(eager=True)
    # 2n sweep points: pos 0 = session start, pos 1 = session end.
    # Sorting by (v, t) puts starts before ends at equal timestamps:
    # a start equal to a query end IS counted (<=), an end equal to a
    # query start is NOT (<) — the overlap predicate's asymmetry.
    pts = sess.select(
        "user_id",
        "session_id",
        "session_start",
        F.posexplode(F.array("s_us", "e_us")).alias("t", "v"),
    ).withColumn("bucket", F.expr(f"v div {_IVL_BUCKET_US}"))
    is_start = F.when(F.col("t") == 0, 1).otherwise(0)
    is_end = F.when(F.col("t") == 1, 1).otherwise(0)
    btot = pts.groupBy("bucket").agg(
        F.sum(is_start).alias("bs"), F.sum(is_end).alias("be")
    )
    # Bounded unpartitioned prefix sum: one row per 6-h bucket —
    # calendar-bounded (~1.5 k/year), never grows with corpus bytes
    # (the test_plan_audit boundedness register).
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bpre = btot.select(
        "bucket",
        F.coalesce(F.sum("bs").over(wb), F.lit(0)).alias("prev_s"),
        F.coalesce(F.sum("be").over(wb), F.lit(0)).alias("prev_e"),
    )
    wv = Window.partitionBy("bucket").orderBy("v", "t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Running counts are read only at the OTHER point type's rows, so
    # arbitrary tie order among identical (v, t) rows cannot change
    # them (the other type's count is constant across a tied run).
    ranked = (
        pts.join(F.broadcast(bpre), "bucket")
        .withColumn("rs", F.sum(is_start).over(wv) + F.col("prev_s"))
        .withColumn("re", F.sum(is_end).over(wv) + F.col("prev_e"))
    )
    per = ranked.groupBy("user_id", "session_id").agg(
        F.min("session_start").alias("session_start"),
        F.max(F.when(F.col("t") == 1, F.col("rs"))).alias("n_starts_le"),
        F.max(F.when(F.col("t") == 0, F.col("re"))).alias("n_ends_lt"),
    )
    return per.select(
        "user_id",
        "session_start",
        (F.col("n_starts_le") - F.col("n_ends_lt") - F.lit(1)).alias(
            "n_concurrent"
        ),
    )


SESSIONS_OVERLAP_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), agg AS (
  SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM sess GROUP BY 1, 2
)
SELECT a.user_id, a.session_start,
       COUNT(b.user_id) AS n_concurrent
FROM agg a
LEFT JOIN agg b
  ON b.user_id <> a.user_id
 AND b.session_start <= a.session_end
 AND a.session_start <= b.session_end
GROUP BY a.user_id, a.session_id, a.session_start
"""


# ------------------------------ B49 running exact distinct count (r6)
def orders_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49 (r6): CUMULATIVE EXACT DISTINCT — distinct customers ever
    seen, by month. COUNT(DISTINCT) isn't algebraic over a running
    frame: the naive plan re-scans history per month (quadratic) or
    drags a distinct-set state. The scale rewrite is the
    FIRST-OCCURRENCE trick: distinct-by-customer once (min month per
    customer — ONE keyed aggregation over the fact), count first
    appearances per month, and the running total is a prefix sum over
    the MONTHS table (tens of rows — the unpartitioned window is
    deliberate and bounded, never over the fact). Cost: one fact
    shuffle on customer, one tiny agg, one tiny window."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    first = orders.groupBy("o_custkey").agg(F.min(month).alias("month"))
    news = first.groupBy("month").agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    months = orders.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        months.join(news, "month", "left")
        .withColumn(
            "cum_distinct_customers",
            F.sum(F.coalesce("new_customers", F.lit(0))).over(w),
        )
        .select("month", "n_orders", "cum_distinct_customers")
    )


RUNNING_DISTINCT_ORACLE = """
WITH fm AS (
  SELECT o_custkey, MIN(DATE_TRUNC('month', o_orderdate)) AS m
  FROM orders GROUP BY 1
), news AS (
  SELECT m, COUNT(*) AS nw FROM fm GROUP BY 1
), months AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS m, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT months.m AS month, n_orders,
       CAST(SUM(COALESCE(news.nw, 0)) OVER (ORDER BY months.m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_customers
FROM months LEFT JOIN news ON news.m = months.m
"""


# ------------------------------- B50 as-of join with tolerance (r6)
_ASOF_TOL_S = 3 * 86400  # staleness bound: 3 days


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50 (r6): as-of join with a STALENESS BOUND — the feature-store
    form ("the latest order, but only if it is at most 3 days old"):
    an unbounded as-of (B10) happily serves a years-stale feature
    row; bounded lookback is what production serving contracts
    actually specify. Same single-shuffle merged-timeline plan as B10
    — the window additionally carries the matched order's TIME, and a
    scan-side projection nulls the match when the gap exceeds the
    tolerance. No second pass, no join."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.col("o_orderkey") * 977, 2592000)
        ).cast("timestamp_ntz").alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    timeline = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("is_order"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    order_t = F.when(F.col("is_order") == 1, F.col("t"))
    out = (
        timeline.withColumn(
            "last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_totalprice", F.last("o_totalprice", ignorenulls=True).over(w)
        )
        .withColumn("last_t", F.last(order_t, ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
    )
    fresh = (
        F.col("last_t").isNotNull()
        & (
            F.unix_micros(F.col("t").cast("timestamp"))
            - F.unix_micros(F.col("last_t").cast("timestamp"))
            <= _ASOF_TOL_S * 1_000_000
        )
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.when(fresh, F.col("last_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("last_totalprice")).alias("last_totalprice"),
    )


ASOF_TOLERANCE_ORACLE = f"""
WITH o AS (
  SELECT o_custkey AS k,
         TIMESTAMP '2024-01-01 00:00:00'
           + ((o_orderkey * 977) % 2592000) * INTERVAL 1 SECOND AS t,
         o_orderkey, o_totalprice
  FROM orders
)
SELECT e.event_id, e.user_id, e.ts,
       oo.o_orderkey AS last_orderkey,
       oo.o_totalprice AS last_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM o
  WHERE o.k = e.user_id AND o.t <= e.ts
    AND EPOCH_US(e.ts) - EPOCH_US(o.t) <= CAST({_ASOF_TOL_S} AS BIGINT) * 1000000
  ORDER BY o.t DESC, o.o_orderkey DESC
  LIMIT 1
) oo ON TRUE
"""


# --------------------------------- B51 Pareto / ABC classification (r6)
def supplier_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51 (r6): ABC (Pareto) classification — suppliers by revenue
    contribution: class A = the heads covering the first 70% of
    cumulative revenue, B = to 90%, C = the tail. The fact aggregates
    per supplier FIRST (one keyed shuffle over lineitem); the ranking
    window then runs over the SUPPLIER aggregate — dim-bounded, the
    same deliberate tiny-window rule as B49's months. Revenue in exact
    e4 integer units (the A35 rule) so cumulative shares are exact
    rationals; share thresholds compare integer cross-products
    (cum * 100 <= total * 70), no float boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * F.round((1 - F.col("l_discount")) * 100).cast("bigint")
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev_e4).alias("rev_e4")
    )
    w = Window.orderBy(F.desc("rev_e4"), "l_suppkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per_supp.agg(F.sum("rev_e4").alias("tot_e4"))
    ranked = per_supp.withColumn("cum_e4", F.sum("rev_e4").over(w)).crossJoin(
        F.broadcast(tot)
    )
    return ranked.select(
        "l_suppkey",
        (F.col("rev_e4") / 10000.0).alias("revenue"),
        F.when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 70, "A")
        .when(F.col("cum_e4") * 100 <= F.col("tot_e4") * 90, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


PARETO_ABC_ORACLE = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS rev_e4
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_suppkey, rev_e4,
         SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_suppkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_e4,
         SUM(rev_e4) OVER () AS tot_e4
  FROM per_supp
)
SELECT l_suppkey,
       CAST(rev_e4 AS DOUBLE) / 10000.0 AS revenue,
       CASE WHEN cum_e4 * 100 <= tot_e4 * 70 THEN 'A'
            WHEN cum_e4 * 100 <= tot_e4 * 90 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""


# ----------------------------- B52 deterministic per-group mode (r6)
def events_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52 (r6): exact per-group MODE with a DETERMINISTIC tiebreak —
    Spark 3.4+ ships a `mode()` aggregate but documents ties as
    nondeterministic, which fails any reproducibility contract (and
    any cross-engine oracle). The two-level shape is the portable
    answer: count per (group, value) — one shuffle with map-side
    combine — then max_by(struct(count, value)) per group picks the
    most frequent value with the LEXICOGRAPHICALLY LARGEST value on
    ties, a total order both engines agree on."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.groupBy("user_id").agg(
        F.max(F.struct("n", "event_type")).getField("event_type").alias(
            "modal_type"
        ),
        F.max(F.struct("n", "event_type")).getField("n").alias("modal_n"),
    )


EVENTS_MODE_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS modal_type, n AS modal_n FROM (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type DESC) AS rn
  FROM counts
) WHERE rn = 1
"""


# --------------------------------- B53 year-over-year growth (r6)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53 (r6): YEAR-OVER-YEAR growth by month — the comparative
    calendar window every revenue dashboard runs: each (year, month)
    bucket's order count and exact-cents revenue against the SAME
    month one year earlier (lag-12 by month key, which unlike a
    365-day shift is leap-safe). The fact aggregates first; the lag
    window runs per month-of-year over the tiny (year, month) table
    (B49's bounded-window rule). Growth in e4 basis points via
    integer floor division — both engines agree exactly; the first
    year has no prior and reports NULL."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("rev_cents"),
    )
    w = Window.partitionBy("mo").orderBy("yr")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "yr",
        "mo",
        "n_orders",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        # growth can be NEGATIVE: Spark div truncates toward zero,
        # DuckDB // floors — explicit FLOOR of the double ratio keeps
        # both engines identical (operands << 2^53, the D45 rule).
        F.when(
            prev.isNotNull() & (prev != 0),
            F.floor(
                (F.lit(10000) * (F.col("rev_cents") - prev)).cast("double")
                / prev
            ).cast("bigint"),
        ).alias("yoy_bp"),
    )


YOY_GROWTH_ORACLE = """
WITH monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mo,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1, 2
)
SELECT CAST(yr AS INT) AS yr, CAST(mo AS INT) AS mo, n_orders,
       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       CASE WHEN LAG(rev_cents) OVER w IS NOT NULL
             AND LAG(rev_cents) OVER w <> 0
            THEN CAST(FLOOR(
                 CAST(10000 * (rev_cents - LAG(rev_cents) OVER w) AS DOUBLE)
                 / LAG(rev_cents) OVER w) AS BIGINT)
       END AS yoy_bp
FROM monthly
WINDOW w AS (PARTITION BY mo ORDER BY yr)
"""


# ----------------------------- B54 RFM customer segmentation (r6)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54 (r6): RFM SEGMENTATION — recency (days since last order),
    frequency (order count), monetary (exact cents) per customer, each
    bucketed into terciles, concatenated into the classic 'RFM cell'.
    Exactness without a global sort: per dimension the customer
    aggregate collapses to a (value -> count) table (bounded by
    distinct values, not customers — recency days and order counts
    are small domains; monetary quantizes to whole dollars first),
    the D50 cumulative-window trick finds exact tercile cutoffs via
    integer cross-products, and bucketing is a broadcast-bounds
    projection. Shuffles: ONE per-customer aggregation of the fact +
    three tiny value tables."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("t_max"))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("t_max"), F.col("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .withColumn(
            "monetary_dollars", F.expr("monetary_cents div 100")
        )
    )

    def tercile_bounds(col: str):
        by_v = per_cust.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        ranked = by_v.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
            F.broadcast(by_v.agg(F.sum("cnt").alias("n")))
        )
        t1 = ranked.filter(F.col("cum") * 3 >= F.col("n")).agg(
            F.min("v").alias(f"{col}_t1")
        )
        t2 = ranked.filter(F.col("cum") * 3 >= F.col("n") * 2).agg(
            F.min("v").alias(f"{col}_t2")
        )
        return t1.crossJoin(t2)

    bounds = (
        tercile_bounds("recency_days")
        .crossJoin(tercile_bounds("frequency"))
        .crossJoin(tercile_bounds("monetary_dollars"))
    )

    def bucket(col: str):
        return (
            F.when(F.col(col) <= F.col(f"{col}_t1"), 1)
            .when(F.col(col) <= F.col(f"{col}_t2"), 2)
            .otherwise(3)
        )

    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            (F.col("monetary_cents") / 100.0).alias("monetary"),
            bucket("recency_days").alias("r_bucket"),
            bucket("frequency").alias("f_bucket"),
            bucket("monetary_dollars").alias("m_bucket"),
        )
        .withColumn(
            "rfm_cell",
            F.concat_ws(
                "", F.col("r_bucket"), F.col("f_bucket"), F.col("m_bucket")
            ),
        )
    )


RFM_ORACLE = """
WITH anchor AS (SELECT MAX(o_orderdate) AS t_max FROM orders),
per_cust AS (
  SELECT o_custkey,
         MIN(DATE_DIFF('day', o_orderdate, (SELECT t_max FROM anchor)))
           AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_cents,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100
           AS monetary_dollars
  FROM orders GROUP BY 1
),
r_b AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS cum, SUM(cnt) OVER () AS n
  FROM (SELECT recency_days AS v, COUNT(*) AS cnt FROM per_cust GROUP BY 1)
),
f_b AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS cum, SUM(cnt) OVER () AS n
  FROM (SELECT frequency AS v, COUNT(*) AS cnt FROM per_cust GROUP BY 1)
),
m_b AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS cum, SUM(cnt) OVER () AS n
  FROM (SELECT monetary_dollars AS v, COUNT(*) AS cnt FROM per_cust GROUP BY 1)
),
cuts AS (
  SELECT (SELECT MIN(v) FROM r_b WHERE cum * 3 >= n) AS r_t1,
         (SELECT MIN(v) FROM r_b WHERE cum * 3 >= n * 2) AS r_t2,
         (SELECT MIN(v) FROM f_b WHERE cum * 3 >= n) AS f_t1,
         (SELECT MIN(v) FROM f_b WHERE cum * 3 >= n * 2) AS f_t2,
         (SELECT MIN(v) FROM m_b WHERE cum * 3 >= n) AS m_t1,
         (SELECT MIN(v) FROM m_b WHERE cum * 3 >= n * 2) AS m_t2
)
SELECT p.o_custkey, p.recency_days, p.frequency,
       CAST(p.monetary_cents AS DOUBLE) / 100.0 AS monetary,
       CASE WHEN p.recency_days <= c.r_t1 THEN 1
            WHEN p.recency_days <= c.r_t2 THEN 2 ELSE 3 END AS r_bucket,
       CASE WHEN p.frequency <= c.f_t1 THEN 1
            WHEN p.frequency <= c.f_t2 THEN 2 ELSE 3 END AS f_bucket,
       CASE WHEN p.monetary_dollars <= c.m_t1 THEN 1
            WHEN p.monetary_dollars <= c.m_t2 THEN 2 ELSE 3 END AS m_bucket,
       CAST(CASE WHEN p.recency_days <= c.r_t1 THEN 1
            WHEN p.recency_days <= c.r_t2 THEN 2 ELSE 3 END AS VARCHAR)
       || CAST(CASE WHEN p.frequency <= c.f_t1 THEN 1
            WHEN p.frequency <= c.f_t2 THEN 2 ELSE 3 END AS VARCHAR)
       || CAST(CASE WHEN p.monetary_dollars <= c.m_t1 THEN 1
            WHEN p.monetary_dollars <= c.m_t2 THEN 2 ELSE 3 END AS VARCHAR)
         AS rfm_cell
FROM per_cust p, cuts c
"""


# ------------------------------ B55 TPC-H Q17 small-quantity revenue (r7)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B55 (r7): TPC-H Q17 verbatim shape — revenue lost if small-
    quantity orders (below 20% of the part's average quantity) for one
    brand/type slice were no longer filled. B12 carries the bare
    decorrelated-subquery shape; this is the production query around
    it: the dim filter lands FIRST (part is pruned to a few dozen keys
    before anything joins), the per-part average is computed only over
    lineitems of the surviving parts (semi-join pushdown of the dim
    filter INTO the subquery — at 100 TB the difference between
    aggregating the whole fact and aggregating 0.1% of it), and the
    filtered dim side is broadcast so the fact never shuffles. Final
    sum in exact integer cents (engines disagree in the last ulp of a
    parallel double sum; bigint cents cannot)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    # Dim-filtered fact: both the avg subquery and the outer scan read
    # only this slice — one broadcast semi-join, reused.
    sliced = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = sliced.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        sliced.join(F.broadcast(avg_qty), on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(F.sum(cents) / 700.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q17_ORACLE = """
WITH p AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#4' AND p_type = 'MEDIUM'
),
sliced AS (
  SELECT l.* FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
),
avg_qty AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
  FROM sliced GROUP BY l_partkey
)
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 700.0, 2)
         AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM sliced s JOIN avg_qty a ON s.l_partkey = a.l_partkey
WHERE s.l_quantity < a.qty_limit
"""


# --------------------------- B56 TPC-H Q22 dormant high-balance (r7)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56 (r7): TPC-H Q22 shape adapted to the harness schema (no
    c_phone column, so the country-code substring becomes the nation
    key directly): per nation, count customers whose balance is above
    the average positive balance AND who have placed no order since
    2000-06-01 — the 'wealthy but dormant' report. The global-average
    threshold is an exact INTEGER cross-multiplication (bal_cents * n
    > sum_cents), never a double divide: a customer a hair's breadth
    from the mean classifies identically on every engine. The recent-
    orders side is date-pruned before the LEFT ANTI join (predicate
    reaches the parquet scan), and the 2-value threshold row is a
    broadcast cross join — the only shuffles are the anti join and
    the final nation aggregation."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    eligible = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("n") > F.col("s")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-06-01")
        .select("o_custkey")
    )
    return (
        eligible.join(
            recent, eligible.c_custkey == recent.o_custkey, "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
    )


Q22_ORACLE = """
WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
pos AS (
  SELECT SUM(bal_cents) AS s, COUNT(*) AS n FROM cents WHERE bal_cents > 0
),
no_recent AS (
  SELECT c.* FROM cents c, pos
  WHERE c.bal_cents * pos.n > pos.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
    )
)
SELECT c_nationkey, COUNT(*) AS numcust,
       ROUND(SUM(bal_cents) / 100.0, 2) AS totacctbal
FROM no_recent GROUP BY c_nationkey
"""
