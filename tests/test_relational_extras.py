"""Semantics tests for the round-5 analytics additions that are not
fully captured by the SQL-oracle harness: the approx-quantile sketch
tier's error bound, and CDC diff classification invariants."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES


def test_approx_quantiles_within_rank_window(spark):
    """The sketch guarantee is on RANK, not value: approx_percentile
    returns an actual sample whose rank is within the accuracy bound,
    so in a heavy tail its VALUE may sit a whole order statistic away
    from the interpolated exact quantile. Assert each approx value
    falls between the exact quantiles at q +/- 0.05 — a generous rank
    window the sketch must beat at any data size."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    approx = {
        r.event_type: r
        for r in QUERIES["events_quantiles_approx"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.expr(f"percentile(value, {q})").alias(f"b{i}")
                for i, q in enumerate(
                    [0.45, 0.55, 0.85, 0.95, 0.94, 1.0]
                )
            ]
        )
        .collect()
    }
    assert approx.keys() == bounds.keys()
    for et, a in approx.items():
        b = bounds[et]
        assert b.b0 <= a.p50 <= b.b1, (et, "p50", a.p50, b.b0, b.b1)
        assert b.b2 <= a.p90 <= b.b3, (et, "p90", a.p90, b.b2, b.b3)
        assert b.b4 <= a.p99 <= b.b5, (et, "p99", a.p99, b.b4, b.b5)


def test_table_diff_cdc_classification_counts(spark):
    """The planted mutation recipe fixes the class structure: every
    11th key appears as 'added' (+10M echo), every 13th as 'removed',
    and 'changed' keys are exactly the re-priced (%7) keys that were
    not also removed. No key may appear twice."""
    rows = QUERIES["table_diff_cdc"].builder(spark, SF_SMOKE).collect()
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))
    by = {}
    for r in rows:
        by.setdefault(r.change, set()).add(r.o_orderkey)
    assert all(k >= 10_000_000 and (k - 10_000_000) % 11 == 0 for k in by["added"])
    assert all(k % 13 == 0 for k in by["removed"])
    assert all(k % 7 == 0 and k % 13 != 0 for k in by["changed"])


def test_funnel3_matches_bruteforce_reference(spark):
    """Randomized cross-check: the two-window funnel must equal a
    direct per-purchase reference computed row-at-a-time in Python
    (for each purchase: the latest click that itself had a view within
    the hop window, both hops bounded). Three seeds, dense event mixes
    so every branch (no view, stale view, stale click, conversion)
    occurs."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    HOP = 100  # work in small integer "us" units

    def reference(rows):
        out = []
        by_user = {}
        for r in rows:
            by_user.setdefault(r[0], []).append(r)
        for uid, evs in by_user.items():
            evs.sort(key=lambda r: (r[3], r[1]))
            for i, (u, eid, et, us) in enumerate(evs):
                if et != "purchase":
                    continue
                last_qual_click = None
                for (u2, eid2, et2, us2) in evs[:i]:
                    if et2 != "click":
                        continue
                    last_view = max(
                        (us3 for (_, eid3, et3, us3) in evs
                         if et3 == "view" and (us3, eid3) < (us2, eid2)),
                        default=None,
                    )
                    if last_view is not None and us2 - last_view <= HOP:
                        if last_qual_click is None or us2 > last_qual_click:
                            last_qual_click = us2
                if last_qual_click is not None and us - last_qual_click <= HOP:
                    out.append((uid, eid, us - last_qual_click))
        return sorted(out)

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rows = [
            (
                rng.randrange(4),                      # user
                eid,                                   # event id
                rng.choice(["view", "click", "purchase", "other"]),
                rng.randrange(500),                    # time
            )
            for eid in range(120)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, us long"
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        last_view = F.max(
            F.when(F.col("event_type") == "view", F.col("us"))
        ).over(w)
        staged = df.withColumn("lv", last_view).withColumn(
            "lqc",
            F.max(
                F.when(
                    (F.col("event_type") == "click")
                    & F.col("lv").isNotNull()
                    & (F.col("us") - F.col("lv") <= HOP),
                    F.col("us"),
                )
            ).over(w),
        )
        got = sorted(
            (r.user_id, r.event_id, r.us - r.lqc)
            for r in staged.filter(
                (F.col("event_type") == "purchase")
                & F.col("lqc").isNotNull()
                & (F.col("us") - F.col("lqc") <= HOP)
            ).collect()
        )
        assert got == reference(rows), f"seed {seed}"


def test_transitive_closure_matches_bruteforce_reachability(spark):
    """Randomized cross-check on arbitrary digraphs (cycles included):
    the pointer-doubled closure must equal BFS reachability."""
    import random

    from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
        transitive_closure,
    )

    for seed in (3, 11):
        rng = random.Random(seed)
        nodes = [f"v{i}" for i in range(14)]
        edges = sorted(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(25)
            }
        )
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
        want = set()
        for start in nodes:
            seen, frontier = set(), {start}
            while frontier:
                nxt = set()
                for x in frontier:
                    for y in adj.get(x, ()):
                        if y not in seen:
                            seen.add(y)
                            nxt.add(y)
                frontier = nxt
            want |= {(start, t) for t in seen}
        df = spark.createDataFrame(edges, "child string, parent string")
        got = {
            (r.node, r.ancestor) for r in transitive_closure(df).collect()
        }
        assert got == want, f"seed {seed}"


def test_grouped_trend_matches_builtin_regression(spark):
    """The applyInPandas fit must agree with Spark's own distributed
    regr_slope/regr_intercept aggregates to rounding — a JVM-side
    cross-check independent of the DuckDB oracle."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.operators.stats import grouped_trend
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    pandas_fit = {
        r.event_type: r for r in grouped_trend(ev).collect()
    }
    x = F.unix_micros(F.col("ts").cast("timestamp")) / 3.6e9
    builtin = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("regr_slope(value, unix_micros(cast(ts as timestamp)) / 3.6e9)").alias("slope"),
            F.expr("regr_intercept(value, unix_micros(cast(ts as timestamp)) / 3.6e9)").alias("intercept"),
        )
        .collect()
    }
    assert pandas_fit.keys() == builtin.keys()
    for et, p in pandas_fit.items():
        b = builtin[et]
        assert abs(p.slope - b.slope) < 1e-6, (et, p.slope, b.slope)
        assert abs(p.intercept - b.intercept) < 1e-3, (et, p.intercept, b.intercept)


def test_range_join_bucketing_equals_naive_on_random_times(spark):
    """B46 property: the bucket-expansion plan must equal the naive
    inequality join for ARBITRARY timestamp distributions — including
    exact bucket-boundary collisions, where an off-by-one in the
    adjacent-bucket expansion or the residual filter would first show
    up. Randomized but seeded (hypothesis-style fuzz without a Spark
    session per example: one session, many generated datasets)."""
    import random

    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.plans.relational import (
        _RANGE_US,
    )

    rng = random.Random(0xB46)
    for trial in range(5):
        n = 120
        # Cluster times around multiples of the range width so pairs
        # frequently straddle exact bucket boundaries.
        rows = []
        for i in range(n):
            base = rng.randrange(0, 40) * _RANGE_US
            jitter = rng.choice(
                [0, 1, -1, _RANGE_US // 2, _RANGE_US - 1, -_RANGE_US + 1]
            )
            ts = max(0, base + jitter) + 86_400_000_000
            rows.append(
                (i, ts, "purchase" if i % 3 == 0 else "view")
            )
        df = spark.createDataFrame(rows, "event_id long, us long, event_type string")
        p = df.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_event"), F.col("us").alias("p_us")
        )
        v = df.filter("event_type = 'view'").select(F.col("us").alias("v_us"))
        naive = (
            p.crossJoin(v)
            .filter(F.abs(F.col("p_us") - F.col("v_us")) <= _RANGE_US)
            .groupBy("purchase_event")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        bucket_p = (F.col("p_us") / F.lit(_RANGE_US)).cast("long")
        b = (F.col("v_us") / F.lit(_RANGE_US)).cast("long")
        v_exp = v.select(
            "v_us", F.explode(F.array(b - 1, b, b + 1)).alias("bucket")
        )
        bucketed = (
            p.withColumn("bucket", bucket_p)
            .join(v_exp, "bucket")
            .filter(F.abs(F.col("p_us") - F.col("v_us")) <= _RANGE_US)
            .groupBy("purchase_event")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {tuple(r) for r in bucketed.collect()}
        want = {tuple(r) for r in naive.collect()}
        assert got == want, f"trial {trial}: bucketing diverged from naive"


def test_interval_overlap_pairs_fuzz_vs_naive(spark):
    """B48 core: the bucketed exactly-once pair set must equal the
    naive inequality join on adversarial intervals — identical starts,
    zero length, bucket-boundary touching, spans crossing many
    buckets, exact-touch overlaps (a.end == b.start)."""
    import random

    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.operators.stats import (
        interval_overlap_pairs,
    )

    rng = random.Random(42)
    W = 100
    rows = []
    for i in range(120):
        s = rng.choice(
            [0, 99, 100, 101, 250, 500, rng.randrange(0, 1000)]
        )
        ln = rng.choice([0, 1, W - 1, W, W + 1, 3 * W, rng.randrange(0, 400)])
        rows.append((i, i % 7, s, s + ln))
    df = spark.createDataFrame(rows, "iid int, grp int, s int, e int")
    got = {
        (r["a_iid"], r["b_iid"])
        for r in interval_overlap_pairs(
            df,
            id_cols=["iid", "grp"],
            start_col="s",
            end_col="e",
            bucket_width=W,
            self_match=F.col("a_iid") != F.col("b_iid"),
        ).collect()
    }
    naive = {
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[0] != b[0] and a[2] <= b[3] and b[2] <= a[3]
    }
    assert got == naive
