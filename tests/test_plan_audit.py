"""Explain-plan audits (SURVEY.md §6): the physical plans the engine
produces must be the plans we would ship to a 1000-executor cluster.

These tests read ``explain("formatted")`` output and assert the
properties that decide 100 TB viability — broadcast joins on dims,
parquet filter pushdown + column pruning, no cartesian products, and
single-shuffle aggregation/upsert shapes. A regression here means a
query silently picked a plan that works at sf0.1 and dies at sf1000.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE


def plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_shuffles(plan: str) -> int:
    """Count data shuffles (hash/range exchanges) from the formatted
    plan's detail headers — one ``(N) Exchange`` line per operator.
    Broadcast exchanges are not shuffles."""
    return plan.count(") Exchange")


def build(spark, name: str) -> str:
    return plan_of(QUERIES[name].builder(spark, SF_SMOKE))


# Every oracle-backed batch query must compile to a plan with no
# cartesian product (the one O(n^2) shape that can never scale). The
# brute-force pairwise ops are exempt BY DESIGN (they are the
# correctness tier; their scale path is the LSH variant).
_CARTESIAN_OK = {
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",  # gram-join is keyed; listed defensively
    "ann_bruteforce_topk",  # broadcast-cross by design (query set is small)
    "stream_windowed_agg",  # streaming: explain needs a started query
    "stream_incremental_upsert",
}


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n not in _CARTESIAN_OK)
)
def test_no_cartesian_product(spark, name):
    plan = build(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_index_documents_broadcasts_dims_and_prunes(spark):
    plan = build(spark, "index_documents")
    # nation + region + (AQE may also choose the pre-agg sides)
    assert plan.count("BroadcastHashJoin") >= 2
    # Column pruning: the customer scan must not read c_acctbal/c_address,
    # and the lineitem leg reads only (l_orderkey, l_extendedprice,
    # l_shipdate) — never the rest of the fact row.
    assert "c_acctbal" not in plan
    assert "l_discount" not in plan and "l_returnflag" not in plan


def test_q5_star_join_broadcasts_fixed_dims(spark):
    plan = build(spark, "q5_local_volume")
    # The fixed-size dims (nation, region) are hint-broadcast; at smoke
    # sf Catalyst's size estimates broadcast the rest too, so >= 2.
    assert plan.count("BroadcastHashJoin") >= 2


# Queries that join sf-scaled tables (customer/supplier/part) → the
# number of broadcast joins their plan may contain when size-based
# broadcasting is DISABLED: exactly the explicit fixed-dim hints.
_FIXED_DIM_HINTS = {
    "q3_shipping_priority": 0,
    "q5_local_volume": 2,  # nation + region
    "topk_per_group": 0,
    "q7_volume_shipping": 2,  # the two nation aliases
    "q19_discounted_revenue": 0,
    "q9_product_profit": 1,   # nation (25 rows, fixed)
    "q10_returned_items": 1,  # nation
    "q14_promo_revenue": 0,
    "q16_supplier_count": 0,  # exclusion set is sf-scaled: no hint
    "q18_large_orders": 0,
    # q11's only hint is the 1-row global-threshold aggregate, which
    # plans as BroadcastNestedLoopJoin (keyless cross join), not BHJ.
    "q11_important_parts": 0,
    "q6_revenue_forecast": 0,
    "q8_market_share": 3,  # the two nation aliases + region
    "q15_top_supplier": 0,  # 1-row max side is BNLJ, not BHJ
    "q20_part_promotion": 1,  # nation
    "q21_waiting_suppliers": 0,
}


@pytest.mark.parametrize("name", sorted(_FIXED_DIM_HINTS))
def test_no_forced_broadcast_of_sf_scaled_tables(spark, name):
    """With autoBroadcastJoinThreshold=-1 a BroadcastHashJoin can only
    come from an explicit hint. sf-scaled tables (customer/supplier/
    part — they grow linearly with scale factor) must never be
    hint-broadcast: a hint overrides Catalyst's size check and OOMs
    executors at 100×. Only the fixed-size dims (nation=25, region=5
    rows) may keep hints."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = build(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    got = plan.count(") BroadcastHashJoin")
    want = _FIXED_DIM_HINTS[name]
    assert got == want, (
        f"{name}: {got} hinted broadcast joins, expected {want} "
        f"(a forced broadcast of an sf-scaled table crept back in)\n{plan}"
    )


def _stream_plan_builders():
    """Every UNSTARTED streaming plan builder exposed by streaming/sync
    (functions named ``*_plan``) — the streaming half of the forced-
    broadcast sweep. Discovery is by naming convention so a new
    stream-static join cannot be added without entering this sweep
    (the r4 C6 defect — a hinted broadcast of sf-scaled customer —
    got through because only batch registry entries were swept)."""
    import inspect

    from prefect_flow_arc_kg_postgres_etl_spark.streaming import sync

    return {
        name: fn
        for name, fn in inspect.getmembers(sync, inspect.isfunction)
        if name.endswith("_plan")
    }


def test_streaming_module_exposes_plan_builders():
    # The sweep below is only meaningful if the convention holds.
    assert "enrich_plan" in _stream_plan_builders()


@pytest.mark.parametrize("name", sorted(_stream_plan_builders()))
def test_no_forced_broadcast_in_streaming_plans(spark, name):
    """Streaming twin of the batch sweep above: with size-based
    broadcasting disabled, a BroadcastHashJoin in a streaming plan can
    only come from an explicit hint — and no streaming builder joins a
    fixed-size dim today, so the allowed hint count is zero. The static
    side of a stream-static join is re-planned per micro-batch, so a
    forced broadcast of an sf-scaled table OOMs exactly like the batch
    case, once per micro-batch."""
    builder = _stream_plan_builders()[name]
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(builder(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    got = plan.count(") BroadcastHashJoin")
    assert got == 0, (
        f"{name}: {got} hinted broadcast joins in a streaming plan "
        f"(forced broadcast of an sf-scaled static side)\n{plan}"
    )


def test_q1_pushes_filter_to_scan(spark):
    plan = build(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_single_shuffle(spark):
    # groupBy with partial aggregation: exactly one data exchange.
    plan = build(spark, "q1_pricing_summary")
    assert n_shuffles(plan) == 1, plan


def test_merge_upsert_single_shuffle_on_pk(spark):
    """Upsert = union + window dedup: ONE hash exchange on the PK (the
    window's partitionBy), not a join + a sort + an extra exchange.
    WindowGroupLimit must also run BEFORE the exchange (partial top-1
    per key map-side)."""
    plan = build(spark, "merge_upsert")
    assert n_shuffles(plan) == 1, plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_minhash_lsh_no_wide_rows_on_pair_shuffle(spark):
    """The candidate-pair join must join on (band, bh) hash keys and
    must NOT carry the 64-long signature arrays through the pair
    shuffle (they re-attach afterwards from the per-doc table)."""
    plan = build(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "xxhash64" in plan.lower() or "HashAggregate" in plan


def test_scans_prune_columns(spark):
    """kg_melt reads exactly the melted columns, nothing else."""
    plan = build(spark, "kg_melt_triples")
    assert "ReadSchema" in plan
    assert "c_address" not in plan and "c_phone" not in plan


def test_org_scope_is_broadcast_semi_join(spark):
    plan = build(spark, "org_scope")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_ivf_probe_join_is_broadcast_equi(spark):
    """IVF: centroid assignment is scan-side against a ONE-ROW broadcast
    centroid table (the two BroadcastNestedLoopJoins with a single build
    row — constant-size, shuffle-free); the probe side broadcasts into
    an equi-join on cluster id — never a cross join of queries x
    corpus."""
    plan = build(spark, "ann_ivf_topk")
    assert "CartesianProduct" not in plan
    # exactly the two single-row centroid attaches, nothing data-sized
    # (detail headers — formatted explain prints each node twice)
    assert plan.count(") BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan


def test_batch_stage_no_global_window(spark):
    """Batch ids are hash buckets: no Window (a per-table row_number
    would funnel each table through ONE reducer), the only joins are the
    broadcast of the tiny per-table count."""
    plan = build(spark, "batch_stage")
    assert "Window" not in plan, "batch_stage regressed to a global window"
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan


def test_embedding_lsh_is_bucketed_not_cross(spark):
    """The embedding near-dup SCALE path: candidate generation must be
    an equi-join on (band, bucket) — the whole point vs the quadratic
    tier — and signatures/vectors must re-attach after the pair
    distinct."""
    plan = build(spark, "dedup_embedding_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # the pair distinct


def test_exists_anti_pushes_filter_and_broadcasts(spark):
    """Anti-join: the o_orderpriority filter reaches the orders scan
    (the anti side shrinks before the join, not after)."""
    plan = build(spark, "exists_anti")
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority," in plan
    assert "LeftAnti" in plan


def test_correlated_subquery_decorrelates_to_one_agg_join(spark):
    """Q17 shape: no per-row subquery — one aggregation over lineitem
    joined back on partkey."""
    plan = build(spark, "correlated_subquery")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final of the avg


def test_construct_optional_values_pushed_to_scan(spark):
    """VALUES in-lists must reach the triples scan as In filters on the
    object column, not post-join filters. (The triples here come from a
    melt projection, so the filter shows as a Filter over the generator,
    before any join.)"""
    plan = build(spark, "kg_construct_optional")
    assert "CartesianProduct" not in plan
    # OPTIONAL group compiles to a left outer join
    assert "LeftOuter" in plan or "left_outer" in plan.lower()
    # The staged triple store is partitioned by predicate, so every
    # pattern scan must partition-prune to its posting list.
    assert "PartitionFilters: [isnotnull(predicate" in plan


def test_incremental_since_ts_filter_reaches_parquet_scan(spark):
    """The SINCE timestamp filter must be in PushedFilters — possible
    only when the physical ts column is a native parquet timestamp that
    the catalog passes through unwrapped. If the harness regenerates
    events.ts as an int64 epoch, apply_epoch_conversions necessarily
    wraps ts in a conversion expression, pushdown is structurally
    impossible on the raw file, and the right plan is to normalize into
    a staged store copy first (sources/store.py) — so the assertion is
    parametrized by the PROBED physical type rather than going red on a
    harness regeneration (r4 ADVICE)."""
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import read_raw

    raw_dtype = dict(
        read_raw(spark, f"{SF_SMOKE}/events.parquet").dtypes
    )["ts"]
    plan = build(spark, "incremental_since")
    if raw_dtype == "bigint":
        pytest.skip(
            "events.ts shipped as int64 epoch this round: the conversion "
            "expression blocks raw-file pushdown by construction; the "
            "staged-store normalization path restores it"
        )
    assert "GreaterThan(ts" in plan.split("PushedFilters")[1].split("]")[0]


def test_gram_build_evaluated_once_no_inferred_filter(spark):
    """The tokenize+gram-hash expression must appear EXACTLY once in the
    signature plan and never inside a Filter. Exploding a projected gram
    column lets InferFiltersFromGenerate clone the whole subtree into a
    pre-Generate filter (~3x per-row re-evaluation; measured 8x wall
    slowdown on the signature build) — this pins the direct-expression
    explode shape that avoids the rule."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.dedup import (
        minhash_signatures,
    )
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    plan = plan_of(minhash_signatures(load_table(spark, SF_SMOKE, "documents")))
    assert plan.count("transform(sequence") == 1
    assert not any(
        "xxhash64" in line for line in plan.splitlines() if "Filter" in line
    )


def test_dedup_scan_budgets(spark):
    """Corpus-pass budget for the dedup pipelines: every occurrence of
    the documents scan in the plan is a full 100 TB read at scale. The
    verified pipeline skips the unused est_jaccard signature re-joins
    (include_estimate=False), so it must stay at/below the standalone
    candidate generator's scan count, and neither may regress past its
    audited shape (explain lists each scan twice: tree + detail)."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.dedup import (
        lsh_verified_pairs,
        minhash_lsh_candidates,
    )
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    verified = plan_of(lsh_verified_pairs(docs, 0.8)).count("documents.parquet")
    with_est = plan_of(minhash_lsh_candidates(docs)).count("documents.parquet")
    # r6: the verify legs + size table read the MATERIALIZED gram
    # checkpoint, so only the signature subtree still scans the corpus
    # (the explain lists it tree + detail = 2 occurrences; was <= 6).
    assert verified <= 2, f"verified pipeline scans grew: {verified}"
    assert with_est <= 12, f"estimate path scans grew: {with_est}"


def test_sample_stratified_is_pure_scan_filter(spark):
    """The sampling decision is a scan-side filter — zero exchanges, so
    at 100 TB it is one pass with no shuffle at all."""
    plan = build(spark, "corpus_sample_stratified")
    assert n_shuffles(plan) == 0
    assert "BroadcastExchange" not in plan


def test_pack_sequences_single_window_shuffle(spark):
    """Packing = one window pass partitioned by the shard key; anything
    beyond the single hash exchange (plus the token-stats projection)
    would mean a global sort crept in."""
    plan = build(spark, "corpus_pack_sequences")
    assert n_shuffles(plan) <= 2, plan  # window partition (+ join w/ shard col)
    assert "rangepartitioning" not in plan.lower(), "global sort in pack plan"


def test_decontaminate_never_shuffles_train_corpus(spark):
    """Both the contamination probe (semi) and the survivor filter
    (anti) must reach the train side as BROADCAST joins — a sort-merge
    or shuffled-hash join would shuffle the full 100 TB corpus. The
    only hash exchanges allowed are the tiny broadcast-side distincts
    (eval gram set, contaminated id set)."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.curation import (
        decontaminate,
    )
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bench = docs.filter("doc_id % 10 = 0")
    train = docs.filter("doc_id % 10 <> 0")
    plan = plan_of(decontaminate(train, bench, n=8))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi probe + anti filter


def test_pii_and_repetition_are_scan_side(spark):
    """The per-doc text features are pure scan projections — the only
    exchange allowed is the corpus _spread round-robin (a test-data
    artifact; at scale the scan has thousands of splits and it
    disappears). Nothing may aggregate or join."""
    for name in ("text_pii_redact", "text_repetition"):
        plan = build(spark, name)
        assert n_shuffles(plan) <= 1, f"{name} grew a shuffle:\n{plan}"
        assert "Join" not in plan and "HashAggregate" not in plan, name


def test_funnel_single_window_shuffle_no_join(spark):
    """The funnel must stay a window pass — a regression to a range
    self-join would be O(events x events) per user at scale."""
    plan = build(spark, "events_funnel")
    assert "Join" not in plan, "funnel regressed to a self-join"
    assert n_shuffles(plan) == 1, plan


def test_q4_pushes_date_filter_to_orders_scan(spark):
    plan = build(spark, "q4_order_priority")
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "GreaterThanOrEqual(o_orderdate" in pushed
    assert "LeftSemi" in plan


def test_q2_scans_fact_once(spark):
    """The decorrelated min must be a WINDOW over the aggregated set,
    not a second agg + self-join: Spark doesn't reuse subplans across
    branches, so the agg+join form scans the fact twice — at 100 TB
    that is a doubled read of the largest table."""
    plan = build(spark, "q2_min_cost_supplier")
    assert plan.count("lineitem.parquet") == 1, (
        "q2 regressed to a double fact scan\n" + plan
    )


def test_q11_threshold_branch_reuses_fact_exchange(spark):
    """The global-threshold branch must read the REUSED per-part
    shuffle, not re-scan the fact: both branches hang off the same
    hashpartitioning(l_partkey) exchange and Spark's ReuseExchange
    dedupes them at execution. Checked on the EXECUTED plan (the
    static plan prints both subtrees; reuse is applied physically)."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES

    df = QUERIES["q11_important_parts"].builder(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, (
        "q11 lost exchange reuse — the fact is scanned twice\n" + plan
    )


def test_q15_max_branch_reuses_supplier_exchange(spark):
    """q15's max-revenue branch must read the REUSED per-supplier
    aggregate, not re-scan/re-shuffle the fact — same contract as q11,
    checked on the executed plan where ReuseExchange is applied."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES

    df = QUERIES["q15_top_supplier"].builder(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, (
        "q15 lost exchange reuse — the fact is scanned twice\n" + plan
    )


def test_q6_all_predicates_reach_the_scan(spark):
    """Q6 is the canonical pushdown query: every WHERE predicate is a
    native-column comparison, so ALL of them must appear as
    PushedFilters on the lineitem parquet scan."""
    plan = build(spark, "q6_revenue_forecast")
    for field in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"GreaterThan({field}" in plan or f"LessThan({field}" in plan or (
            f"GreaterThanOrEqual({field}" in plan
        ) or f"LessThanOrEqual({field}" in plan, (
            f"q6: no pushed filter on {field}\n{plan}"
        )


def test_bucketed_join_has_zero_shuffle_exchanges(spark):
    """The co-located join's whole point: with both facts bucketed on
    the join key, the join AND the same-key aggregation after it must
    consume the storage partitioning — no ShuffleExchange anywhere in
    the executed plan (Sort nodes are fine; shuffles are not)."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES

    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_join_colocated"].builder(spark, SF_SMOKE)
        df.write.format("noop").mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join reintroduced a shuffle\n" + plan
    )
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, (
        "scan is not bucket-aware\n" + plan
    )


def test_q9_pushes_part_filter_and_broadcasts_nation_only(spark):
    plan = build(spark, "q9_product_profit")
    assert "StringContains(p_name,red)" in plan
    # exactly one hinted fixed-size dim (checked in the sweep above) and
    # the p_name prune must reach the part scan, not a post-join filter.


def test_bigram_lm_no_token_self_join(spark):
    """Bigrams must come from the scan-side list zip — a regression to
    exploded-token self-join doubles the corpus shuffle and explodes
    skewed tokens quadratically."""
    plan = build(spark, "corpus_bigram_lm")
    assert "Join" not in plan, "bigram_lm regressed to a token self-join"


def test_mix_sample_corpus_never_shuffled_by_thresholds(spark):
    """The mixture filter must apply via broadcast of the tiny
    per-source threshold table: the corpus side of the final join may
    not hash-shuffle (counts and the 1-row binding ratio are the only
    aggregates)."""
    plan = build(spark, "corpus_mix_sample")
    # the corpus appears once under a BroadcastHashJoin probe side; a
    # SortMergeJoin would mean the corpus was shuffled on source.
    assert "SortMergeJoin" not in plan, plan


def test_partitioned_write_read_prunes_partitions(spark, tmp_path):
    """Partition-layout discipline: a filtered read over a
    partitionBy() dataset must show PartitionFilters at the scan (file
    pruning by directory), not a post-scan filter over every file —
    at 100 TB the difference is reading one org's files vs all of
    them. Pins the layout contract batch_stage/es_bulk_feed rely on."""
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    out = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    got = spark.read.parquet(out).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = plan_of(got)
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_orderpriority" in seg and "1-URGENT" in seg, plan
    n = got.count()
    assert n > 0


def test_dynamic_partition_pruning_from_join_filter(spark, tmp_path):
    """Join-driven pruning (DPP): when the partitioned fact joins a
    FILTERED dim on the partition column, the dim's survivor values
    must prune fact partitions at runtime — the scan carries a
    dynamicpruningexpression, not a read-everything-then-filter plan.
    At 100 TB this is the difference between scanning two priorities'
    directories and scanning all of them, decided without a literal
    filter on the fact."""
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    out = str(tmp_path / "orders_dpp")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)
    # DPP only fires when the build side carries a SELECTIVE predicate
    # (a bare local relation is skipped by the planner's benefit check).
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("3-MEDIUM", 3), ("5-LOW", 9)],
        "prio string, rank int",
    ).filter(F.col("rank") <= 3)
    got = fact.join(
        F.broadcast(dim), fact.o_orderpriority == dim.prio
    ).groupBy("prio").count()
    plan = plan_of(got)
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic partition pruning on the fact scan\n" + plan
    )
    counts = {r.prio: r["count"] for r in got.collect()}
    assert set(counts) == {"1-URGENT", "3-MEDIUM"} and all(
        v > 0 for v in counts.values()
    )


def test_interval_overlap_join_is_bucketed_not_nested_loop(spark):
    """B48: the interval-overlap predicate must reach the executor as an
    EQUI join on the span bucket — never the inequality-only
    BroadcastNestedLoopJoin Spark would pick for a raw overlap join."""
    plan = build(spark, "sessions_overlap_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # Hash-keyed on the span bucket (BHJ at smoke scale, SMJ/SHJ at
    # 100 TB — any of them proves the equi rewrite reached the planner).
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


@pytest.mark.parametrize(
    "name",
    [
        "corpus_chunk_overlap",
        "embedding_random_projection",
        "corpus_quality_resample",
        "alto_transcript_extract",
    ],
)
def test_scan_fused_ops_have_no_exchange(spark, name):
    """D40/D41/D43/D54 claim to be pure scan-side projections/
    generators — a shuffle appearing in any of these plans is a
    regression."""
    plan = build(spark, name)
    assert "Exchange" not in plan, f"{name} grew a shuffle"


def _unpartitioned_windows(plan: str) -> int:
    """Count window specs with NO partition keys — the formatted plan
    prints ``windowspecdefinition(<order cols>, specifiedwindowframe``
    for those, vs ``windowspecdefinition(<part cols>, <order cols>,
    ...)`` when partitioned. Distinguish by whether any argument before
    the frame is a bare order spec only — cheapest reliable signal is
    the runtime WindowExec warning, but plans are static here, so count
    specs whose argument list has no partition segment: every ordered
    col carries ASC/DESC, partition cols don't."""
    import re

    n = 0
    for m in re.finditer(r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan):
        args = m.group(1)
        head = args.split(",")[0].strip()
        # partitioned specs lead with a bare column (no sort direction);
        # unpartitioned specs lead with an ordered column
        if " ASC" in head or " DESC" in head:
            n += 1
    return n


def test_vocabulary_rank_is_partitioned():
    """D24 (r7/r8): at scale the dense-id rank must be the two-phase
    form — a row_number PARTITIONED by the range-partition id plus
    broadcast offsets; the ONLY unpartitioned window allowed is the
    offset prefix-sum over one row per partition (parallelism-bounded).
    Below the size threshold the plans layer picks the global-window
    fast path (r7's flagged bench regression was the two-phase fixed
    cost paid on a vocab that fits one partition) — that path's window
    is bounded by the 1 GiB input gate in plans/pipeline."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import vocabulary
    from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    spark = get_spark("tests", cpus=8)
    docs = load_table(spark, SF_SMOKE, "documents")
    # scale path: the rank window is pid-partitioned (it sits behind
    # the checkpoint, so the visible plan shows the pid column and the
    # ONLY unpartitioned window spec is the per-partition offset sum —
    # formatted explain prints tree + detail, so one logical window
    # can count twice)
    plan = plan_of(vocabulary(docs, min_count=2, two_phase=True))
    assert _unpartitioned_windows(plan) <= 2, plan
    assert "pid" in plan, plan
    # small path (what the registry builder picks under 1 GiB): the
    # global window, NO checkpoint/offset machinery in the plan
    small = plan_of(vocabulary(docs, min_count=2, two_phase=False))
    assert "pid" not in small, small


# The remaining unpartitioned windows in the repo, each bounded by a
# domain that does NOT grow with corpus bytes — the boundedness
# argument, pinned so a refactor cannot silently move an unbounded set
# through one of them:
#   orders_cohort_retention  — cumulative over DISTINCT MONTHS
#                              (calendar-bounded: ~1e2 rows/decade);
#   supplier_pareto_abc      — cumulative over the SUPPLIER dimension
#                              (dimension-bounded; the two-phase dense
#                              rank in operators/text.vocabulary is the
#                              drop-in if the dimension outgrows a
#                              partition);
#   orders_rfm_segmentation  — tercile bounds over DISTINCT METRIC
#                              VALUES (value-domain-bounded);
#   corpus_interleave_shards — row_number over DISTINCT SOURCES
#                              (a handful of corpus sources);
#   corpus_length_band_filter— cumulative over DISTINCT LENGTHS
#                              (value-domain-bounded).
@pytest.mark.parametrize(
    "name,max_unpartitioned",
    [
        # limits are spec-OCCURRENCE counts (formatted explain prints
        # tree + detail, so one logical window can count twice)
        ("orders_cohort_retention", 2),
        ("supplier_pareto_abc", 2),
        ("orders_rfm_segmentation", 6),
        ("corpus_interleave_shards", 2),
        ("corpus_length_band_filter", 2),
    ],
)
def test_bounded_unpartitioned_windows_dont_grow(spark, name, max_unpartitioned):
    plan = build(spark, name)
    assert _unpartitioned_windows(plan) <= max_unpartitioned, (
        f"{name} grew an unpartitioned window beyond its bounded set"
    )


def test_sessions_overlap_handoff_sessionizes_once(spark):
    """B48 (r7/r13): above the size gate the session set materializes
    once — the executed plan must contain ZERO sessionize windows (no
    ``lag`` expression: sessionization ran in the handoff job, and the
    sweep's two point-stream consumers read the materialized set);
    below the gate the measured-faster double recompute stands (the
    ``lag`` gap test appears once per consumer). The sweep's own
    bucket-partitioned running counts remain in the plan on both
    paths — they are the operator, not the recompute."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.relational import (
        sessions_overlap_join,
    )

    forced = sessions_overlap_join(spark, SF_SMOKE, handoff_bytes=0)
    forced.collect()
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "lag(" not in plan, "sessionize subtree still inline above the gate"

    inline = sessions_overlap_join(spark, SF_SMOKE, handoff_bytes=1 << 60)
    inline_plan = plan_of(inline)
    assert inline_plan.count("lag(") >= 2  # one sessionize per consumer

    # same answer on both paths
    a = sorted(map(tuple, forced.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b


def test_sessions_overlap_sweep_has_no_pair_cross_product(spark):
    """B48 (r13): the sweep-line rank count must never materialize
    candidate pairs — the plan may not contain the span-bucket
    self-join's signature (a join of the point stream with itself;
    measured 76 M candidate rows at sf0.1 for 95 k sessions). The only
    joins allowed are the broadcast of the bounded per-bucket offsets
    and whatever the sessionize aggregation needs."""
    plan = build(spark, "sessions_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair path's residual overlap filter is gone
    assert "greatest" not in plan
    # exactly one unpartitioned window: the per-bucket offset prefix
    # sum over one row per 6-h bucket (calendar-bounded). Formatted
    # explain prints tree + detail, so one logical window counts twice.
    assert _unpartitioned_windows(plan) <= 2, plan


def test_sparql_deletes_no_small_key_join(spark):
    """BGP ordering contract (operators/sparql.py _order_triples): no
    equi-join in the deletes.sparql plan is keyed ONLY on the
    low-cardinality ?ORGraph / VALUES variables — the 462 s -> 3.7 s
    near-cartesian the greedy entity-link-first ordering removed.
    Formatted explain prints one 'Left keys' / 'Right keys' detail
    block per hash/merge join."""
    import re

    from prefect_flow_arc_kg_postgres_etl_spark.plans import kg

    df = kg.kg_construct_real_query_deletes(spark, SF_SMOKE)
    plan = plan_of(df)
    # ?ORGraph-only joins are fine (attaching the 25-row org dim); the
    # trap's signature is a join whose keys include the VALUES-bound
    # ?ie_type with no entity variable alongside.
    for m in re.finditer(r"Left keys \[\d+\]: \[([^\]]*)\]", plan):
        keys = [k.strip().split("#")[0] for k in m.group(1).split(",")]
        if "ie_type" in keys:
            assert not all(k in ("ORGraph", "ie_type") for k in keys), (
                "join keyed only on low-cardinality vars: " + m.group(1)
            )


def _physical_parquet_scans(plan: str) -> int:
    """Count parquet scan STAGES in a plan string, excluding scans
    printed inside an InMemoryRelation subtree — a cached posting list
    prints its build plan at every InMemoryTableScan occurrence but
    physically reads parquet once at materialization."""

    def indent(line: str) -> int:
        for j, ch in enumerate(line):
            if ch.isalpha():
                return j
        return len(line)

    total = 0
    imr_depths: list[int] = []
    for line in plan.splitlines():
        if "InMemoryRelation" in line:
            imr_depths.append(indent(line))
            continue
        d = indent(line)
        imr_depths = [x for x in imr_depths if d > x]
        if "Scan parquet" in line and not imr_depths:
            total += 1
    return total


def _issues_first_execution_plan(spark):
    """FRESH plan on its FIRST execution: executedPlan() of a
    re-executed cached DataFrame reflects the latest adaptive
    re-planning, where already-materialized lazy checkpoints change
    how subtrees print (same 465-line query measured 61 scans on
    first execution, 111 on a later one) — the budgets pin the plan
    the bench and the driver actually pay for, the first one."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators import sparql as SQ
    from prefect_flow_arc_kg_postgres_etl_spark.plans import kg

    SQ.clear_plan_cache()
    df = kg.kg_construct_real_query_issues(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    SQ.clear_plan_cache()
    return plan


def test_issues_query_scan_budget(spark, monkeypatch):
    """The newspaper.sparql (issues) executed plan stays within its scan
    budget (r8: 207 -> 99 via accumulator checkpoints; r9: 61 with
    union-branch fusion; r11: 31 with property-table STAR fusion —
    same-subject constant-predicate triples read as one predicate-IN
    scan + one subject pivot, each star lazily checkpointed so it
    materializes exactly once. Budget 50, the r9 verdict's bar, with
    headroom so a star-membership regression fails loudly before it
    lands in the bench)."""
    monkeypatch.delenv("SPARK_GRAFT_SPARQL_HOT_PREDS", raising=False)
    scans = _physical_parquet_scans(_issues_first_execution_plan(spark))
    assert 0 < scans <= 50, scans


def test_issues_query_scan_budget_hot_preds(spark, monkeypatch):
    """OPT-IN hot-predicate posting lists (SPARK_GRAFT_SPARQL_HOT_PREDS
    =1, the cold-remote-store / driver-pressure mode): fully-unbound
    patterns over predicates scanned >= 3 times read per-predicate
    persisted lists — the same query drops to ~44 physical scans + >= 5
    in-memory re-reads (budget 50). Opt-in because on warm local
    parquet the in-memory re-reads measured net SLOWER (sf0.1 issues:
    12.7 s vs 9.6 s) — the win case is remote storage where each
    avoided scan is a network round trip."""
    monkeypatch.setenv("SPARK_GRAFT_SPARQL_HOT_PREDS", "1")
    plan = _issues_first_execution_plan(spark)
    scans = _physical_parquet_scans(plan)
    cached_reads = plan.count("InMemoryTableScan")
    # r11: star fusion consumes most fully-unbound repeats, so the
    # posting lists serve the residual non-star patterns (measured 28
    # scans + 15 in-memory re-reads with stars on).
    assert 0 < scans <= 40, scans
    assert cached_reads >= 5, cached_reads
