"""Merge-semantics unit tests: the reference's load contract
(idempotency, full==incremental convergence, delete convergence) —
SURVEY.md §5."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
    clear_and_insert,
    delete_flagged,
    fk_merge_order,
    orphan_cleanup,
    upsert,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def test_upsert_update_and_insert(spark):
    target = _df(spark, [(1, "a"), (2, "b")])
    source = _df(spark, [(2, "B"), (3, "C")])
    out = {(r.k, r.v) for r in upsert(target, source, ["k"]).collect()}
    assert out == {(1, "a"), (2, "B"), (3, "C")}


def test_upsert_idempotent(spark):
    target = _df(spark, [(1, "a"), (2, "b")])
    source = _df(spark, [(2, "B"), (3, "C")])
    once = upsert(target, source, ["k"])
    twice = upsert(once, source, ["k"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_full_equals_incremental(spark):
    """TRUNCATE+INSERT of the final source == chain of incremental
    upserts whose union covers it (reference full_sync contract)."""
    v1 = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    v2 = _df(spark, [(2, "B"), (4, "d")])
    incremental = upsert(upsert(_df(spark, []), v1, ["k"]), v2, ["k"])
    full = upsert(v1, v2, ["k"])
    assert {tuple(r) for r in incremental.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_clear_and_insert_replaces_groups(spark):
    target = _df(spark, [(1, "x1"), (1, "x2"), (2, "y1")])
    source = _df(spark, [(1, "new")])
    out = {(r.k, r.v) for r in clear_and_insert(target, source, "k").collect()}
    assert out == {(1, "new"), (2, "y1")}


def test_orphan_cleanup_keeps_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,)], "pk long")
    out = orphan_cleanup(child, parent, fk="fk", parent_key="pk")
    assert {r.id for r in out.collect()} == {1, 3}


def test_delete_flagged_cascade(spark):
    ents = spark.createDataFrame([(1,), (2,), (3,)], "e long")
    frags = spark.createDataFrame(
        [(1, 100, True), (2, 101, False), (3, 102, True), (3, 103, False)],
        "e long, f long, is_deleted boolean",
    )
    ents2, frags2 = delete_flagged(ents, frags, "e", "e")
    assert {r.e for r in ents2.collect()} == {2}
    assert {r.f for r in frags2.collect()} == {101, 103}


def test_fk_merge_order_levels():
    levels = fk_merge_order({"a": set(), "b": {"a"}, "c": {"a"}, "d": {"b", "c"}})
    assert levels == [["a"], ["b", "c"], ["d"]]


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics — same rows as the plain
    join, with the hot key's work split across salt partitions."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import salted_join

    # skewed left: 90% of rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 102)], "k long, attr string"
    )
    plain = {(r.k, r.payload, r.attr) for r in left.join(right, on="k").collect()}
    salted = {(r.k, r.payload, r.attr) for r in salted_join(left, right, "k").collect()}
    assert salted == plain
    assert len(salted) == 1000


def test_salted_join_rejects_outer_modes(spark):
    """Right-side replication duplicates unmatched right rows under
    outer modes — the function must refuse them, not corrupt."""
    import pytest as _pytest

    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import salted_join

    left = spark.createDataFrame([(1, 1)], "k long, payload long")
    right = spark.createDataFrame([(1, "a")], "k long, attr string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", how=how)


def test_scd2_upsert_closes_and_inserts(spark):
    """SCD2: matched current rows close at the effective date, history
    rows pass through untouched, source rows become the new current
    versions, unmatched keys are untouched."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import scd2_upsert

    target = spark.createDataFrame(
        [
            # key 1: one history row + one current row
            (1, "old", "2020-01-01", "2021-01-01"),
            (1, "cur", "2021-01-01", None),
            # key 2: current only, not in source
            (2, "keep", "2020-06-01", None),
        ],
        "id long, v string, valid_from string, valid_to string",
    )
    source = spark.createDataFrame(
        [(1, "new", "2022-01-01"), (3, "ins", "2022-01-01")],
        "id long, v string, valid_from string",
    )
    out = {
        (r.id, r.v, r.valid_from, r.valid_to)
        for r in scd2_upsert(target, source, ["id"]).collect()
    }
    assert out == {
        (1, "old", "2020-01-01", "2021-01-01"),   # history untouched
        (1, "cur", "2021-01-01", "2022-01-01"),   # closed at effective
        (2, "keep", "2020-06-01", None),          # unmatched untouched
        (1, "new", "2022-01-01", None),           # new current
        (3, "ins", "2022-01-01", None),           # brand-new key
    }


def test_scd2_upsert_repeated_merge_extends_history(spark):
    """Re-merging a LATER batch for the same key grows the version
    chain: exactly one current row per key, earlier versions closed in
    order."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import scd2_upsert

    t0 = spark.createDataFrame(
        [(1, "v1", "2020-01-01", None)],
        "id long, v string, valid_from string, valid_to string",
    )
    s1 = spark.createDataFrame(
        [(1, "v2", "2021-01-01")], "id long, v string, valid_from string"
    )
    s2 = spark.createDataFrame(
        [(1, "v3", "2022-01-01")], "id long, v string, valid_from string"
    )
    out = scd2_upsert(scd2_upsert(t0, s1, ["id"]), s2, ["id"])
    rows = {(r.v, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        ("v1", "2020-01-01", "2021-01-01"),
        ("v2", "2021-01-01", "2022-01-01"),
        ("v3", "2022-01-01", None),
    }
    current = [r for r in out.collect() if r.valid_to is None]
    assert len(current) == 1 and current[0].v == "v3"


def test_scd2_upsert_multi_version_batch_builds_consistent_chain(spark):
    """A source batch staging TWO versions of one key must not
    duplicate history: the EARLIEST staged effective date closes the
    current target row (no interval overlap), each staged version is
    closed by its successor, and exactly one row per key remains
    current."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import scd2_upsert

    target = spark.createDataFrame(
        [(1, "v0", "2020-01-01", None)],
        "k long, val string, valid_from string, valid_to string",
    )
    source = spark.createDataFrame(
        [(1, "v1", "2021-01-01"), (1, "v2", "2022-01-01")],
        "k long, val string, valid_from string",
    )
    rows = {
        (r.val, r.valid_from, r.valid_to)
        for r in scd2_upsert(target, source, keys=["k"]).collect()
    }
    assert rows == {
        ("v0", "2020-01-01", "2021-01-01"),  # closed by the EARLIEST staged
        ("v1", "2021-01-01", "2022-01-01"),  # closed by its successor
        ("v2", "2022-01-01", None),          # the one current version
    }


def test_merge_agg_state_exact_and_empty_delta(spark):
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
        merge_agg_state,
    )

    state = spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 5)], "k string, n bigint, s bigint"
    )
    delta = spark.createDataFrame(
        [("a", 7), ("c", 1)], "k string, s bigint"
    )
    got = {
        r.k: (r.n, r.s)
        for r in merge_agg_state(state, delta, ["k"], ["s"]).collect()
    }
    assert got == {"a": (3, 37), "b": (1, 5), "c": (1, 1)}

    empty = delta.filter("1=0")
    unchanged = {
        r.k: (r.n, r.s)
        for r in merge_agg_state(state, empty, ["k"], ["s"]).collect()
    }
    assert unchanged == {"a": (2, 30), "b": (1, 5)}


def test_upsert_conditional_partial_update_and_guard(spark):
    from pyspark.sql.utils import CapturedException

    import pytest as _pytest

    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
        upsert_conditional,
    )

    tgt = spark.createDataFrame(
        [(1, 10, "keep-a"), (2, 20, "keep-b"), (3, 30, "keep-c")],
        "k int, v int, note string",
    )
    src = spark.createDataFrame(
        [(1, 99, "staged"), (2, 5, "staged"), (4, 40, "staged")],
        "k int, v int, note string",
    )
    out = upsert_conditional(
        tgt, src, keys=["k"], update_cols=["v"],
        condition=lambda s, t: s("v") > t("v"),
    )
    rows = {r["k"]: (r["v"], r["note"]) for r in out.collect()}
    # matched + cond: v updated, note RETAINED from the target
    assert rows[1] == (99, "keep-a")
    # matched, cond false: untouched
    assert rows[2] == (20, "keep-b")
    # unmatched target: untouched
    assert rows[3] == (30, "keep-c")
    # unmatched source: inserted whole
    assert rows[4] == (40, "staged")

    # SQL MERGE precondition: duplicate source key must FAIL LOUDLY
    dup = src.unionByName(spark.createDataFrame([(1, 7, "dup")], src.schema))
    with _pytest.raises(CapturedException, match="duplicate key"):
        upsert_conditional(
            tgt, dup, keys=["k"], update_cols=["v"],
            condition=lambda s, t: s("v") > t("v"),
        ).collect()


def test_signed_agg_merge_drops_fully_retracted_groups(spark):
    from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
        merge_agg_state_signed,
    )

    state = spark.createDataFrame(
        [(1, 2, 300), (2, 1, 50), (3, 2, 70)],
        "k int, n bigint, cents bigint",
    )
    delta = spark.createDataFrame(
        # k=1: one retract (down to 1 row, 100 cents); k=2: full
        # retraction (group must VANISH); k=4: brand-new group.
        [(1, -1, 200), (2, -1, 50), (4, 1, 90)],
        "k int, sign int, cents int",
    )
    out = {
        r["k"]: (r["n"], r["cents"])
        for r in merge_agg_state_signed(
            state, delta, keys=["k"], sum_cols=["cents"]
        ).collect()
    }
    assert out == {1: (1, 100), 3: (2, 70), 4: (1, 90)}


class TestRenameInvalidation:
    """A66: dim-drift invalidation must rebuild partitions whose docs
    embed a stale org name even with ZERO post-since fact activity, and
    must pass untouched partitions through unchanged."""

    def test_dim_only_drift_rebuilds(self, spark):
        from prefect_flow_arc_kg_postgres_etl_spark.plans.kg import (
            index_partition_rename_invalidation,
        )

        out = index_partition_rename_invalidation(spark, "/root/testdata/sf0.01")
        rows = out.collect()
        by_org = {}
        for r in rows:
            by_org.setdefault(r.org_key, set()).add(r.state)
        # Renamed orgs (key % 7 == 3) must be fully rebuilt — including
        # any with no post-since orders — and embed the CURRENT name.
        for k, states in by_org.items():
            assert len(states) == 1, f"mixed states within partition {k}"
            if k % 7 == 3:
                assert states == {"rebuilt"}, f"renamed org {k} not rebuilt"
        renamed_rows = [r for r in rows if r.org_key % 7 == 3]
        assert renamed_rows
        assert all("(legacy)" not in r.embedded_name for r in renamed_rows)
        # Kept partitions embed their original (current == legacy-free)
        # name and match the pre-since aggregate exactly.
        kept = [r for r in rows if r.state == "kept"]
        assert kept, "expected at least one untouched partition"
        assert all("(legacy)" not in r.embedded_name for r in kept)


class TestConditionalUpsertNullKeys:
    """ADVICE r6: a target row with a legitimately-NULL merge key must
    pass through untouched (NULL keys never match, but they must not
    read as 'source-only' and be nulled out)."""

    def test_null_key_target_row_survives(self, spark):
        from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
            upsert_conditional,
        )

        target = spark.createDataFrame(
            [(1, "a", 10), (None, "nullkey", 99)],
            "k int, v string, ver int",
        )
        source = spark.createDataFrame(
            [(1, "a2", 20), (2, "new", 5)], "k int, v string, ver int"
        )
        out = upsert_conditional(
            target,
            source,
            keys=["k"],
            update_cols=["v", "ver"],
            condition=lambda s, t: s("ver") > t("ver"),
        )
        rows = {(r.k, r.v, r.ver) for r in out.collect()}
        assert (None, "nullkey", 99) in rows, rows
        assert (1, "a2", 20) in rows and (2, "new", 5) in rows
        assert len(rows) == 3
