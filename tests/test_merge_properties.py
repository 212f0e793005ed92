"""Property tests (hypothesis) for the merge semantics — the
reference's load contract (database.ts:168-254): source-wins on PK
collision, no key lost, idempotent re-merge; clear-then-insert replaces
exactly the staged groups.

Expected results are computed with plain dicts Python-side; one Spark
job per example keeps runtime bounded (examples are capped — the point
is randomized shapes, not volume).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from prefect_flow_arc_kg_postgres_etl_spark.operators.merge import (
    clear_and_insert,
    upsert,
)

rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 1_000)),
    min_size=0,
    max_size=25,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pairs):
    # dedup keys within one side (a side is itself a keyed table)
    d = {}
    for k, v in pairs:
        d[k] = v
    data = [(k, v) for k, v in d.items()]
    return spark.createDataFrame(data or [(None, None)], "k long, v long").filter(
        "k is not null"
    ), d


@given(target=rows, source=rows)
@_SETTINGS
def test_upsert_source_wins_and_total(spark, target, source):
    tdf, t = _df(spark, target)
    sdf, s = _df(spark, source)
    expected = {**t, **s}  # source wins on collision, nothing lost
    out = {r.k: r.v for r in upsert(tdf, sdf, ["k"]).collect()}
    assert out == expected

    # idempotent: merging the same source again changes nothing
    merged_df = upsert(tdf, sdf, ["k"])
    again = {r.k: r.v for r in upsert(merged_df, sdf, ["k"]).collect()}
    assert again == expected


@given(
    target=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100), st.integers(0, 1_000)),
        max_size=25,
    ),
    source=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100), st.integers(0, 1_000)),
        max_size=25,
    ),
)
@_SETTINGS
def test_clear_and_insert_replaces_exactly_staged_groups(spark, target, source):
    tdf = spark.createDataFrame(
        target or [(None, None, None)], "g long, k long, v long"
    ).filter("g is not null")
    sdf = spark.createDataFrame(
        source or [(None, None, None)], "g long, k long, v long"
    ).filter("g is not null")
    staged_groups = {g for g, _, _ in source}
    expected = sorted(
        [t for t in target if t[0] not in staged_groups] + source
    )
    out = sorted((r.g, r.k, r.v) for r in clear_and_insert(tdf, sdf, "g").collect())
    assert out == expected
