"""Property tests (hypothesis) for the value-coercion expressions —
the record-level rules the reference applies while pivoting the triple
stream (stream.ts:29-42, database.ts:121-144).

Each property generates inputs Python-side, computes the expected value
with plain arithmetic, and checks the Spark column expression agrees.
One Spark job per property (all examples in one DataFrame) keeps this
fast despite hypothesis' example counts.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.functions.coercion import (
    bool_default_false,
    iso_duration_seconds,
    safe_timestamp,
)
from prefect_flow_arc_kg_postgres_etl_spark.functions.text import token_count

_SECS = {
    "Y": 31536000.0,
    "M": 2592000.0,
    "W": 604800.0,
    "D": 86400.0,
    "TH": 3600.0,
    "TM": 60.0,
    "TS": 1.0,
}

component = st.integers(min_value=0, max_value=10_000)


@st.composite
def durations(draw):
    """A random well-formed ISO-8601 duration + its expected seconds."""
    parts = draw(
        st.fixed_dictionaries(
            {},
            optional={k: component for k in ["Y", "M", "W", "D", "TH", "TM", "TS"]},
        )
    )
    date = "".join(f"{parts[k]}{k}" for k in ["Y", "M", "W", "D"] if k in parts)
    time_ = "".join(f"{parts[k]}{k[1]}" for k in ["TH", "TM", "TS"] if k in parts)
    s = "P" + date + ("T" + time_ if time_ else "")
    expected = sum(parts[k] * _SECS[k] for k in parts)
    # "P" / "PT" alone are not valid durations
    if not parts:
        return "P0D", 0.0
    return s, expected


def _eval_batch(spark, rows, expr):
    df = spark.createDataFrame([(r,) for r in rows], "v string")
    return [r.out for r in df.select(expr(F.col("v")).alias("out")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(durations(), min_size=1, max_size=20))
def test_duration_seconds_matches_arithmetic(spark, cases):
    strs = [c[0] for c in cases]
    got = _eval_batch(spark, strs, iso_duration_seconds)
    for (s, expected), actual in zip(cases, got):
        assert actual == expected, (s, expected, actual)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
        ).filter(lambda s: not s.strip().startswith("P")),
        min_size=1,
        max_size=20,
    )
)
def test_duration_garbage_is_null(spark, strs):
    got = _eval_batch(spark, strs, iso_duration_seconds)
    assert all(v is None for v in got), list(zip(strs, got))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=datetime(1, 1, 1), max_value=datetime(2262, 1, 1)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_valid_timestamps_roundtrip(spark, dts):
    # strftime %Y does not zero-pad years < 1000 on glibc; format manually
    strs = [
        f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d} "
        f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}"
        for dt in dts
    ]
    got = _eval_batch(spark, strs, safe_timestamp)
    for dt, actual in zip(dts, got):
        assert actual is not None
        assert actual.replace(tzinfo=None) == dt.replace(microsecond=0)


def test_nonsense_timestamps_are_null_not_errors(spark):
    strs = ["not a date", "2024-13-45", "99999", "", "P1DT2H", "1-URGENT"]
    got = _eval_batch(spark, strs, safe_timestamp)
    assert got == [None] * len(strs)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=20))
def test_bool_default_false_total(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v boolean")
    got = [
        r.out for r in df.select(bool_default_false(F.col("v")).alias("out")).collect()
    ]
    assert got == [bool(v) for v in vals]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=" \tabcxyz.,!", max_size=60), min_size=1, max_size=20
    )
)
def test_token_count_matches_python_split(spark, texts):
    got = _eval_batch(spark, texts, token_count)
    assert got == [len(t.split()) for t in texts]
