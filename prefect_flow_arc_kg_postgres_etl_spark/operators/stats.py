"""Grouped numeric model fitting via Arrow-batched ``applyInPandas`` —
the grouped-map custom-operator route (the third Pandas API surface
next to ``mapInPandas`` for per-row binary work, multimodal.py, and
``applyInPandasWithState`` for streaming state, streaming/sync.py).

Use this route when the per-group computation is a genuine numeric
algorithm (model fit, solver, scipy call) rather than an expression —
for anything expressible in ``pyspark.sql.functions`` the JVM path
wins (the trend below HAS a built-in twin, ``regr_slope``, which the
tests use to cross-check the pandas path; it exists here as the
documented pattern for fits that have no builtin)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TREND_SCHEMA = (
    "event_type string, n bigint, slope double, intercept double"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Least-squares value-vs-time line per group (numpy closed form).
    Centering x first keeps the normal equations well-conditioned for
    epoch-scale abscissae."""
    import numpy as np

    x = pdf["x_hours"].to_numpy(dtype="float64")
    y = pdf["value"].to_numpy(dtype="float64")
    xc = x - x.mean()
    denom = float((xc * xc).sum())
    if denom > 0:
        slope = float((xc * y).sum() / denom)
        intercept = float(y.mean() - slope * x.mean())
    else:
        # Degenerate group (single point / identical abscissae): the
        # line is undefined. Emit true NULLs — matching regr_slope /
        # regr_intercept (both the DuckDB oracle and the Spark
        # cross-check return NULL here, not 0).
        slope = intercept = pd.NA
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(pdf)],
            "slope": pd.array([slope], dtype="Float64"),
            "intercept": pd.array([intercept], dtype="Float64"),
        }
    )


def grouped_trend(events: DataFrame) -> DataFrame:
    """Per-event-type value trend: ONE shuffle on the group key, then
    each group fits in a single Arrow batch executor-side. Grouped-map
    semantics at scale: a group must fit in one task's memory — right
    for per-entity/per-type fits (bounded groups), wrong for fitting
    over the whole corpus (use the built-in regr_* aggregates, which
    compute as distributed partial sums, for that).

    Returns (event_type, n, slope, intercept); slope in value-units
    per hour of event time."""
    prepped = events.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3.6e9).alias("x_hours"),
        F.col("value").cast("double").alias("value"),
    )
    return prepped.groupBy("event_type").applyInPandas(
        _fit_group, schema=_TREND_SCHEMA
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_cols: list[str],
    start_col: str,
    end_col: str,
    bucket_width: int,
    self_match=None,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join core (B48): pairs of intervals
    with a.start <= b.end AND b.start <= a.end, produced WITHOUT an
    inequality join. Each interval explodes to every ``bucket_width``
    bucket it spans (cost = total span / width), the join is EQUI on
    the bucket, and a pair survives only at its CANONICAL bucket
    floor(max(starts) / width) — which both intervals provably contain
    when they overlap (the max start is <= both ends) — so every
    overlapping pair appears EXACTLY once, no dedup shuffle.

    ``intervals`` carries id_cols + integer start/end columns (same
    units as bucket_width). ``self_match`` (Column over a_/b_-prefixed
    ids) filters which pairs count — default: exclude self-pairs on
    the first id column. Returns one row per ordered (a, b) pair with
    a_/b_-prefixed ids."""
    W_ = F.lit(bucket_width)

    def side(prefix: str) -> DataFrame:
        sel = [F.col(c).alias(f"{prefix}{c}") for c in id_cols] + [
            F.col(start_col).alias(f"{prefix}s"),
            F.col(end_col).alias(f"{prefix}e"),
        ]
        return intervals.select(*sel).withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col(f"{prefix}s") / W_).cast("long"),
                    (F.col(f"{prefix}e") / W_).cast("long"),
                )
            ),
        )

    a, b = side("a_"), side("b_")
    if self_match is None:
        self_match = F.col(f"a_{id_cols[0]}") != F.col(f"b_{id_cols[0]}")
    return (
        a.join(b, "bucket")
        .filter(
            self_match
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & (
                F.col("bucket")
                == (F.greatest("a_s", "b_s") / W_).cast("long")
            )
        )
        .drop("bucket")
    )
