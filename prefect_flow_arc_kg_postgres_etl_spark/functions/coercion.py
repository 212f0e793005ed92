"""Literal/value coercion — the reference's record-level value rules,
as pure JVM-side column expressions (no Python UDFs: these run in the
scan/project stage inside whole-stage codegen).

Reference semantics reproduced:
- XSD duration literals -> seconds    (stream.ts:29-42 _parseValue)
- dates with year < 1 -> clamped      (stream.ts:35-39)
- invalid date strings -> NULL        (database.ts:127-130 getTableColumns)
- missing boolean -> false            (database.ts:131-134)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ISO-8601 duration: PnYnMnDTnHnMnS (any component optional, fractional
# seconds allowed). Matches the iso8601-duration JS package the reference
# uses, restricted to the calendar-free conversion it performs
# (toSeconds with year=365d, month=30d — see iso8601-duration semantics).
_DUR_RE = (
    r"^P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?"
    r"(?:(\d+(?:\.\d+)?)D)?(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?"
    r"(?:(\d+(?:\.\d+)?)S)?)?$"
)


def _part(col: Column, idx: int) -> Column:
    # regexp_extract yields '' for an absent optional group; nullif keeps
    # the cast ANSI-safe.
    return F.coalesce(
        F.nullif(F.regexp_extract(col, _DUR_RE, idx), F.lit("")).cast("double"),
        F.lit(0.0),
    )


def iso_duration_seconds(col: Column) -> Column:
    """ISO-8601 duration string -> total seconds (double).

    NULL for strings that are not durations. Pure regexp/arith — stays in
    whole-stage codegen, safe on a 100 TB scan.
    """
    c = F.trim(col)
    is_dur = c.rlike(_DUR_RE) & (F.length(c) > 1)
    secs = (
        _part(c, 1) * 31536000.0  # year = 365 d
        + _part(c, 2) * 2592000.0  # month = 30 d
        + _part(c, 3) * 604800.0  # week
        + _part(c, 4) * 86400.0  # day
        + _part(c, 5) * 3600.0
        + _part(c, 6) * 60.0
        + _part(c, 7)
    )
    return F.when(is_dur, secs)


def safe_timestamp(col: Column) -> Column:
    """Parse a timestamp string; invalid -> NULL (never an error).

    Mirrors the reference's drop-invalid-date behavior. try_to_timestamp
    is ANSI-safe and codegen'd. Years outside [1, 9999] also coerce to
    NULL: Spark will happily parse '99999' as year 99999, which then
    breaks Python datetime conversion and every JSON/date consumer
    downstream (found by the hypothesis property tests).
    """
    ts = F.try_to_timestamp(col)
    lo = F.to_timestamp(F.lit("0001-01-01 00:00:00"))
    hi = F.to_timestamp(F.lit("9999-12-31 23:59:59"))
    return F.when(ts.between(lo, hi), ts)


def clamp_min_year(col: Column) -> Column:
    """Timestamps before year 1 are clamped to year 1 (stream.ts:35-39).

    Spark timestamps cannot hold year < 1 anyway; clamp anything below
    0001-01-01 to that instant.
    """
    floor = F.to_timestamp(F.lit("0001-01-01 00:00:00"))
    return F.when(col < floor, floor).otherwise(col)


def bool_default_false(col: Column) -> Column:
    """NULL boolean -> false (database.ts:131-134)."""
    return F.coalesce(col.cast("boolean"), F.lit(False))
