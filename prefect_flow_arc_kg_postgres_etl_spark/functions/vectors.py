"""Vector column expressions over ``array<float>`` embedding columns.

Dot products / norms are left-fold aggregates in DOUBLE with explicit
casts — bit-deterministic and engine-portable (the DuckDB oracles use
the same sequential fold), and they stay JVM-side (no UDF, no Arrow
transfer) so ANN scans scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---- fixed-dimension SQL string forms -----------------------------------
# For known-dimension embedding columns the fold above can be unrolled
# into a straight-line SQL expression: higher-order array functions
# (zip_with/aggregate) are interpreted per element with object churn,
# while the unrolled sum compiles into whole-stage codegen arithmetic —
# ~10x faster on hot pair-scoring paths, and built as a Python string
# (no py4j round-trips). Left-association of `+` reproduces the fold's
# evaluation order exactly ((0.0 + x0) + x1 ... == x0 + x1 ...), so
# results are bit-identical to dot()/norm() and the DuckDB oracles.


def dot_sql(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return f"({terms})"


def norm_sql(a: str, dim: int) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


