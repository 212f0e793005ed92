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
