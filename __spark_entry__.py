"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (index-document build, the reference's
core deliverable) on sf0.001. ``queries()`` / ``oracle_sql()`` — the
operator inventory from SURVEY.md §2, backed by
``prefect_flow_arc_kg_postgres_etl_spark.plans.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prefect_flow_arc_kg_postgres_etl_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-entity searchable index documents (JSON), the
    reference's Elasticsearch feed (flows/queries/update_partition.sql),
    as one declarative star-join plan."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.index_documents import (
        build_index_documents,
    )

    registry._ensure_package_on_workers(spark)
    return build_index_documents(spark, "/root/testdata/sf0.001", as_json=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
