from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import (
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["QUERIES", "QuerySpec", "queries", "oracle_sql"]
