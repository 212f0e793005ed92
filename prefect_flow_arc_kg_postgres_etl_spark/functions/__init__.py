from prefect_flow_arc_kg_postgres_etl_spark.functions.coercion import (
    bool_default_false,
    clamp_min_year,
    iso_duration_seconds,
    safe_timestamp,
)

__all__ = [
    "bool_default_false",
    "clamp_min_year",
    "iso_duration_seconds",
    "safe_timestamp",
]
