from prefect_flow_arc_kg_postgres_etl_spark.sinks.es_bulk import (
    to_bulk_actions,
    write_bulk_ndjson,
)
from prefect_flow_arc_kg_postgres_etl_spark.sinks.jdbc import (
    jdbc_writer,
    stage_then_merge,
)

__all__ = [
    "to_bulk_actions",
    "write_bulk_ndjson",
    "jdbc_writer",
    "stage_then_merge",
]
