from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import (
    TABLES,
    Catalog,
    load_table,
)

__all__ = ["TABLES", "Catalog", "load_table"]
