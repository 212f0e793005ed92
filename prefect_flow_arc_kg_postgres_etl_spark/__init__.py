"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of viaacode/prefect-flow-arc-kg-postgres-etl, re-expressed
Spark-first (DataFrame/SQL + Catalyst, Structured Streaming for streams).

The reference is a Prefect ETL that syncs an RDF knowledge graph into
PostgreSQL/Elasticsearch (SPARQL CONSTRUCT views -> triple stream ->
record pivot -> batched load -> PK merge -> per-org JSON index documents
-> delete processing). This package provides the same capabilities as
distributed, declarative Spark operators designed for 100 TB scale.

See SURVEY.md for the operator inventory and architecture notes.
"""

from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
