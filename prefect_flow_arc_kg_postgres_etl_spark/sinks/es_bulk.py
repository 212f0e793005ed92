"""Elasticsearch bulk-format sink.

The reference's terminal consumer is an ES index fed from
``graph.index_documents`` (flows/arc_db_load_index_tables_flow.py
builds one JSON document per entity into per-organisation partitions;
an external indexer ships them). Spark-side we produce the ES ``_bulk``
wire format directly — NDJSON action/source line pairs, one file set
per index (organisation) — which any indexer (or ``curl --data-binary``)
can POST as-is. No ES client dependency, fully testable offline.

Scale: the conversion is a scan-side projection (``to_json`` is
codegen'd); the write is partitioned by index name so per-org bulk
loads parallelize and partition-overwrite replaces exactly the
organisations present in the batch (the reference's
create/truncate/repopulate partition maintenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_bulk_actions(
    docs: DataFrame,
    id_col: str = "id",
    index_col: str = "index",
    doc_col: str = "document",
) -> DataFrame:
    """(id, index, document json) -> (index, bulk) where ``bulk`` is the
    two-line ES bulk entry:

        {"index": {"_index": <index>, "_id": <id>}}
        <document json>

    Emitted as ONE string column so a plain text write produces a valid
    ``_bulk`` body; keeping ``index`` as a column lets the writer
    partition by it."""
    action = F.to_json(
        F.struct(
            F.struct(
                F.col(index_col).alias("_index"),
                F.col(id_col).cast("string").alias("_id"),
            ).alias("index")
        )
    )
    return docs.select(
        F.col(index_col).alias("index"),
        F.concat(action, F.lit("\n"), F.col(doc_col)).alias("bulk"),
    )


def write_bulk_ndjson(
    docs: DataFrame,
    path: str,
    id_col: str = "id",
    index_col: str = "index",
    doc_col: str = "document",
) -> None:
    """Write ES bulk bodies partitioned per index (organisation):
    ``<path>/index=<org>/part-*.txt``. Dynamic partition overwrite
    replaces only the organisations present in ``docs`` — the Spark
    analogue of the reference's per-partition truncate+repopulate."""
    (
        to_bulk_actions(docs, id_col, index_col, doc_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("index")
        .text(path)
    )
