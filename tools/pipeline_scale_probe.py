"""25x scale probe for the COMPOSED reference pipeline (SURVEY §6).

Reuses tools/scale_probe.py's key-shifted blowup, then times the
composed cycle's three legs SEPARATELY at 1x and Nx (the r8 verdict
asked for per-leg datapoints, not one wall number):

  land   = all_view_triples: the nine verbatim queries -> parquet
           spills -> distinct union (step 1; dominated by the SPARQL
           query executions)
  pivot  = pivot_wide + every graph.* table extraction forced with a
           noop write (step 2; ONE shuffle pair over the triple stream)
  star   = build_reference_index_documents over the pivoted tables
           (step 3; the 23-join star with pre-aggregated sides)
  incr   = flow's A77 flag algebra + merge legs over cached docs
  del    = A78 cascade + worklist-scoped document rebuild
  scoped = all_view_triples_scoped over a 2-org worklist (the r10
           parallel per-org fan-out; orgs are nation-keyed dims so a
           25x store means 25x entities PER org, not more orgs)
  incr_store / del_store = the durable store twins (scratch-store
           seed + atomic snapshot commit + read-back)

Usage: python tools/pipeline_scale_probe.py [factor=25]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prefect_flow_arc_kg_postgres_etl_spark.plans import reference_pipeline as RP
from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark
from tools.scale_probe import build_dir


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def legs(spark, sf_dir: str) -> dict[str, float]:
    from prefect_flow_arc_kg_postgres_etl_spark.operators import sparql as SQ

    out: dict[str, float] = {}
    SQ.clear_plan_cache()
    t0 = time.time()
    triples = RP.all_view_triples(spark, sf_dir)
    n = triples.count()
    out["land"] = round(time.time() - t0, 2)
    out["triples"] = n
    t0 = time.time()
    tables = RP.pivot_view_tables(triples)
    for df in tables.values():
        _noop(df)
    out["pivot"] = round(time.time() - t0, 2)
    t0 = time.time()
    docs = RP.build_reference_index_documents(
        tables, RP.SYNTHETIC_STORE_ADAPTER
    )
    _noop(docs)
    out["star"] = round(time.time() - t0, 2)
    out["docs"] = docs.count()
    t0 = time.time()
    _noop(QUERIES["flow_reference_incremental"].builder(spark, sf_dir))
    out["incr"] = round(time.time() - t0, 2)
    t0 = time.time()
    _noop(QUERIES["flow_reference_deletes"].builder(spark, sf_dir))
    out["del"] = round(time.time() - t0, 2)
    t0 = time.time()
    scoped = RP.all_view_triples_scoped(spark, sf_dir, ["OR-1", "OR-3"])
    out["scoped_triples"] = scoped.count()
    out["scoped"] = round(time.time() - t0, 2)
    t0 = time.time()
    _noop(QUERIES["flow_reference_incremental_store"].builder(spark, sf_dir))
    out["incr_store"] = round(time.time() - t0, 2)
    t0 = time.time()
    _noop(QUERIES["flow_reference_deletes_store"].builder(spark, sf_dir))
    out["del_store"] = round(time.time() - t0, 2)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_spark("pipeline-scale-probe")
    root = tempfile.mkdtemp(prefix="pipe_probe_")
    try:
        d1 = build_dir(spark, 1, root)
        dn = build_dir(spark, factor, root)
        t1 = legs(spark, d1)
        tn = legs(spark, dn)
        ratios = {
            k: round(tn[k] / t1[k], 2)
            for k in (
                "land",
                "pivot",
                "star",
                "incr",
                "del",
                "scoped",
                "incr_store",
                "del_store",
            )
            if t1[k] > 0
        }
        print(
            json.dumps(
                {"factor": factor, "t_1x": t1, f"t_{factor}x": tn, "ratio": ratios}
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
