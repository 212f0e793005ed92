"""Scaling probe for the flagship ETL path (SURVEY §6 datapoints).

Builds an N-x key-shifted blowup of the sf0.1 customer/orders/lineitem
tables on disk (every copy's join keys shift by a disjoint stride, so
key cardinality scales with the data — the realistic 100 TB shape, not
a hot-key artifact), lands BOTH the 1x and Nx inputs in identical
32-file layouts, then times the flagship plans (noop sink, min-of-3
after one warm pass) at each scale and prints the ratios.

Usage: python tools/scale_probe.py [factor=50] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.plans.registry import QUERIES
from prefect_flow_arc_kg_postgres_etl_spark.session import get_spark
from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

SRC_SF = "/root/testdata/sf0.1"
SHIFT = 100_000_000  # key stride between copies (beyond any base key)
TS_SHIFT_DAYS = 35  # events copies shift in TIME too (source spans 30
# days): same per-window density at any factor — a pure key shift
# would stack all copies into the same 30 days and grow range-join /
# window fan-in quadratically, which is a different (hot-window)
# experiment than data volume.
BLOWN = {"customer", "orders", "lineitem", "events", "documents", "embeddings"}
KEY_COLS = {
    "c_custkey",
    "o_orderkey",
    "o_custkey",
    "l_orderkey",
    "l_partkey",  # parts/suppliers are dims: do NOT shift their keys
    "l_suppkey",
    "doc_id",
    "vec_id",
}
DIM_KEYS = {"l_partkey", "l_suppkey"}  # keep joinable to unblown dims
DEFAULT_QUERIES = ["kg_pivot_records", "merge_upsert", "index_documents"]


def build_dir(spark, factor: int, root: str) -> str:
    sf_dir = os.path.join(root, f"sf_blow{factor}")
    os.makedirs(sf_dir, exist_ok=True)
    for name in os.listdir(SRC_SF):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        dst = os.path.join(sf_dir, name)
        if table not in BLOWN:
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC_SF, name), dst)
            continue
        base = load_table(spark, SRC_SF, table)
        shifted = base
        for i in range(1, factor):
            copy = base.select(
                *[
                    (F.col(c) + SHIFT * i).alias(c)
                    if c in KEY_COLS and c not in DIM_KEYS
                    else F.col(c)
                    for c in base.columns
                ]
            )
            if table == "documents":
                # SCALE_PROBE_DOC_MODE picks the text-growth model:
                # - "marker" (default): prefix one copy-marker word —
                #   copies stay near-duplicates of the original (a
                #   ~96%-near-dup corpus at 25x; vocabulary ~constant,
                #   the shape that exercises vocab-bounded operators
                #   like BPE without flattering them with bit-identical
                #   text).
                # - "distinct": prefix EVERY word with a copy tag —
                #   copies share no shingles, modeling volume growth by
                #   mostly-new documents (the realistic corpus-growth
                #   shape for dedup/similarity operators, whose
                #   candidate-pair count would otherwise grow
                #   quadratically from the 24 near-dup siblings the
                #   marker mode creates BY CONSTRUCTION of the data).
                if os.environ.get("SCALE_PROBE_DOC_MODE") == "distinct":
                    copy = copy.withColumn(
                        "text",
                        F.concat(
                            F.lit(f"c{i}"),
                            F.regexp_replace(F.col("text"), " ", f" c{i}"),
                        ),
                    )
                else:
                    copy = copy.withColumn(
                        "text",
                        F.concat(F.lit(f"cp{i} "), F.col("text")),
                    )
                copy = copy.withColumn("n_chars", F.length("text"))
            if table == "embeddings":
                # Perturb each copy's vector deterministically (rotate
                # a small offset into the first component) so copies
                # are distinct points, not 24 exact duplicates that
                # would make every ANN result set degenerate.
                copy = copy.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> "
                        f"IF(j = 0, x + {i} * 0.001f, x))"
                    ),
                )
            if table == "events":
                copy = copy.withColumn(
                    "event_id", F.col("event_id") + SHIFT * i
                )
                # SCALE_PROBE_STACK=1 keeps all copies in the SAME 30
                # days (time density x factor — the hot-window
                # experiment); default shifts time so density stays
                # constant and the probe measures volume.
                if not os.environ.get("SCALE_PROBE_STACK"):
                    copy = copy.withColumn(
                        "ts",
                        F.col("ts")
                        + F.expr(f"INTERVAL {TS_SHIFT_DAYS * i} DAYS"),
                    )
            shifted = shifted.unionByName(copy)
        shifted.repartition(32).write.mode("overwrite").parquet(dst)
    return sf_dir


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in names:  # warm pass (codegen, file listing)
        QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for _ in range(3):
        for name in names:
            t0 = time.time()
            QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 2)
            if name not in out or dt < out[name]:
                out[name] = dt
    return out


def main() -> None:
    args = sys.argv[1:]
    factor = int(args[0]) if args and args[0].isdigit() else 50
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES
    spark = get_spark("scale-probe")
    # Optional shuffle-partition override for the Nx run (the 100 TB
    # lever: partitions scale with data so per-partition agg state
    # stays memory-resident; locally the 1x default is cores).
    shuffle_nx = os.environ.get("SCALE_PROBE_SHUFFLE")
    root = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        d1 = build_dir(spark, 1, root)
        dn = build_dir(spark, factor, root)
        t1 = time_queries(spark, d1, names)
        if shuffle_nx:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_nx)
        tn = time_queries(spark, dn, names)
        print(
            json.dumps(
                {
                    "factor": factor,
                    "t_1x": t1,
                    f"t_{factor}x": tn,
                    "ratio": {
                        n: round(tn[n] / t1[n], 2) if t1[n] else None
                        for n in names
                    },
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
