"""Dead-arm guard for the verbatim-SPARQL oracles.

A UNION arm whose WHERE is unsatisfiable on the seeded keyspace is
empty on BOTH the Spark and DuckDB sides — the hash check passes while
the branch's coverage silently dies (found live in r7: arm moduli
sharing a factor with the ie-type modulus k%9, e.g. genre's k%6==4
forcing k%3==1, structurally impossible for NewspaperIssue/Page; plus
one compound class starved by TPC-H's sparse orderkeys). This test
evaluates every distinct arm condition against DuckDB directly — no
Spark session — and fails on any empty arm.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from prefect_flow_arc_kg_postgres_etl_spark.plans import kg

# The graded scale: at sf0.001 the sparse ~1.5k-key space genuinely
# cannot populate the deepest compound arms (k%20==0 AND k%7==x within
# one ie-type residue); liveness is a property of the driver's sf0.01.
SF_LIVENESS = "/root/testdata/sf0.01"

ORACLES = {
    "av_audio": kg.KG_REAL_QUERY_AV_AUDIO_ORACLE,
    "av_video": kg.KG_REAL_QUERY_AV_VIDEO_ORACLE,
    "av_complex": kg.KG_REAL_QUERY_AV_COMPLEX_ORACLE,
    "issues": kg.KG_REAL_QUERY_NP_ORACLE,
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_every_oracle_arm_is_live(name):
    import os

    if not os.path.isdir(SF_LIVENESS):
        pytest.skip("sf0.01 testdata not mounted")
    oracle = ORACLES[name]
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_LIVENESS}/{t}.parquet')"
        )
    m = re.search(r"WITH qual AS \((.*?)\n\), colls AS \((.*?)\)", oracle, re.S)
    assert m, "oracle shape changed — update the liveness parser"
    con.execute(f"CREATE TEMP TABLE qual AS ({m.group(1)})")
    con.execute(f"CREATE TEMP TABLE colls AS ({m.group(2)})")
    arms = re.findall(
        r"SELECT .*? FROM (qual|colls)(?: WHERE ([^\n]*?))?"
        r"(?=\n  UNION|\n\)\nSELECT)",
        oracle,
        re.S,
    )
    assert arms, "no arms parsed"
    dead = []
    for frm, where in dict.fromkeys(
        (f, w.strip() if w else "") for f, w in arms
    ):
        clause = f" WHERE {where}" if where else ""
        n = con.execute(f"SELECT COUNT(*) FROM {frm}{clause}").fetchone()[0]
        if n == 0:
            dead.append((frm, where))
    assert not dead, f"dead oracle arms in {name}: {dead}"
