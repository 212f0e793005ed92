"""Property-based differential testing of the SPARQL text compiler.

Hypothesis generates small random quad stores and random queries
(BGPs with shared variables, OPTIONAL groups, UNION branches —
including the fused single-pattern shape — and equality FILTERs),
renders them to query TEXT (so the parser is exercised too), and
compares ``construct_query``'s output against a 40-line reference
evaluator implementing SPARQL semantics directly (compatible-binding
joins, left-join OPTIONAL, bag UNION, post-filter, distinct CONSTRUCT
output). This pins the compiler's algebra on shapes the nine
production files never take.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prefect_flow_arc_kg_postgres_etl_spark.operators import sparql as SQ

SUBJECTS = [f"urn:s{i}" for i in range(4)]
PREDS = [f"urn:p{i}" for i in range(3)]
OBJECTS = [f"urn:o{i}" for i in range(3)] + SUBJECTS[:2]
VARS = ["?a", "?b", "?c"]


quad_st = st.tuples(
    st.sampled_from(SUBJECTS), st.sampled_from(PREDS), st.sampled_from(OBJECTS)
)
store_st = st.lists(quad_st, min_size=1, max_size=14, unique=True)

term_s = st.one_of(st.sampled_from(VARS), st.sampled_from(SUBJECTS))
term_o = st.one_of(st.sampled_from(VARS), st.sampled_from(OBJECTS))
triple_st = st.tuples(term_s, st.sampled_from(PREDS), term_o)


def _bgp_vars(triples):
    return {t for tr in triples for t in (tr[0], tr[2]) if t.startswith("?")}


query_st = st.fixed_dictionaries(
    {
        "bgp": st.lists(triple_st, min_size=1, max_size=3),
        "optional": st.one_of(st.none(), triple_st),
        "union": st.one_of(st.none(), st.tuples(triple_st, triple_st)),
        "filter_eq": st.booleans(),
    }
)


def _render(term: str) -> str:
    return term if term.startswith("?") else f"<{term}>"


def _render_triple(tr) -> str:
    return f"{_render(tr[0])} <{tr[1]}> {_render(tr[2])} ."


def _to_text(q) -> str:
    lines = [_render_triple(t) for t in q["bgp"]]
    if q["optional"] is not None:
        lines.append("OPTIONAL { %s }" % _render_triple(q["optional"]))
    if q["union"] is not None:
        a, b = q["union"]
        lines.append(
            "{ %s } UNION { %s }" % (_render_triple(a), _render_triple(b))
        )
    fvars = sorted(_bgp_vars(q["bgp"]))
    if q["filter_eq"] and len(fvars) >= 2:
        lines.append(f"FILTER ({fvars[0]} = {fvars[1]})")
    body = "\n  ".join(lines)
    return (
        "PREFIX out: <urn:out:>\n"
        "CONSTRUCT { ?a out:r1 ?b . ?b out:r2 ?c . ?a out:r3 <urn:k> }\n"
        "WHERE {\n  %s\n}" % body
    )


# ---- reference evaluator (SPARQL algebra on Python sets/lists) ----
def _match(tr, quads, binding):
    s, p, o = tr
    for qs, qp, qo in quads:
        if qp != p:
            continue
        b = dict(binding)
        ok = True
        for term, val in ((s, qs), (o, qo)):
            if term.startswith("?"):
                if term in b and b[term] != val:
                    ok = False
                    break
                b[term] = val
            elif term != val:
                ok = False
                break
        if ok:
            yield b


def _eval_bgp(triples, quads, bindings):
    for tr in triples:
        bindings = [b2 for b in bindings for b2 in _match(tr, quads, b)]
    return bindings


def _ref_eval(q, quads):
    sols = _eval_bgp(q["bgp"], quads, [{}])
    if q["optional"] is not None:
        out = []
        for b in sols:
            ext = list(_match(q["optional"], quads, b))
            out.extend(ext if ext else [b])
        sols = out
    if q["union"] is not None:
        a, b_ = q["union"]
        out = []
        for b in sols:
            out.extend(_match(a, quads, b))
            out.extend(_match(b_, quads, b))
        sols = out
    fvars = sorted(_bgp_vars(q["bgp"]))
    if q["filter_eq"] and len(fvars) >= 2:
        sols = [
            b
            for b in sols
            if fvars[0] in b and fvars[1] in b and b[fvars[0]] == b[fvars[1]]
        ]
    out = set()
    for b in sols:
        if "?a" in b and "?b" in b:
            out.add((b["?a"], "urn:out:r1", b["?b"]))
        if "?b" in b and "?c" in b:
            out.add((b["?b"], "urn:out:r2", b["?c"]))
        if "?a" in b:
            out.add((b["?a"], "urn:out:r3", "urn:k"))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(store=store_st, q=query_st)
def test_construct_matches_reference_evaluator(spark, store, q):
    quads_df = spark.createDataFrame(
        [(s, p, o, None, None) for s, p, o in store],
        "subject string, predicate string, object string, "
        "lang string, graph string",
    )
    SQ.clear_plan_cache()
    got = {
        (r.subject, r.predicate, r.object)
        for r in SQ.construct_query(quads_df, _to_text(q)).collect()
    }
    assert got == _ref_eval(q, store)
