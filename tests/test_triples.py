"""Triple-model semantics: melt/pivot round-trip, the reference's
first-value + 'nl'-override rule (stream.ts:97-103), and CONSTRUCT
pattern joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
    construct,
    melt,
    pivot_records,
)


def test_melt_pivot_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "y", None)], "id long, name string, n int"
    )
    t = melt(df, "id", ["name", "n"])
    back = pivot_records(t, ["name", "n"])
    rows = {(r.subject, r.name, r.n) for r in back.collect()}
    assert rows == {("1", "x", "10"), ("2", "y", None)}


def test_pivot_language_override(spark):
    """An 'nl' literal wins over earlier values; otherwise the smallest
    value is kept deterministically."""
    t = spark.createDataFrame(
        [
            ("s1", "label", "english", "en"),
            ("s1", "label", "nederlands", "nl"),
            ("s2", "label", "zzz", None),
            ("s2", "label", "aaa", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = {(r.subject, r.label) for r in pivot_records(t, ["label"]).collect()}
    assert out == {("s1", "nederlands"), ("s2", "aaa")}


def test_construct_joins_on_shared_vars(spark):
    triples = spark.createDataFrame(
        [
            ("c1", "nation", "n1", None),
            ("c2", "nation", "n2", None),
            ("n1", "name", "BE", None),
            ("n2", "name", "NL", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = construct(
        triples,
        patterns=[("?c", "nation", "?n"), ("?n", "name", "?nm")],
    )
    assert {(r.c, r.nm) for r in out.collect()} == {("c1", "BE"), ("c2", "NL")}


def test_construct_constant_filter(spark):
    triples = spark.createDataFrame(
        [
            ("a", "type", "Person", None),
            ("b", "type", "Org", None),
            ("a", "name", "Ann", None),
            ("b", "name", "Acme", None),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = construct(
        triples, patterns=[("?s", "type", "Person"), ("?s", "name", "?n")]
    )
    assert [(r.s, r.n) for r in out.collect()] == [("a", "Ann")]


def _graph(spark):
    return spark.createDataFrame(
        [
            ("c1", "name", "alice", None),
            ("c1", "seg", "BUILDING", None),
            ("c2", "name", "bob", None),
            ("c2", "seg", "AUTO", None),
            ("c3", "name", "carol", None),
            ("c3", "seg", "BUILDING", None),
            ("o1", "cust", "c1", None),
            ("o1", "prio", "URGENT", None),
            ("o2", "cust", "c1", None),
            ("o2", "prio", "LOW", None),
            ("o3", "cust", "c3", None),
            ("o3", "prio", "LOW", None),
            ("c1", "nk", "n1", None),
            ("c3", "nk", "n2", None),
            ("n1", "nname", "BE", None),
            ("n2", "nname", "NL", None),
        ],
        "subject string, predicate string, object string, lang string",
    )


def test_construct_optional_keeps_unmatched(spark):
    """SPARQL OPTIONAL: base rows survive with NULL bindings when the
    optional group doesn't match (c3 has no URGENT order)."""
    out = construct(
        _graph(spark),
        patterns=[("?c", "seg", "BUILDING")],
        optionals=[[("?o", "cust", "?c"), ("?o", "prio", "URGENT")]],
    )
    assert {(r.c, r.o) for r in out.collect()} == {("c1", "o1"), ("c3", None)}


def test_construct_values_inlist(spark):
    out = construct(
        _graph(spark),
        patterns=[("?c", "seg", "?s")],
        values={"?s": ["AUTO"]},
    )
    assert {(r.c, r.s) for r in out.collect()} == {("c2", "AUTO")}


def test_construct_path_sequence_and_inverse(spark):
    """^cust inverse + nk/nname sequence: per URGENT order, the
    customer's nation name through the two-hop path."""
    out = construct(
        _graph(spark),
        patterns=[
            ("?c", "^cust", "?o"),
            ("?o", "prio", "URGENT"),
            ("?c", "nk/nname", "?nn"),
        ],
    )
    rows = out.collect()
    assert {(r.o, r.c, r.nn) for r in rows} == {("o1", "c1", "BE")}
    assert all(not c.startswith("__path") for c in out.columns)


def test_construct_path_alternation(spark):
    out = construct(
        _graph(spark),
        patterns=[("?c", "seg", "BUILDING"), ("?c", "name|seg", "?label")],
    )
    assert {(r.c, r.label) for r in out.collect()} == {
        ("c1", "alice"), ("c1", "BUILDING"),
        ("c3", "carol"), ("c3", "BUILDING"),
    }


def test_construct_union_groups(spark):
    """{A} UNION {B}: branch results union by name (unbound vars NULL)
    and join the base on shared vars."""
    out = construct(
        _graph(spark),
        patterns=[("?c", "seg", "BUILDING")],
        unions=[[
            [("?o", "cust", "?c"), ("?o", "prio", "URGENT")],
            [("?c", "nk", "?n")],
        ]],
    )
    rows = {(r.c, getattr(r, "o", None), getattr(r, "n", None)) for r in out.collect()}
    assert rows == {("c1", "o1", None), ("c1", None, "n1"), ("c3", None, "n2")}


def test_construct_not_exists(spark):
    """FILTER NOT EXISTS removes matches (c1 has an URGENT order)."""
    out = construct(
        _graph(spark),
        patterns=[("?c", "seg", "BUILDING")],
        not_exists=[[("?o", "cust", "?c"), ("?o", "prio", "URGENT")]],
    )
    assert {r.c for r in out.collect()} == {"c3"}


def test_construct_bind_expression(spark):
    out = construct(
        _graph(spark),
        patterns=[("?c", "name", "?nm")],
        binds={"?tag": F.concat(F.lit("person:"), F.col("nm"))},
    )
    assert ("c1", "alice", "person:alice") in {
        (r.c, r.nm, r.tag) for r in out.collect()
    }


def test_construct_lang_constraint(spark):
    triples = spark.createDataFrame(
        [
            ("s1", "label", "english", "en"),
            ("s1", "label", "nederlands", "nl"),
            ("s2", "label", "only-en", "en"),
        ],
        "subject string, predicate string, object string, lang string",
    )
    out = construct(triples, patterns=[("?s", "label", "?l@nl")])
    assert {(r.s, r.l) for r in out.collect()} == {("s1", "nederlands")}


def _quads(spark):
    """A quad store with the same predicate in two named graphs: the
    'real' org names in graph:orgs and a draft copy in graph:staging —
    graph scoping must discriminate between them."""
    return spark.createDataFrame(
        [
            ("c1", "nk", "n1", None, "graph:entities"),
            ("c2", "nk", "n2", None, "graph:entities"),
            ("n1", "nname", "BE", None, "graph:orgs"),
            ("n2", "nname", "NL", None, "graph:orgs"),
            ("n1", "nname", "BE (draft)", None, "graph:staging"),
            ("n2", "nname", "NL (draft)", None, "graph:staging"),
        ],
        "subject string, predicate string, object string, lang string, graph string",
    )


def test_construct_graph_constant_scopes_pattern(spark):
    """GRAPH <g> { pattern }: a constant graph term restricts the
    pattern to that graph's quads (person.sparql:51 shape)."""
    out = construct(
        _quads(spark),
        patterns=[("?c", "nk", "?n"), ("?n", "nname", "?nm", "graph:orgs")],
    )
    assert {(r.c, r.nm) for r in out.collect()} == {("c1", "BE"), ("c2", "NL")}


def test_construct_graph_unscoped_matches_all_graphs(spark):
    """Without a graph term the pattern spans every graph (SPARQL's
    default-graph-as-union store mode) — both copies match."""
    out = construct(_quads(spark), patterns=[("?n", "nname", "?nm")])
    assert out.count() == 4


def test_construct_graph_variable_binds_and_values_prunes(spark):
    """GRAPH ?g binds the graph id as a variable; VALUES on ?g prunes
    to the allowed graphs (the reference's parameterized org graph)."""
    out = construct(
        _quads(spark),
        patterns=[("?n", "nname", "?nm", "?g")],
        values={"?g": ["graph:staging"]},
    )
    rows = {(r.nm, r.g) for r in out.collect()}
    assert rows == {
        ("BE (draft)", "graph:staging"),
        ("NL (draft)", "graph:staging"),
    }


def test_construct_path_in_graph_scopes_every_hop(spark):
    """A property path inside GRAPH g keeps all expanded hops in g
    (SPARQL scoping); a hop whose triple lives elsewhere must not
    match."""
    out = construct(
        _quads(spark),
        patterns=[("?c", "nk/nname", "?nm", "graph:entities")],
    )
    assert out.count() == 0  # nname lives in graph:orgs, not entities


def test_construct_filter_unbound_disjunction(spark):
    """FILTER (!BOUND(?x) || cond(?x)) over an OPTIONAL binding
    (av-audio.sparql:220 conditional-since shape): rows with no binding
    pass, bound rows pass only when the condition holds."""
    out = construct(
        _graph(spark),
        patterns=[("?c", "name", "?nm")],
        optionals=[[("?o", "cust", "?c"), ("?o", "prio", "URGENT")]],
        filters=[F.col("o").isNull() | (F.col("o") == "o1")],
    )
    rows = {(r.c, r.o) for r in out.collect()}
    assert rows == {("c1", "o1"), ("c2", None), ("c3", None)}


def test_melt_graph_column(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    t = melt(df, "id", ["name"], graph="graph:test")
    assert t.columns == ["subject", "predicate", "object", "lang", "graph"]
    assert t.first().graph == "graph:test"


def test_transitive_closure_chain_diamond_cycle(spark):
    """p+ semantics on known graphs: a worst-case chain (forces the
    doubling loop past one iteration), a diamond (duplicate paths
    collapse), and a 2-cycle (terminates; both nodes become their own
    ancestors through the cycle)."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
        transitive_closure,
    )

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "child string, parent string"
    )
    got = {
        (r.node, r.ancestor) for r in transitive_closure(chain).collect()
    }
    want = {(f"n{i}", f"n{j}") for i in range(6) for j in range(i + 1, 7)}
    assert got == want

    diamond = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "child string, parent string",
    )
    got = {
        (r.node, r.ancestor) for r in transitive_closure(diamond).collect()
    }
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "d"), ("c", "d")
    }

    cycle = spark.createDataFrame(
        [("x", "y"), ("y", "x")], "child string, parent string"
    )
    got = {
        (r.node, r.ancestor) for r in transitive_closure(cycle).collect()
    }
    assert got == {("x", "y"), ("y", "x"), ("x", "x"), ("y", "y")}


def test_transitive_closure_known_depth_equals_fixpoint(spark):
    """The metadata-depth fast path (no convergence counts) must return
    the same closure as fixpoint detection, including when known_depth
    is an over-estimate."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
        transitive_closure,
    )

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "child string, parent string"
    )
    fix = {(r.node, r.ancestor) for r in transitive_closure(chain).collect()}
    for depth in (6, 9):
        fast = {
            (r.node, r.ancestor)
            for r in transitive_closure(chain, known_depth=depth).collect()
        }
        assert fast == fix


def test_pagerank_resumable_restart_is_bit_identical(spark, tmp_path):
    """A48: stop after iteration 1 (simulated by running iters=1 to a
    store), then RESUME with iters=2 against the same store — the
    resumed fixpoint must equal a straight-through iters=2 run
    bit-for-bit (exact integer arithmetic survives the storage
    round-trip; float ranks would drift)."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
        pagerank_int,
        pagerank_int_resumable,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4)],
        "src long, dst long",
    )
    state = str(tmp_path / "ranks")
    first = pagerank_int_resumable(spark, edges, state, iters=1)
    assert first.count() == 4
    resumed = {
        (r.node, r.rank)
        for r in pagerank_int_resumable(spark, edges, state, iters=2).collect()
    }
    straight = {
        (r.node, r.rank) for r in pagerank_int(edges, iters=2).collect()
    }
    assert resumed == straight


def test_minus_disjoint_domains_is_identity(spark):
    """SPARQL MINUS quirk (1.1 §8.3): a MINUS group sharing NO variable
    with the base removes NOTHING — while FILTER NOT EXISTS with the
    same (matching) group erases every base row."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.triples import (
        construct,
        melt,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, v int"
    )
    triples = melt(df, "k")
    base = [("?s", "name", "?n")]
    disjoint = [[("?x", "v", "?y")]]  # matches rows, shares no var
    kept = construct(triples, base, minus=disjoint)
    assert kept.count() == 2  # MINUS: identity
    # NOT EXISTS sharing no var is rejected loudly at plan build
    # (ambiguous intent), where MINUS defines it as identity.
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        construct(triples, base, not_exists=[[("?s2", "v", "?y")]])
    shared = construct(
        triples, base, minus=[[("?s", "v", "10")]]
    )
    assert {r["n"] for r in shared.collect()} == {"b"}  # shared var: removes
