"""Triple-model operators: the knowledge-graph layer.

The reference's data model is an RDF graph streamed as triples; its two
fundamental moves are
  (1) CONSTRUCT: pattern-match the graph, emit relational-shaped triples
      (typescript/queries/*.sparql via 1_kg_view_construct.ts), and
  (2) record pivot: consecutive same-subject triples -> one wide record
      (typescript/src/stream.ts:51-116 RecordContructor).

Spark-first redesign:
- A graph is a DataFrame (subject, predicate, object, lang). ``melt``
  turns any relational table into that shape (pure projection + stack —
  narrow, no shuffle, scan-fused).
- ``pivot_records`` is ONE hash aggregation keyed by subject: for each
  wanted column take the value with the smallest (lang_priority, object)
  — deterministic at any parallelism, unlike the reference's
  stream-order-dependent first-value rule. lang='nl' overrides, as in
  stream.ts:97-103.
- ``construct`` compiles a SPARQL-like basic graph pattern into
  self-joins on the triples DataFrame; shared variables become join
  keys. Catalyst/AQE then picks physical join strategies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    key: str,
    columns: list[str] | None = None,
    subject_prefix: str = "",
    graph: str | None = None,
) -> DataFrame:
    """Wide table -> (subject, predicate, object string, lang, graph)
    quads.

    Inverse of the reference's record pivot; lang is NULL (testdata has
    no language-tagged literals). ``graph`` names the named graph these
    triples live in (SPARQL ``GRAPH ?g { ... }`` scoping — the
    reference's TriplyDB store is quad-shaped, person.sparql:51); NULL
    means the default graph. stack() is a generator expression — no
    shuffle, runs fused with the parquet scan.
    """
    cols = columns or [c for c in df.columns if c != key]
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    subject = F.concat(F.lit(subject_prefix), F.col(key).cast("string"))
    return (
        df.select(
            subject.alias("subject"),
            F.expr(f"stack({len(cols)}, {pairs}) as (predicate, object)"),
        )
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(graph).cast("string"))
        .filter(F.col("object").isNotNull())
    )


def pivot_records(
    triples: DataFrame,
    predicates: list[str],
    subject_col: str = "subject",
    preferred_lang: str = "nl",
) -> DataFrame:
    """Triples -> one record per subject; first-value-wins, language
    override (stream.ts:51-116).

    Deterministic distributed semantics: per (subject, predicate) keep
    the object of the triple minimizing (lang != preferred_lang, object).
    Single hash-aggregate shuffle on subject; min(struct) gives map-side
    partial aggregation, so the shuffle carries one row per
    (subject, predicate) — this survives a 100 TB triple scan.
    """
    prio = F.when(F.col("lang") == preferred_lang, 0).otherwise(1)
    picked = F.struct(prio.alias("p"), F.col("object").alias("o"))
    aggs = [
        F.min(F.when(F.col("predicate") == p, picked)).getField("o").alias(p)
        for p in predicates
    ]
    return triples.groupBy(F.col(subject_col).alias("subject")).agg(*aggs)


_PATH_VAR = 0


def _expand_paths(patterns: list[tuple]) -> list[tuple]:
    """Rewrite SPARQL property paths into plain patterns:
      - sequence  ``p1/p2``  -> two patterns through a fresh variable
        (a join through the intermediate node);
      - inverse   ``^p``     -> swapped subject/object roles.
    Alternation ``p1|p2`` is handled at scan time (predicate isin).
    The reference queries use all three (e.g. person.sparql:
    ``(schema:license|(rel:isp/schema:license))``, ``^schema:mentions``).

    A pattern may be a 4-tuple (s, p, o, graph); the graph term is
    carried through every expansion (a path inside ``GRAPH ?g {...}``
    keeps all its hops in that graph).
    """
    global _PATH_VAR
    out: list[tuple] = []
    for pat in patterns:
        s, p, o = pat[0], pat[1], pat[2]
        g = pat[3:]  # () for triple patterns, (graph_term,) for quads
        if not p.startswith("?") and "/" in p:
            hops = p.split("/")
            prev = s
            for i, hop in enumerate(hops):
                if i == len(hops) - 1:
                    out.extend(_expand_paths([(prev, hop, o, *g)]))
                else:
                    _PATH_VAR += 1
                    mid = f"?__path{_PATH_VAR}"
                    out.extend(_expand_paths([(prev, hop, mid, *g)]))
                    prev = mid
        elif p.startswith("^"):
            out.append((o, p[1:], s, *g))
        else:
            out.append((s, p, o, *g))
    return out


def _bgp(
    triples: DataFrame,
    patterns: list[tuple],
    values: dict[str, list[str]] | None = None,
) -> tuple[DataFrame, set[str]]:
    """Evaluate one basic graph pattern group; returns (df, bound vars).

    Patterns are (s, p, o) triples or (s, p, o, graph) quads; the graph
    term scopes the pattern to one named graph (constant) or binds the
    graph id (?variable) — SPARQL ``GRAPH ?g { ... }`` semantics
    (person.sparql:51 org-graph scoping). A constant/VALUES-constrained
    graph term is a plain filter on the quad scan, so it prunes at the
    source like any other predicate."""
    values = values or {}
    out: DataFrame | None = None
    bound: set[str] = set()
    for pat in _expand_paths(patterns):
        s, p, o = pat[0], pat[1], pat[2]
        t = triples
        sel = []
        if p.startswith("?"):
            sel.append(F.col("predicate").alias(p[1:]))
        elif p.startswith("!"):
            # Negated property set ``!p`` / ``!(p1|p2)`` (SPARQL 1.1
            # §9.1): any predicate EXCEPT the listed ones — still one
            # scan, the complement in-list. On the predicate-partitioned
            # staged layout this prunes to all-but-those partitions.
            negated = p[1:].strip("()").split("|")
            t = t.filter(~F.col("predicate").isin(negated))
        elif "|" in p:  # path alternation: one scan, predicate isin
            t = t.filter(F.col("predicate").isin(p.split("|")))
        else:
            t = t.filter(F.col("predicate") == p)
        terms = [(s, "subject"), (o, "object")]
        if len(pat) > 3:
            terms.append((pat[3], "graph"))
        for term, col in terms:
            if term.startswith("?"):
                # '?var@nl' = langMatches constraint on this binding
                # (person.sparql:81 FILTER langMatches(lang(...), "nl")).
                if "@" in term:
                    term, lang = term.split("@", 1)
                    t = t.filter(F.col("lang") == lang)
                sel.append(F.col(col).alias(term[1:]))
                if term in values:  # SPARQL VALUES: an in-list pushed to the scan
                    t = t.filter(F.col(col).isin(values[term]))
            else:
                t = t.filter(F.col(col) == term)
        t = t.select(*sel)
        new_vars = set(t.columns)
        if out is None:
            out = t
        else:
            keys = sorted(bound & new_vars)
            out = out.join(t, on=keys, how="inner") if keys else out.crossJoin(t)
        bound |= new_vars
    assert out is not None, "empty pattern list"
    return out, bound


def construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: dict[str, str] | None = None,
    filters: list[Column] | None = None,
    optionals: list[list[tuple[str, str, str]]] | None = None,
    values: dict[str, list[str]] | None = None,
    unions: list[list[list[tuple[str, str, str]]]] | None = None,
    not_exists: list[list[tuple[str, str, str]]] | None = None,
    minus: list[list[tuple[str, str, str]]] | None = None,
    binds: dict[str, Column] | None = None,
    values_rows: list[dict[str, str]] | None = None,
) -> DataFrame:
    """Evaluate a SPARQL-shaped WHERE clause and project bound variables
    — the CONSTRUCT core of 1_kg_view_construct.ts.

    ``patterns``: (subject_var, predicate, object_var) entries — or
    (subject, predicate, object, graph) quads, where the graph term
    scopes the pattern to a named graph (constant) or binds the graph
    id (?variable), i.e. SPARQL ``GRAPH ?g { ... }``
    (person.sparql:51). Names starting with '?' are variables, anything
    else is a constant. The predicate slot accepts property paths:
    ``p1/p2`` sequence, ``p1|p2`` alternation, ``^p`` inverse (the
    forms the reference queries use). Each pattern is a
    predicate-filtered scan of the triples DataFrame; shared variables
    across patterns become equi-join keys.

    ``optionals``: SPARQL OPTIONAL groups — each group is evaluated as
    its own BGP and LEFT-joined on the shared variables (unmatched rows
    keep NULL bindings), exactly SPARQL's OPTIONAL semantics.

    ``values``: SPARQL VALUES — variable -> allowed constants, applied
    as an in-list filter at the scans that bind the variable.

    ``unions``: SPARQL group UNION — each entry is a list of BGP
    branches; the branches are evaluated independently, unioned by
    name (missing variables become NULL, as SPARQL leaves them
    unbound), and joined to the base on the shared variables.

    ``not_exists``: FILTER NOT EXISTS groups — each group is a BGP
    whose matches eliminate base rows (left-anti join on shared vars).

    ``minus``: SPARQL MINUS groups (1.1 §8.3) — like NOT EXISTS an
    anti join on the shared variables, EXCEPT the spec's quirk: a
    MINUS group sharing NO variable with the base removes NOTHING
    (set difference over disjoint domains is the identity), where
    FILTER NOT EXISTS with a non-empty match would eliminate
    everything. Both semantics live here, distinguished exactly as
    the spec distinguishes them.

    ``binds``: SPARQL BIND — variable -> Column expression over already
    bound variables, applied after graph matching.

    ``values_rows``: SPARQL VALUES in its FULL multi-variable row form
    (1.1 §10.2): ``VALUES (?a ?b) { (x y) (z w) }`` — each dict is one
    row binding several variables TOGETHER (the single-var ``values``
    in-list cannot express correlated allowed combinations). The rows
    become a literal inline-data frame inner-joined on its variables —
    a broadcast of |rows|, never a per-row filter disjunction.

    An object variable may carry a language constraint: ``?name@nl``
    binds only language-tagged 'nl' literals (langMatches).

    Returns one column per variable (without the '?'); internal
    ``__path``-prefixed sequence variables are dropped.
    """
    out, bound = _bgp(triples, patterns, values)
    for branches in unions or []:
        parts = []
        uvars: set[str] = set()
        for branch in branches:
            b, bvars = _bgp(triples, branch, values)
            parts.append(b)
            uvars |= bvars
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p, allowMissingColumns=True)
        keys = sorted(bound & uvars)
        out = out.join(u, on=keys, how="inner") if keys else out.crossJoin(u)
        bound |= uvars
    for group in optionals or []:
        g, gvars = _bgp(triples, group, values)
        keys = sorted(bound & gvars)
        out = out.join(g, on=keys, how="left") if keys else out.crossJoin(g)
        bound |= gvars
    for group in not_exists or []:
        g, gvars = _bgp(triples, group, values)
        keys = sorted(bound & gvars)
        assert keys, "FILTER NOT EXISTS group shares no variable with the base"
        out = out.join(g.select(*keys).distinct(), on=keys, how="left_anti")
    for group in minus or []:
        g, gvars = _bgp(triples, group, values)
        keys = sorted(bound & gvars)
        if not keys:  # SPARQL MINUS over disjoint domains: identity
            continue
        out = out.join(g.select(*keys).distinct(), on=keys, how="left_anti")
    if values_rows:
        vr_vars = sorted({v.lstrip("?") for row in values_rows for v in row})
        spark = triples.sparkSession
        frame = spark.createDataFrame(
            [tuple(row.get("?" + v) for v in vr_vars) for row in values_rows],
            ", ".join(f"{v} string" for v in vr_vars),
        )
        keys = sorted(bound & set(vr_vars))
        assert keys, "VALUES rows bind no variable of the query"
        out = out.join(F.broadcast(frame), on=keys, how="inner")
        bound |= set(vr_vars)
    for var, expr in (binds or {}).items():
        out = out.withColumn(var.lstrip("?"), expr)
    if filters:
        for f in filters:
            out = out.filter(f)
    out = out.select(*[c for c in out.columns if not c.startswith("__path")])
    if select:
        out = out.select(*[F.col(v).alias(a) for v, a in select.items()])
    return out


def to_table_triples(
    records: DataFrame, table_name: str, id_col: str
) -> DataFrame:
    """Tag records with the reference's ':tableName' routing triple
    (stream.ts:90-91 TABLE_PRED) — relational-shaped triples ready for
    the batch/stage step. Kept as a column, not a row, Spark-side."""
    return records.withColumn("table_name", F.lit(table_name)).withColumn(
        "record_id", F.col(id_col).cast("string")
    )


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iters: int = 16,
    known_depth: int | None = None,
) -> DataFrame:
    """SPARQL ``p+`` (one-or-more property path): all (node, ancestor)
    pairs reachable through 1..n ``p`` edges — the transitive-path
    operator the construct layer's sequence/alternation/inverse support
    (kg_construct_paths) deliberately left out while the reference used
    none; with it the path algebra is complete.

    POINTER DOUBLING, not one-hop expansion: after iteration k the pair
    set covers paths up to 2^k edges, so a depth-D hierarchy converges
    in ceil(log2(D)) joins instead of D (3 joins reach depth 8). Each
    iteration is one self-join of the pair set on the meet node plus a
    distinct — both shuffles keyed on node ids. Convergence = exact
    pair-count fixpoint (monotone increasing; one scalar agg per
    iteration), with ``max_iters`` bounding adversarial chains (2^16
    hops covered at the default). ``localCheckpoint`` truncates the
    doubling lineage; on a real cluster prefer ``checkpoint`` with a
    reliable dir if executor loss mid-loop must be survivable.

    Cycles are tolerated (the pair set just stops growing); a node is
    NOT its own ancestor unless a cycle makes it one. Output:
    (node, ancestor) distinct pairs.

    ``known_depth``: when the hierarchy's maximum path length is known
    from catalog metadata (an FK chain's depth, a taxonomy's level
    count), pass it to run exactly ceil(log2(depth)) doubling
    iterations with NO per-iteration convergence counts — the
    fixpoint scan exists only to discover the depth, so knowing it
    removes one action per iteration plus the final no-growth
    iteration (measured ~1/3 of wall on the bench hierarchy).
    """
    import math

    paths = (
        edges.select(
            F.col(child_col).alias("node"), F.col(parent_col).alias("ancestor")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if known_depth is not None:
        for _ in range(max(1, math.ceil(math.log2(max(2, known_depth))))):
            hop = paths.select(
                F.col("node").alias("h_node"), F.col("ancestor").alias("h_anc")
            )
            paths = (
                paths.join(hop, paths.ancestor == hop.h_node)
                .select("node", F.col("h_anc").alias("ancestor"))
                .unionByName(paths)
                .distinct()
                .localCheckpoint(eager=True)
            )
        return paths
    prev_n = paths.count()
    for _ in range(max_iters):
        hop = paths.select(
            F.col("node").alias("h_node"), F.col("ancestor").alias("h_anc")
        )
        doubled = (
            paths.join(hop, paths.ancestor == hop.h_node)
            .select("node", F.col("h_anc").alias("ancestor"))
            .unionByName(paths)
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur_n = doubled.count()
        paths = doubled
        if cur_n == prev_n:
            break
        prev_n = cur_n
    return paths


def pagerank_int(
    edges: DataFrame,
    iters: int = 2,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """PageRank in EXACT INTEGER arithmetic — the weighted-iteration
    graph algorithm next to the closure (reachability) and the
    components (connectivity), engine-exactly reproducible the same
    way kmeans_int is: ranks live in ``scale`` units, the damping
    split is integer (85/100), and every contribution is a floor
    division — all values nonnegative, so floor == truncation and
    Spark's ``div`` agrees with any SQL engine's ``//``. That makes
    the ITERATIVE fixpoint SQL-oracle-checkable unrolled, which float
    PageRank cannot (per-iteration ulp drift compounds).

    Per iteration: one join of the edge list to the rank state (keyed
    shuffle), one aggregation of contributions by destination, one
    left join back to the node universe (nodes without in-edges keep
    the base term). Dangling mass (nodes without OUT-edges) is
    DROPPED, the standard simplification — ranks then sum to less
    than ``scale``; documented so the oracle mirrors it. Returns
    (node, rank).

    Edges and the node universe MATERIALIZE once (localCheckpoint,
    the cluster_components precedent): every iteration references
    both, and without truncation the unrolled lineage re-executes the
    edge derivation per reference — measured 35 exchanges for 2
    iterations vs 14 after."""
    edges = edges.localCheckpoint(eager=True)
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.unionByName(dst_nodes).distinct().localCheckpoint(
        eager=True
    )
    # The node count is a SCALAR over an already-materialized
    # checkpoint: read it once on the driver (bounded, one bigint)
    # and fold it into the plan as a literal, instead of the
    # crossJoin(broadcast(count-agg)) subtree the pre-r12 plan
    # re-evaluated in the init frame AND per iteration (3 extra
    # count-agg + BroadcastNestedLoopJoin stages in the executed
    # plan; guide §2.4 — remove shuffles outright). Integer semantics
    # identical: Python // == Spark div for nonnegative operands.
    n = nodes.count()
    # The out-degree is iteration-INVARIANT: fold it into the edge
    # list once (one join, materialized) instead of re-joining it to
    # the contribution stream every iteration (r6 perf pass — saves a
    # keyed shuffle per iteration).
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(outdeg, "src").localCheckpoint(eager=True)
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("rank")
    )
    base = scale * (damp_den - damp_num) // (damp_den * n)
    for _ in range(iters):
        contrib = edges_deg.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        ).select(
            "dst",
            F.expr(f"rank * {damp_num} div ({damp_den} * deg)").alias("c"),
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            nodes
            .join(inc, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("inc"), F.lit(0))
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_int_resumable(
    spark,
    edges: DataFrame,
    store_path: str,
    iters: int = 2,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """A48: ``pagerank_int`` with DURABLE iteration state — the
    restartable form of a long iterative job: each completed iteration
    lands the rank table (tagged ``_iter``) as the next version of a
    store table (one atomic pointer swap), so a driver crash loses at
    most the in-flight iteration and the retry RESUMES from the last
    landed one instead of recomputing from rank zero. localCheckpoint
    survives executor memory only; at 100 TB a multi-hour iterative
    job checkpoints to reliable storage exactly like this, and the
    exact integer arithmetic makes resumed-vs-straight-through runs
    BIT-IDENTICAL (float ranks would drift across the write/read
    round-trip). Same fixpoint as pagerank_int — the A43 oracle."""
    from prefect_flow_arc_kg_postgres_etl_spark.sources import store

    edges = edges.localCheckpoint(eager=True)
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.unionByName(dst_nodes).distinct().localCheckpoint(
        eager=True
    )
    # Driver-side scalar count of the materialized node set, folded
    # in as a literal — same rationale as pagerank_int (guide §2.4).
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(outdeg, "src").localCheckpoint(eager=True)
    base = scale * (damp_den - damp_num) // (damp_den * n)
    if store.table_exists(store_path):
        state = store.read_table(spark, store_path)
        done = state.select(F.max("_iter")).first()[0]
        ranks = state.select("node", "rank")
    else:
        done = 0
        ranks = nodes.select(
            "node", F.lit(scale // n).cast("long").alias("rank")
        )
        store.write_table(
            ranks.withColumn("_iter", F.lit(0)), store_path
        )
    for it in range(done + 1, iters + 1):
        contrib = edges_deg.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        ).select(
            "dst",
            F.expr(f"rank * {damp_num} div ({damp_den} * deg)").alias("c"),
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            nodes
            .join(inc, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("inc"), F.lit(0))
                ).alias("rank"),
            )
        )
        store.write_table(ranks.withColumn("_iter", F.lit(it)), store_path)
        # read back the landed version: iteration i+1 consumes STORAGE,
        # not lineage — a restart resolves the identical frame.
        ranks = store.read_table(spark, store_path).select("node", "rank")
    return ranks
