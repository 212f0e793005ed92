"""Curation operators (operators/curation.py): decontamination removes
exactly the overlapping docs, stratified sampling is a deterministic
pure function of (id, fraction), packing respects the offset-bin
contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    sample_stratified,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_decontaminate_drops_overlap_keeps_rest(spark):
    bench = _df(
        spark,
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id bigint, text string",
    )
    train = _df(
        spark,
        [
            # shares the full 8-gram window with the benchmark doc
            (10, "x alpha beta gamma delta epsilon zeta eta theta y"),
            # 7-gram overlap only — must survive at n=8
            (11, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
            (12, "completely unrelated text with enough tokens to form grams ok"),
        ],
        "doc_id bigint, text string",
    )
    kept = {r.doc_id for r in decontaminate(train, bench, n=8).collect()}
    assert kept == {11, 12}


def test_sample_stratified_deterministic_subset(spark):
    docs = _df(
        spark,
        [(i, "en" if i % 2 == 0 else "de") for i in range(1000)],
        "doc_id bigint, lang string",
    )
    frac = {"en": 0.4}
    a = {r.doc_id for r in sample_stratified(docs, "lang", frac).collect()}
    b = {
        r.doc_id
        for r in sample_stratified(
            docs.repartition(7), "lang", frac
        ).collect()
    }
    assert a == b, "kept set must not depend on partitioning"
    assert all(i % 2 == 0 for i in a), "unlisted strata must drop"
    # LCG buckets are near-uniform: 40% +/- a loose tolerance of 500 docs
    assert 0.25 <= len(a) / 500 <= 0.55
    # fraction monotonicity: a smaller fraction keeps a subset
    smaller = {
        r.doc_id
        for r in sample_stratified(docs, "lang", {"en": 0.2}).collect()
    }
    assert smaller <= a


def test_pack_sequences_offset_bins(spark):
    docs = _df(
        spark,
        [(i, 40, "s") for i in range(10)] + [(100, 500, "s")],
        "doc_id bigint, est_tokens bigint, source string",
    )
    out = pack_sequences(docs, 100, tokens_col="est_tokens", part_col="source")
    rows = sorted(
        ((r.doc_id, r.pack_id) for r in out.collect()), key=lambda t: t[0]
    )
    # prefix sums 0,40,80,120,... -> packs 0,0,0,1,1,2,2,2,3,3; the
    # 500-token doc starts at offset 400 -> pack 4, and the straddling
    # doc (start 80) stays whole in pack 0 (offset-bin contract).
    assert [p for _, p in rows] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3, 4]


def test_pack_sequences_scoped_per_partition(spark):
    docs = _df(
        spark,
        [(1, 60, "a"), (2, 60, "a"), (3, 60, "b"), (4, 60, "b")],
        "doc_id bigint, est_tokens bigint, source string",
    )
    out = pack_sequences(docs, 100, tokens_col="est_tokens", part_col="source")
    packs = {(r.source, r.doc_id): r.pack_id for r in out.collect()}
    # each shard starts its own pack numbering at 0
    assert packs[("a", 1)] == 0 and packs[("b", 3)] == 0
    assert packs[("a", 2)] == 0 and packs[("b", 4)] == 0


def test_pii_redact_counts_and_replaces(spark):
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import (
        EMAIL_RE,
        PHONE_RE,
        pii_redact,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and x@y.io call +1-555-0123 done"),
            (2, "no pii here"),
            (3, "+1-000-9999 only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones) == (2, 1)
    assert (out[2].n_emails, out[2].n_phones) == (0, 0)
    assert (out[3].n_emails, out[3].n_phones) == (0, 1)
    # and the redacted text truly contains no remaining matches
    red = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("r"),
    )
    leftover = red.filter(
        F.col("r").rlike(EMAIL_RE) | F.col("r").rlike(PHONE_RE)
    ).count()
    assert leftover == 0
    assert red.filter("doc_id = 1").first().r == (
        "mail <EMAIL> and <EMAIL> call <PHONE> done"
    )


def test_repetition_stats_known_ratios(spark):
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct; bigrams "a a" x3
            (2, "w x y z"),          # no repetition at all
            (3, "one"),              # single token: no bigrams
            (4, ""),                 # empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert (out[1].n_tokens, out[1].n_distinct_tokens) == (4, 1)
    assert out[1].token_rep_ratio == 0.75
    assert out[1].bigram_rep_ratio == round(1 - 1 / 3, 6)
    assert out[2].token_rep_ratio == 0.0 and out[2].bigram_rep_ratio == 0.0
    assert out[3].n_tokens == 1 and out[3].bigram_rep_ratio == 0.0
    assert out[4].n_tokens == 0 and out[4].token_rep_ratio == 0.0


def test_sample_to_mixture_binding_source_kept_whole(spark):
    """The binding source (smallest count/weight) survives intact and
    the others are down-sampled toward the target ratio; the kept set
    is a pure function of ids (re-run identical)."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.curation import (
        sample_to_mixture,
    )

    rows = [(i, "a") for i in range(100)] + [(i + 1000, "b") for i in range(400)]
    df = _df(spark, rows, "doc_id long, src string")
    out = sample_to_mixture(df, "src", {"a": 1.0, "b": 1.0}, id_col="doc_id")
    by_src = {r["src"]: r["n"] for r in out.groupBy("src").agg(
        F.count("*").alias("n")).collect()}
    assert by_src["a"] == 100          # binding source kept whole
    assert 80 <= by_src["b"] <= 120    # ~100 of 400 at the LCG threshold
    again = sample_to_mixture(df, "src", {"a": 1.0, "b": 1.0}, id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_assign_shards_dense_positions_cover_all_rows(spark):
    """Every row lands in exactly one shard; positions are dense
    1..count(shard); the layout is id-determined (stable re-run)."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.curation import (
        assign_shards,
    )

    df = _df(spark, [(i,) for i in range(97)], "doc_id long")
    out = assign_shards(df, 4).collect()
    assert len(out) == 97
    assert {r.shard for r in out} <= {0, 1, 2, 3}
    from collections import defaultdict

    per = defaultdict(list)
    for r in out:
        per[r.shard].append(r.pos)
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom-prefiltered path must return EXACTLY the exact path's
    survivors (no false negatives by construction, false positives
    removed by the verify leg) — including at a deliberately tiny
    filter (words=8) where nearly every word is saturated and the
    verify leg does all the work."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.curation import (
        decontaminate_bloom,
    )

    bench = _df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    train = _df(
        spark,
        [
            (10, "x alpha beta gamma delta epsilon zeta eta theta y"),
            (11, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
            (12, "completely unrelated text with enough tokens to form grams ok"),
            (13, "zz one two three four five six seven eight nine ten zz"),
            (14, "ten nine eight seven six five four three two one reversed"),
        ],
        "doc_id bigint, text string",
    )
    exact = {r.doc_id for r in decontaminate(train, bench, n=8).collect()}
    for words in (8, 1 << 14):
        bloom = {
            r.doc_id
            for r in decontaminate_bloom(
                train, bench, n=8, words=words
            ).collect()
        }
        assert bloom == exact, f"words={words}: {bloom} != {exact}"
    assert exact == {11, 12, 14}


def test_edit_verified_pairs_separates_revisions_from_rearrangements(spark):
    """A doc and its lightly-edited revision pass both gates; a
    rearrangement sharing most 1-gram vocabulary but few 3-gram
    sequences never reaches the edit check (fails Jaccard); a revision
    with a big inserted block passes Jaccard but exceeds max_edits."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.dedup import (
        edit_verified_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    revision = base + " tail"
    big_insert = base + " " + " ".join("pad" for _ in range(12))
    docs = _df(
        spark,
        [(1, base), (2, revision), (3, big_insert)],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in edit_verified_pairs(
            docs, jaccard_threshold=0.6, max_edits=10, prefix_chars=500
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 5  # " tail"
    assert (1, 3) not in pairs  # 48 inserted chars > max_edits
    # the threshold DP returns -1 above max_edits — nothing >10 leaks
    assert all(0 <= d <= 10 for d in pairs.values())


def test_chunk_overlap_reconstructs_documents(spark):
    """D40: chunks tile every document — stride-prefixes of consecutive
    chunks concatenate back to the exact original text, and each
    non-final neighbor pair shares a 50-char overlap."""
    from prefect_flow_arc_kg_postgres_etl_spark.plans.pipeline import (
        _CHUNK_S,
        _CHUNK_W,
        corpus_chunk_overlap,
    )
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    chunks = corpus_chunk_overlap(spark, sf).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
    assert set(by_doc) == set(texts)
    for doc_id, parts in by_doc.items():
        ordered = [parts[i] for i in range(len(parts))]
        rebuilt = "".join(c[:_CHUNK_S] for c in ordered[:-1]) + ordered[-1]
        assert rebuilt == texts[doc_id], f"doc {doc_id} does not tile"
        for a, b in zip(ordered, ordered[1:]):
            assert a[_CHUNK_S:] == b[: _CHUNK_W - _CHUNK_S], "overlap mismatch"


def test_bpe_learn_greedy_leftmost_and_equal_symbol_runs(spark):
    """BPE merge learning (D55): pin the greedy leftmost-non-overlapping
    contract against a hand-computed vocabulary, including the
    equal-symbol run case where 'tttt' must merge as (tt)(tt) — two
    non-overlapping merges, never three overlapping ones."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import bpe_learn

    words = spark.createDataFrame(
        [("tttt", 10), ("low", 6), ("lower", 2)], "w string, cnt long"
    )
    got = {r["rnd"]: r for r in bpe_learn(words, rounds=3).collect()}
    # Round 0: pairs — (t,t) appears 3x per 'tttt' occurrence = 30;
    # (l,o) = 8; (o,w) = 8; (w,e) = 2; (e,r) = 2. Argmax = (t,t).
    assert (got[0]["sym_left"], got[0]["sym_right"]) == ("t", "t")
    assert got[0]["pair_count"] == 30
    # Round 1: 'tttt' is now [tt, tt] (greedy leftmost: offsets 0 and 2;
    # the overlapping middle pair must NOT have merged). (tt,tt) = 10;
    # (l,o) = 8 — tiebreak/count picks (tt,tt) only if runs merged right.
    assert (got[1]["sym_left"], got[1]["sym_right"]) == ("tt", "tt")
    assert got[1]["pair_count"] == 10
    # Round 2: (l,o) = 8 beats (o,w) = 8 on the pair-asc tiebreak.
    assert (got[2]["sym_left"], got[2]["sym_right"]) == ("l", "o")
    assert got[2]["pair_count"] == 8


def test_bpe_learn_quote_and_odd_run_symbols(spark):
    """Symbols are data-derived: quotes must be escaped when spliced
    into the flag expression, and an ODD-length equal-symbol run must
    merge floor(n/2) times ('ttt' -> [tt, t])."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import bpe_learn

    words = spark.createDataFrame(
        [("t't't", 5), ("ttt", 4)], "w string, cnt long"
    )
    rows = bpe_learn(words, rounds=2).collect()
    got = {r["rnd"]: r for r in rows}
    # Round 0 pairs: (t,') = 10, (',t) = 10, (t,t) = 8 -> tiebreak asc
    # picks "' t" (quote sorts below 't').
    assert (got[0]["sym_left"], got[0]["sym_right"]) == ("'", "t")
    assert got[0]["pair_count"] == 10
    # After merging: t't't -> [t, 't, 't]; ttt -> unchanged.
    # Round 1 pairs: (t,'t) = 5, ('t,'t) = 5, (t,t) = 8 -> (t,t) wins;
    # 'ttt' merges once (greedy leftmost, odd run).
    assert (got[1]["sym_left"], got[1]["sym_right"]) == ("t", "t")
    assert got[1]["pair_count"] == 8


def test_bpe_segment_final_token_counts(spark):
    """bpe_segment (D56's vocab half) returns each word's token count
    under the learned merges: after (t,t) then (tt,tt) then (l,o),
    'tttt' is one token, 'low' is two, 'lower' is four."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import bpe_segment

    words = spark.createDataFrame(
        [("tttt", 10), ("low", 6), ("lower", 2)], "w string, cnt long"
    )
    got = {r["w"]: r["n_tokens"] for r in bpe_segment(words, rounds=3).collect()}
    # merges learned: (t,t)->tt, (tt,tt)->tttt, (l,o)->lo
    assert got == {"tttt": 1, "low": 2, "lower": 4}


def test_vocabulary_two_phase_equals_global(spark):
    """The two-phase range-partitioned dense rank (scale path) and the
    global-window rank (small-corpus fast path) are the SAME function —
    identical (term, total_count, doc_freq, term_rank) on any input."""
    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import vocabulary
    from prefect_flow_arc_kg_postgres_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fast = {tuple(r) for r in vocabulary(docs, 2, two_phase=False).collect()}
    twop = {tuple(r) for r in vocabulary(docs, 2, two_phase=True).collect()}
    assert fast == twop and fast


def test_html_extract_roundtrip_and_boilerplate(spark):
    """html_extract recovers the body text exactly (tags stripped,
    entities decoded, whitespace collapsed), drops chrome BLOCKS
    (script/style/nav/header/footer/aside) wholesale, lifts the title,
    and counts anchors — hand-built payloads, not the synthesized
    corpus, so each rule is attributable."""
    from pyspark.sql import Row

    from prefect_flow_arc_kg_postgres_etl_spark.operators.text import html_extract

    rows = [
        Row(
            doc_id=1,
            html=(
                "<html><head><title>T one</title>"
                "<style>p { color: red; }</style></head>"
                "<body><nav>a | b</nav><p>Hello   <b>bold</b> world</p>"
                '<a href="x">l1</a> <a href="y">l2</a>'
                "<script>if (a &lt; b) {}</script>"
                "<footer>foot</footer></body></html>"
            ),
        ),
        Row(
            doc_id=2,
            html="<p>Tom &amp; Jerry &lt;3 &quot;cheese&quot;&#39;s&nbsp;box</p>",
        ),
        Row(doc_id=3, html="no tags at all"),
        Row(doc_id=4, html="<aside>chrome</aside><p></p>"),
    ]
    out = {r.doc_id: r for r in html_extract(spark.createDataFrame(rows)).collect()}
    assert out[1].title == "T one"
    assert out[1].n_links == 2
    assert out[1].body_text == "Hello bold world l1 l2"
    assert out[2].body_text == 'Tom & Jerry <3 "cheese"\'s box'
    assert out[2].title == "" and out[2].n_links == 0
    assert out[3].body_text == "no tags at all"
    assert out[4].body_text == ""
