"""Text-analysis operators: language ID, quality scoring, token
counting, fingerprinting — per-document feature extraction for corpus
curation, all scan-side JVM expressions (no UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    punct_count,
    stopword_hits,
    token_count,
    words,
)

# Marker-word lists per language for the n-gram/stopword language-ID
# heuristic. Deterministic and engine-portable; on a real multilingual
# corpus these are the top character n-grams per language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "les", "et", "des"],
}


def language_expr(text_col):
    """The language-ID decision as a single Column expression —
    composable onto any scan (curation_flow fuses it with the quality
    and token expressions in ONE pass over the corpus; the operator
    below wraps it for the standalone feature frame)."""
    detected, _hits = _language_exprs(text_col)
    return detected


def _language_exprs(text_col):
    w = words(F.lower(F.col(text_col)))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(w, lambda x: F.array_contains(arr, x)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # max of (hits, lang) — hits first, then REVERSED lang would win ties;
    # build (hits, negated-rank) instead: alphabetical tie-break needs the
    # smallest lang among max hits, so compare on (hits, lang) with
    # array_max over structs ordering lexicographically. Negate via
    # sort: pick max hits, then min lang among those.
    all_scores = F.array(*scores)
    max_hits = F.array_max(F.transform(all_scores, lambda s: s.getField("hits")))
    best = F.array_min(
        F.transform(
            F.filter(all_scores, lambda s: s.getField("hits") == max_hits),
            lambda s: s.getField("lang"),
        )
    )
    detected = F.when(max_hits > 0, best).otherwise(F.lit("und"))
    return detected, max_hits


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, pick
    the best scorer (ties broken alphabetically); no hits -> 'und'."""
    detected, max_hits = _language_exprs(text_col)
    return docs.select(
        F.col(id_col), detected.alias("detected_lang"), max_hits.cast("bigint").alias("marker_hits")
    )


def quality_expr(text_col):
    """The composite quality score as one Column expression (see
    language_expr for why these exist separately from the operators)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    n_words = token_count(t)
    n_stop = stopword_hits(t)
    n_punct = punct_count(t)
    chars_in_words = F.length(F.regexp_replace(t, r"\s+", "")).cast("bigint")
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    mean_wlen = F.when(n_words > 0, chars_in_words.cast("double") / n_words).otherwise(0.0)
    len_ok = ((n_chars >= 100) & (n_chars <= 20000)).cast("double")
    wlen_ok = ((mean_wlen >= 2.0) & (mean_wlen <= 12.0)).cast("double")
    punct_ok = (punct_ratio <= 0.2).cast("double")
    score = F.round((len_ok + wlen_ok + punct_ok) / 3.0, 6)
    return score, stop_ratio, punct_ratio, mean_wlen, n_chars, n_words


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1]:
    length band, punctuation ratio, stopword ratio, mean word length —
    the standard cheap quality gates for corpus filtering."""
    score, stop_ratio, punct_ratio, mean_wlen, n_chars, n_words = quality_expr(
        text_col
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        score.alias("quality"),
    )


def bpe_estimate_expr(text_col):
    """BPE-ish subword estimate as one Column expression."""
    w = words(F.col(text_col))
    return F.aggregate(
        F.transform(w, lambda x: F.ceil(F.length(x) / 4.0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (word-length based: ceil(len/4) per word, the common chars/4 rule
    computed exactly per word)."""
    t = F.col(text_col)
    subwords = bpe_estimate_expr(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("ws_tokens"),
        subwords.alias("est_bpe_tokens"),
    )


def fingerprint_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def tf_idf_top_terms(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the standard
    corpus-statistics pass of a training-data pipeline (keyword
    extraction / topic fingerprinting).

    Shuffle shape at 100 TB: one groupBy on (doc, term) with map-side
    combine (the term explosion never shuffles raw tokens), a by-term
    aggregate whose output is |vocabulary| rows (AQE broadcasts it back
    when small), the corpus size as a one-row broadcast cross join, and
    one window on doc_id for the top-k. Heavy-hitter terms can't skew
    the by-term join: the tf side carries one row per (doc, term), and
    document frequency is pre-aggregated before joining.

    Ranking uses the ROUNDED score (6 dp) with the term as tiebreak so
    the selected set is reproducible across engines — raw double
    ordering would make the top-k depend on last-ulp differences in
    ln() between runtimes. Returns (doc_id, term, tf, tfidf)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


__all__ = [
    "LANG_MARKERS",
    "STOPWORDS",
    "language_id",
    "language_expr",
    "quality_score",
    "quality_expr",
    "bpe_estimate_expr",
    "token_stats",
    "fingerprint_docs",
    "tf_idf_top_terms",
    "vocabulary",
    "bigram_lm",
]


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing for training corpora: replace email addresses and
    phone numbers with typed placeholder tokens, reporting per-document
    match counts. Everything is scan-side regexp expressions (zero
    shuffle, one corpus pass at any scale); the pattern set is the
    extension point — each new PII class is one more (count, replace)
    expression pair fused into the same projection.

    Returns (id, n_emails, n_phones, redacted_len, redacted_fpr) —
    the fingerprint proves the replacement text itself, not just the
    counts, and keeps the output narrow (no second copy of the corpus
    in the result)."""
    c = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
        F.length(red).alias("redacted_len"),
        F.md5(red.cast("binary")).alias("redacted_fpr"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition features — the boilerplate/spam signal
    quality filters threshold on (high duplicate-token or duplicate-
    bigram fractions mark low-entropy text). Token and bigram distinct
    ratios compute scan-side from one split (array expressions; no
    explode, no shuffle).

    Returns (id, n_tokens, n_distinct_tokens, token_rep_ratio,
    bigram_rep_ratio)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    nbd = F.size(F.array_distinct(bigrams))
    ratio = lambda tot, dis: F.when(
        tot > 0, F.round(1.0 - dis.cast("double") / tot, 6)
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        nd.cast("bigint").alias("n_distinct_tokens"),
        ratio(n, nd).alias("token_rep_ratio"),
        ratio(nb, nbd).alias("bigram_rep_ratio"),
    )


def vocabulary(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    two_phase: bool = True,
) -> DataFrame:
    """Corpus vocabulary with dense id assignment: one row per distinct
    term with its total occurrence count, document frequency, and rank
    (1 = most frequent; ties broken by term) — the tokenizer-training /
    vocab-building pass of an LLM data pipeline.

    Shuffle shape at 100 TB: term totals aggregate with map-side
    combine straight off the exploded scan (raw tokens never shuffle —
    partial aggs ship |local vocab| rows per task); document frequency
    reuses the (doc, term) distinct agg. Both shuffles key on the term.

    The dense rank is TWO-PHASE when ``two_phase`` (the default — a
    web-scale corpus's post-min_count vocab is 1e8-1e9 terms; a global
    row_number window moves all of it to ONE partition):
    range-partition the vocab on the rank order, row_number WITHIN
    each range partition (parallel), then add each partition's
    exclusive prefix-sum offset. The only single-partition step is the
    offset window over ONE ROW PER PARTITION — bounded by shuffle
    parallelism, not vocab size. Range partitions are contiguous in
    the sort order (and AQE only coalesces adjacent ones), so local
    rank + partition offset IS the global rank, independent of where
    sampling placed the range boundaries.

    ``two_phase=False`` is the SMALL-CORPUS fast path: one global
    row_number window, no checkpoint, no extra stages. The two-phase
    machinery costs a fixed ~0.5-1 s (range exchange + checkpoint
    materialization + offset stage) that dominates when the vocab fits
    one partition anyway — r7's bench regression on exactly this
    operator. Callers with size information (the plans layer reads the
    input's file bytes) pick the path; the default stays scale-safe.

    Returns (term, total_count, doc_freq, term_rank)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    per_doc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    vocab = per_doc.groupBy("term").agg(
        F.sum("tf").alias("total_count"), F.count("*").alias("doc_freq")
    )
    kept = vocab.filter(F.col("total_count") >= min_count)
    if not two_phase:
        w_global = Window.orderBy(F.desc("total_count"), F.asc("term"))
        return kept.select(
            "term",
            "total_count",
            "doc_freq",
            F.row_number().over(w_global).cast("bigint").alias("term_rank"),
        )
    ranked = (
        kept.repartitionByRange(F.desc("total_count"), F.asc("term"))
        # spark_partition_id() is non-deterministic to Catalyst, so the
        # projection pins to THIS exchange's output and cannot be
        # collapsed past the window's pid re-shuffle below.
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.desc("total_count"), F.asc("term")
    )
    local = ranked.withColumn("lr", F.row_number().over(w_local)).localCheckpoint(
        eager=True
    )
    # Exclusive prefix-sum offsets, IN-PLAN (r8 — the former driver
    # collect + Python sum + createDataFrame round-trip cost three
    # driver syncs): per-partition counts, running sum over ONE ROW
    # PER PARTITION (the lone unpartitioned window — parallelism-
    # bounded, not data-bounded), broadcast back. The checkpoint pins
    # pid/lr so both consumers (this aggregation and the final join)
    # read the same materialized rows — nondeterministic partition ids
    # can never diverge between them.
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets_df = (
        local.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .select(
            "pid",
            F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        )
    )
    return (
        local.join(F.broadcast(offsets_df), "pid")
        .withColumn("term_rank", (F.col("off") + F.col("lr")).cast("bigint"))
        .select("term", "total_count", "doc_freq", "term_rank")
    )


def bigram_lm(
    docs: DataFrame,
    min_pair_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model statistics: pair counts and conditional
    probability P(w2 | w1) — the n-gram LM / collocation pass (quality
    scoring against a corpus LM, tokenizer merges, phrase mining).

    Bigrams are built SCAN-SIDE as an array zip of the token list with
    its tail (no self-join of an exploded token table — the classic
    formulation that shuffles the corpus twice and explodes on join).
    One aggregation on (w1, w2) with map-side combine; the per-w1
    totals come off a window over the AGGREGATED pair table (partitioned
    by w1 — parallel, and |pairs| << |tokens|). The conditional
    probability divides longs cast to double in one deterministic
    per-row op, rounded identically in the SQL oracle.

    Returns (w1, w2, pair_n, cond_p) for pairs seen >= min_pair_count."""
    w = words(F.lower(F.col(text_col)))
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    total_w = Window.partitionBy("w1")
    return (
        counts.withColumn("w1_total", F.sum("pair_n").over(total_w))
        .filter(F.col("pair_n") >= min_pair_count)
        .select(
            "w1",
            "w2",
            "pair_n",
            F.round(
                F.col("pair_n").cast("double") / F.col("w1_total").cast("double"), 6
            ).alias("cond_p"),
        )
    )


def _bpe_lit(s: str) -> str:
    """Escape a data-derived symbol for splicing into a Spark SQL
    string literal (symbols come from corpus text, not trusted)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _bpe_flags_expr(a: str, b: str) -> str:
    """Boolean flag per 1-based symbol position: does a merge of pair
    (a, b) START here under greedy leftmost-non-overlapping BPE?

    The sequential greedy scan is re-expressed POSITIONALLY so both
    engines evaluate the identical closed form. For a != b two match
    positions can never be adjacent (that would need b == a), so every
    match merges. For a == b, matches chain through runs of the same
    symbol and greedy-leftmost merges exactly the even offsets within
    each run: the offset is recovered as i-1-lastbreak(i), where
    lastbreak is the largest position before i holding a different
    symbol (a bounded fold over the prefix — words are short; this is
    O(len^2) per word on arrays already in memory, not a shuffle).

    Operates on a materialized ``syms`` array column — NOT a re-split
    of a string column: re-splitting inside every subexpression made
    the per-round tree ~10x bigger, and four nested rounds blew
    Catalyst analysis past any timeout."""
    qa, qb = _bpe_lit(a), _bpe_lit(b)
    same = "true" if a == b else "false"
    return f"""
    transform(sequence(1, size(syms)), i ->
      element_at(syms, i) = '{qa}'
      AND i < size(syms)
      AND element_at(syms, i + 1) = '{qb}'
      AND (NOT {same}
           OR (i - 1 - (CASE WHEN i = 1 THEN 0 ELSE
                 aggregate(sequence(1, i - 1), 0, (acc, j) ->
                   IF(element_at(syms, j) != '{qa}', j, acc))
               END)) % 2 = 0))
    """


_BPE_APPLY_EXPR = """
transform(
  filter(sequence(1, size(syms)),
         i -> NOT (i > 1 AND element_at(__bpe_flags, i - 1))),
  i -> IF(element_at(__bpe_flags, i), '{m}',
          element_at(syms, i)))
"""


def bpe_learn(words_df: DataFrame, rounds: int = 4) -> DataFrame:
    """Learn BPE merges from a (word, cnt) vocabulary — the tokenizer-
    training pass of an LLM data pipeline. Each round: count adjacent
    symbol pairs weighted by word frequency (ONE shuffle on the pair
    key — the vocabulary is orders of magnitude smaller than the
    corpus, which is the whole point of counting over the vocab), pick
    the global argmax with a deterministic tiebreak (count desc, pair
    asc — one 1-row collect per round, the same driver-coordination
    pattern as the k-means/PageRank iterations), and apply the merge
    to every word's segmentation scan-side. Returns the merge table
    (rnd, sym_left, sym_right, merged, pair_count) — K rows.

    Greedy leftmost application is positional (``_bpe_flags_expr``), so
    a SQL oracle can unroll the rounds and reproduce every merge
    decision bit-for-bit, including the equal-symbol run case ('t t'
    in 'tttt' merges twice, never overlapping).
    """
    merges, _ = _bpe_iterate(words_df, rounds)
    return words_df.sparkSession.createDataFrame(
        merges,
        "rnd int, sym_left string, sym_right string, "
        "merged string, pair_count long",
    )


def bpe_segment(words_df: DataFrame, rounds: int = 4) -> DataFrame:
    """Learn ``rounds`` BPE merges over the (w, cnt) vocabulary and
    return each word's FINAL segmentation: (w, n_tokens). The loop's
    working set already holds every vocab word's segmentation after
    the last merge, so tokenizer APPLICATION is free once training
    ends — the corpus itself is never touched here; callers broadcast
    this vocab-sized table back onto the corpus (one join), which is
    what keeps per-document token counting corpus-linear."""
    _, cur = _bpe_iterate(words_df, rounds)
    return cur.select(
        "w", F.size("syms").cast("long").alias("n_tokens")
    )


def _bpe_iterate(
    words_df: DataFrame, rounds: int
) -> tuple[list[tuple], DataFrame]:
    """Shared merge-learning loop: returns (merge rows, final working
    set (w, cnt, syms))."""
    # The vocabulary (post word-count) is orders of magnitude smaller
    # than the corpus — materialize it once, then truncate lineage per
    # round: without the checkpoint each round's seg column nests the
    # previous round's whole expression tree (~10x growth per round)
    # and every 1-row argmax collect replays all prior rounds.
    cur = words_df.select(
        F.col("w"),
        F.col("cnt"),
        F.split(
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), " "
        ).alias("syms"),
    ).localCheckpoint()
    merges: list[tuple] = []
    for rnd in range(rounds):
        syms = F.col("syms")
        pairs = cur.filter(F.size(syms) >= 2).select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.concat(
                        F.element_at(syms, i), F.lit(" "),
                        F.element_at(syms, i + 1),
                    ),
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].pair.split(" ")
        merges.append((rnd, a, b, a + b, top[0].pair_count))
        cur = (
            cur.withColumn("__bpe_flags", F.expr(_bpe_flags_expr(a, b)))
            .withColumn(
                "syms",
                F.expr(_BPE_APPLY_EXPR.format(m=_bpe_lit(a + b))),
            )
            .drop("__bpe_flags")
            .localCheckpoint()
        )
    return merges, cur


def html_extract(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """HTML -> text extraction, the first stage of every web-corpus
    pipeline (the trafilatura/jusText step, expressed as scan-side
    regex transforms — zero UDFs, zero shuffles):

      1. drop <script>/<style>/<header>/<head>/<nav>/<footer>/<aside>
         BLOCKS (boilerplate chrome and the metadata head; <header>
         strips BEFORE <head> so header blocks match their own rule —
         non-greedy spans, RE2-compatible so the
         DuckDB oracle runs the identical patterns; RE2 has no
         backreferences or \\b, deliberately avoided),
      2. lift the <title> text,
      3. count links before tags are stripped,
      4. strip remaining tags, decode the core entities
         (&amp; &lt; &gt; &quot; &#39; &nbsp;), collapse whitespace.

    Returns (doc_id, title, n_links, body_text).
    """
    h = F.col(html_col)
    no_blocks = h
    for tag in ("script", "style", "header", "head", "nav", "footer", "aside"):
        no_blocks = F.regexp_replace(
            no_blocks, f"(?s)<{tag}[^>]*>.*?</{tag}>", " "
        )
    stripped = F.regexp_replace(no_blocks, "<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last: earlier entities must not re-decode
    ):
        stripped = F.replace(stripped, F.lit(ent), F.lit(rep))
    body = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.regexp_extract(h, "<title>([^<]*)</title>", 1).alias("title"),
        F.size(F.split(h, "<a ")).cast("bigint").alias("n_anchors_plus1"),
        body.alias("body_text"),
    ).select(
        id_col,
        "title",
        (F.col("n_anchors_plus1") - 1).alias("n_links"),
        "body_text",
    )
