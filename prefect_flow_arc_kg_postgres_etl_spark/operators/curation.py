"""Corpus curation operators a large-scale training-data pipeline needs
beyond dedup: benchmark decontamination, deterministic stratified
sampling, and token-budget sequence packing.

These compose with the dedup/quality operators (operators/dedup.py,
operators/text.py) into the full curation flow; each is expressed in
built-in DataFrame ops with the shuffle shape a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prefect_flow_arc_kg_postgres_etl_spark.operators.dedup import doc_ngrams


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training documents that share ANY word ``n``-gram with a
    benchmark/eval document — the standard n-gram decontamination pass
    run before LLM training (the eval set must not leak into the
    training corpus).

    Shape at 100 TB: the benchmark side is tiny (eval sets are
    thousands of docs, the corpus is billions), so its distinct gram
    set broadcasts; the train side streams scan-side grams through a
    broadcast LEFT SEMI probe to find contaminated ids (one small
    distinct), and survivors come off a broadcast anti join — the
    train corpus is never shuffled. Gram identity is the same hashed
    8-byte slice as the dedup family (doc_ngrams), so the probe carries
    longs, not strings.

    Returns the surviving train rows unchanged.
    """
    train_grams = doc_ngrams(train, id_col, text_col, n)
    bench_grams = doc_ngrams(benchmark, id_col, text_col, n).select("gram").distinct()
    contaminated = (
        train_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("id")
        .distinct()
    )
    return train.join(
        F.broadcast(contaminated),
        train[id_col] == contaminated["id"],
        "left_anti",
    )


# Multiplier/increment from the classic Lehmer/glibc LCG family: pure
# integer arithmetic both Spark and any SQL oracle compute identically
# (inputs stay far below 2^63 — no overflow divergence), unlike
# engine-specific hash builtins (xxhash64 exists only on the Spark side).
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the LCG hash
    of its id falls under the stratum's fraction. Unlike
    ``DataFrame.sampleBy`` (seeded RNG over partition order) the kept
    set is a pure function of (id, stratum fraction) — stable across
    runs, partitionings and engines, which is what makes a training-mix
    spec reproducible. Scan-side filter: no shuffle, no sort.

    ``fractions`` maps stratum value -> keep fraction in [0, 1];
    unlisted strata are dropped.
    """
    # Pre-mod the id so (id % M) * A + C stays < 2^62 for ANY bigint id —
    # no overflow, so Spark longs and a SQL oracle's wider ints agree.
    bucket = ((F.col(id_col) % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M
    keep = F.lit(False)
    for value, frac in sorted(fractions.items()):
        keep = keep | (
            (F.col(strata_col) == value) & (bucket < int(frac * _LCG_M))
        )
    return df.filter(keep)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "est_tokens",
    part_col: str | None = None,
) -> DataFrame:
    """Assign documents to token-budget packs (sequence packing for
    training batches) by contiguous token offset: lay documents out in
    deterministic id order, concatenate their token counts into one
    stream, and give each document the pack whose budget-width window
    its START offset falls in — ``pack = floor(prefix_sum / budget)``.

    This is the pad-free contiguous packing used for pretraining
    shards, minus document splitting: a document straddling a boundary
    stays whole in the pack where it starts, so a pack overflows by at
    most one document (strict capacity packing is inherently
    sequential; offset binning is the closed form a single window pass
    — and a SQL oracle — can express exactly).

    A global ordering would serialize at 100 TB, so ``part_col`` (a
    date / shard key) scopes the ordering and packs build independently
    per shard — which is how training shards are laid out anyway. One
    shuffle (the window partition).

    Output: (id, tokens, pack_id[, part]); pack ids are dense within a
    scope."""
    part_keys = [part_col] if part_col else []
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    out = [
        F.col(id_col),
        F.col(tokens_col).alias("tokens"),
        F.floor(prefix / F.lit(budget_tokens)).cast("bigint").alias("pack_id"),
    ]
    if part_col:
        out.append(F.col(part_col))
    return docs.select(*out)


def sample_to_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample a multi-source corpus to a TARGET MIXTURE: given
    relative weights per source, keep the largest subset whose source
    proportions match the weights. The binding source (smallest
    count/weight ratio) is kept whole; every other source keeps
    ``T * w_s / count_s`` of its rows, ``T = min_s(count_s / w_s)``.

    Everything stays in-plan: per-source counts are one tiny aggregate,
    the global T is a 1-row aggregate over THAT (never over the corpus),
    and both broadcast back into a scan-side filter — the corpus itself
    is never shuffled or collected. Membership uses the same
    engine-independent LCG as sample_stratified, with per-source
    thresholds computed as floor(frac * 2^31) in DOUBLE — identical
    IEEE operation order on both engines, so the kept set is exactly
    reproducible in the SQL oracle.

    Unlisted strata are dropped. Returns surviving rows unchanged."""
    w_expr = F.lit(None).cast("double")
    for value, wt in sorted(weights.items()):
        w_expr = F.when(F.col(strata_col) == value, F.lit(float(wt))).otherwise(
            w_expr
        )
    weighted = df.withColumn("_w", w_expr).filter(F.col("_w").isNotNull())
    counts = weighted.groupBy(strata_col, "_w").agg(F.count("*").alias("_n"))
    t_row = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    thresh = counts.join(F.broadcast(t_row)).select(
        F.col(strata_col).alias("_s"),
        F.floor(
            (F.col("_t") * F.col("_w") / F.col("_n")) * F.lit(float(_LCG_M))
        )
        .cast("bigint")
        .alias("_cut"),
    )
    bucket = ((F.col(id_col) % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M
    return (
        weighted.join(
            F.broadcast(thresh), weighted[strata_col] == F.col("_s"), "inner"
        )
        .filter(bucket < F.col("_cut"))
        .drop("_w", "_s", "_cut")
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard layout: every row gets a shard
    (LCG hash of the id modulo ``n_shards`` — decorrelated from any
    id-range skew, reproducible in any engine) and a dense position
    within its shard (row_number ordered by (hash, id) — a stable
    pseudo-random within-shard order, which is what a training loader
    wants instead of source order).

    One shuffle: the per-shard window partition. No global sort — the
    order is defined within each shard only, so shards build
    independently. Parallelism equals ``n_shards``: size shards like
    training shards are sized anyway (corpus_bytes / ~1 GB), which
    puts shard count in the thousands at 100 TB — at or above cluster
    task width, with each per-shard row_number a bounded local sort.
    Returns (id, shard, pos)."""
    bucket = ((F.col(id_col) % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M
    w = Window.partitionBy("shard").orderBy("bucket", id_col)
    return (
        df.select(F.col(id_col), bucket.alias("bucket"))
        .withColumn("shard", (F.col("bucket") % n_shards).cast("bigint"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    words: int = 1 << 14,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``decontaminate`` for the LARGE-eval-set regime: when the
    benchmark gram set is too big to broadcast (decontaminating against
    a whole held-out corpus slice, not a 5k-question eval), the exact
    pass would shuffle every train gram into a join. This variant
    pre-filters with a SPLIT-BLOCK BLOOM FILTER — the same structure
    parquet uses for row-group filtering — built and probed entirely in
    DataFrame ops:

    - build: each bench gram hashes to one of ``words`` 64-bit words
      and sets ``k`` bits in it (bit indexes are disjoint 6-bit slices
      of a second hash — no multiply, no overflow, ANSI-safe);
      ``groupBy(word).agg(bit_or(mask))`` materializes the filter as
      <= ``words`` rows (a 16k-word filter is 128 KiB — broadcastable
      at ANY eval-set size, unlike the gram set itself).
    - probe: train grams compute the same (word, mask) scan-side, join
      the broadcast filter, and survive only if all k bits are set.
      Absent word = definitely-clean gram (the inner join drops it).
    - verify: only might-contain grams (a vanishing fraction: fp rate
      ~(1-e^{-k x grams/64words})^k) reach the exact gram join, which
      now SHUFFLES both (small) sides instead of broadcasting the
      bench grams.

    No false negatives (a shared gram always hits its own bits), and
    the exact verify removes false positives — so the survivors equal
    ``decontaminate``'s exactly; that equality is the oracle contract.
    The survivor anti join carries no broadcast hint (the contaminated
    set scales with the contaminated fraction — AQE broadcasts it
    while small and falls back to a shuffle when it is not); the train
    corpus stays unshuffled in the common small-contamination case."""
    bench_grams = (
        doc_ngrams(benchmark, id_col, text_col, n).select("gram").distinct()
    )

    def word_and_mask(df: DataFrame) -> DataFrame:
        # SQL-expr form: the DataFrame-API shiftleft only takes a
        # literal shift amount, while the SQL function accepts a column.
        bits = " | ".join(
            f"shiftleft(1L, cast((shiftrightunsigned(xxhash64(gram, 2),"
            f" {6 * j}) & 63) AS INT))"
            for j in range(k)
        )
        return df.withColumn(
            "word", F.expr(f"pmod(xxhash64(gram, 1), {words}L)")
        ).withColumn("mask", F.expr(bits))

    bloom = (
        word_and_mask(bench_grams)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    might = (
        word_and_mask(doc_ngrams(train, id_col, text_col, n))
        .join(F.broadcast(bloom), "word")
        .filter(
            F.col("mask").bitwiseAND(F.col("bits")) == F.col("mask")
        )
        .select("id", "gram")
    )
    contaminated = (
        might.join(bench_grams, "gram", "left_semi").select("id").distinct()
    )
    # No broadcast hint on the survivor anti join: the contaminated-id
    # set scales with the contaminated FRACTION, not with the fixed
    # filter — in this operator's large-eval regime it can be huge, and
    # a forced broadcast would contradict the whole design (AQE still
    # broadcasts it while it is actually small).
    return train.join(
        contaminated,
        train[id_col] == contaminated["id"],
        "left_anti",
    )
