"""Text column expressions for the training-data pipeline operators.

All pure JVM-side (``pyspark.sql.functions`` only — regex, array
lambdas, hashes): these run inside whole-stage codegen on the scan, the
only design that survives a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic English stopword list used by quality scoring
# and the language-ID heuristic.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def words(col: Column) -> Column:
    """Whitespace tokenization; empty/whitespace-only text -> [].

    Split then drop empty tokens: ``trim`` strips only spaces (not tabs/
    newlines), so trim-then-split leaves phantom '' tokens on dirty
    whitespace — found by the hypothesis property tests."""
    return F.array_remove(F.split(col, r"\s+"), "")


def token_count(col: Column) -> Column:
    return F.size(words(col)).cast("bigint")


def ngrams_from_tokens(w: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) from an ALREADY-MATERIALIZED token
    array column; fewer than n tokens -> [].

    ``w`` must be a plain attribute reference (select the tokenization
    into its own projection first): inlining the ``split`` expression
    here makes Catalyst re-evaluate it per gram element — quadratic in
    document length.

    Guarded: sequence(1, k) counts DOWN in Spark when k < 1, so gate on
    size before generating indices.
    """
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.when(F.size(w) >= n, gram).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-grams straight from a text column. Convenience form for
    short texts/tests; hot paths should materialize tokens and use
    ngrams_from_tokens (see its docstring)."""
    return ngrams_from_tokens(words(F.lower(col)), n)


def stopword_hits(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    arr = F.array(*[F.lit(s) for s in sw])
    return F.size(F.filter(words(F.lower(col)), lambda x: F.array_contains(arr, x))).cast(
        "bigint"
    )


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup / provenance key."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))
