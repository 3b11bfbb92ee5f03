"""Text analysis: language-ID, quality scoring, token counting, fingerprinting.

All pure column expressions (regex + array ops inside whole-stage codegen);
nothing here drops to Python, so these run at scan speed over 100 TB.

PERF CONTRACT (applies to every function taking an array column): pass a
*materialized* column (``withColumn("toks", tokens_col(text))`` first), never
an unbound expression — a higher-order-function lambda re-evaluates an
unbound argument per element, turning O(n) stages into O(n²).  Measured on
this container: winnowed fingerprints over 500 docs, 894 s unbound → 5 s
materialized.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from meerkat_abacus_spark.datapipe.dedup import token_hash16, tokens_col

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "de": ("der", "die", "das", "und", "ein", "zu", "den"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}

# BPE-ish pre-tokenization: letter runs | digit runs | any other non-space.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_ratio(toks_lower: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of (lowercased, materialized) tokens that are stopwords."""
    hits = F.size(F.filter(toks_lower, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks_lower), F.lit(1)).cast(
        "double"
    )


def mean_token_length(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space characters per character."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")
    return F.length(stripped).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def quality_score(text: Column, toks_lower: Column) -> Column:
    """Composite heuristic quality score in [0, 1]:

    rewards mid-length documents, low punctuation density, and a natural
    stopword rate — the usual cheap pre-filters before expensive pipeline
    stages.
    """
    n = F.size(toks_lower).cast("double")
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_term = F.least(
        stopword_ratio(toks_lower, LANG_PROFILES["en"]) * 5, F.lit(1.0)
    )
    return (length_term + punct_term + stop_term) / 3


def language_scores(toks_lower: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit ratio, the langid signal."""
    return [
        (lang, stopword_ratio(toks_lower, words))
        for lang, words in LANG_PROFILES.items()
    ]


def predict_language(toks_lower: Column, default: str = "und") -> Column:
    """Argmax language by stopword ratio; deterministic tie-break on the
    language code; ``und`` when no profile scores above zero."""
    scores = language_scores(toks_lower)
    best = F.greatest(*[s for _, s in scores])
    pick = F.lit(None).cast("string")
    for lang, score in sorted(scores, key=lambda kv: kv[0], reverse=True):
        pick = F.when(score == best, F.lit(lang)).otherwise(pick)
    return F.when(best > 0, pick).otherwise(F.lit(default))


def token_hashes(toks: Column) -> Column:
    """Array of 16-bit portable token hashes over a materialized token array."""
    # one-parameter wrapper: token_hash16 takes (tok, slice_idx) and a
    # 2-param HOF callable would receive (element, index) from PySpark
    return F.transform(toks, lambda t: token_hash16(t))


def kgram_hashes(hashes: Column, k: int = 3, mod: int = 1000003) -> Column:
    """Polynomial rolling hash of each k-gram over a *materialized* token-hash
    array column (document fingerprinting's kgram stage)."""
    n = F.size(hashes)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: sum(
                (
                    F.element_at(hashes, (i + j + 1).cast("int"))
                    * F.lit(31 ** (k - 1 - j))
                    for j in range(k)
                ),
                start=F.lit(0),
            )
            % F.lit(mod),
        ),
    ).otherwise(F.array().cast("array<int>"))


def winnow(kh: Column, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): the min kgram-hash of every
    ``window``-sized sliding window, deduplicated — a robust document
    fingerprint set.  ``kh`` must be a materialized column."""
    n = F.size(kh)
    mins = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.array_min(F.slice(kh, (i + 1).cast("int"), window)),
        ),
    ).otherwise(kh)
    return F.array_distinct(mins)



def repeated_span_stats(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    mod: int = 1000003,
    min_docs: int = 2,
):
    """Per-document repeated-span statistics (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22): a k-token span is
    REPEATED if its rolling hash occurs in >= ``min_docs`` distinct
    documents; each document reports how much of it is made of such spans.

    Returns ``(id, n_kgrams, n_repeated, dup_frac)`` — documents shorter
    than k tokens have no spans and are absent.

    Scale shape: explode k-gram hashes (one int per token, ~doc length), one
    groupBy on the hash for distinct-doc counts (map-side partial aggs
    apply), one join back on the hash, one groupBy on the doc id — the
    information-theoretic minimum of two shuffle keys for corpus-wide span
    frequency.  No fingerprint sampling: this is the exact variant; at
    100 TB swap the exact hash count for a winnowed subset
    (:func:`winnow`) to trade recall for volume.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    parallelism = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < parallelism:
        base = base.repartition(parallelism)
    # Generate barriers pin tokens -> token hashes -> k-gram hashes to one
    # evaluation each (see datapipe/dedup.py: select staging collapses).
    base = base.select(
        "id", F.explode(F.array(tokens_col(F.col("text")))).alias("toks")
    )
    base = base.select(
        "id", F.explode(F.array(token_hashes(F.col("toks")))).alias("hs")
    )
    base = base.select(
        "id",
        F.explode(F.array(kgram_hashes(F.col("hs"), k=k, mod=mod))).alias("kh"),
    )
    spans = base.select("id", F.explode("kh").alias("h"))
    doc_counts = spans.groupBy("h").agg(
        F.count_distinct("id").alias("__ndocs")
    )
    flagged = spans.join(doc_counts, "h")
    repeated = F.sum(
        F.when(F.col("__ndocs") >= min_docs, 1).otherwise(0)
    ).alias("n_repeated")
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kgrams"),
        repeated,
    ).select(
        "id",
        "n_kgrams",
        "n_repeated",
        F.round(
            F.col("n_repeated").cast("double") / F.col("n_kgrams").cast("double"),
            4,
        ).alias("dup_frac"),
    )

__all__ = [
    "LANG_PROFILES",
    "BPE_REGEX",
    "tokens_col",
    "bpe_token_count",
    "stopword_ratio",
    "mean_token_length",
    "punct_ratio",
    "quality_score",
    "language_scores",
    "predict_language",
    "token_hashes",
    "kgram_hashes",
    "repeated_span_stats",
    "winnow",
]
