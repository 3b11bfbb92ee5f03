"""Text analysis: language-ID, quality scoring, token counting, fingerprinting.

All pure column expressions (regex + array ops inside whole-stage codegen);
nothing here drops to Python, so these run at scan speed over 100 TB.
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


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_ratio(text: Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens_col(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_length(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space characters per character."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")
    return F.length(stripped).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0, 1]:

    rewards mid-length documents, low punctuation density, and a natural
    stopword rate — the usual cheap pre-filters before expensive pipeline
    stages.
    """
    n = whitespace_token_count(text).cast("double")
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_term = F.least(
        stopword_ratio(text, LANG_PROFILES["en"]) * 5, F.lit(1.0)
    )
    return (length_term + punct_term + stop_term) / 3


def language_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit ratio, the langid signal."""
    return [
        (lang, stopword_ratio(text, words)) for lang, words in LANG_PROFILES.items()
    ]


def predict_language(text: Column, default: str = "und") -> Column:
    """Argmax language by stopword ratio; deterministic tie-break on the
    language code; ``und`` when no profile scores above zero."""
    scores = language_scores(text)
    best = F.greatest(*[s for _, s in scores])
    pick = F.lit(None).cast("string")
    for lang, score in sorted(scores, key=lambda kv: kv[0], reverse=True):
        pick = F.when(score == best, F.lit(lang)).otherwise(pick)
    return F.when(best > 0, pick).otherwise(F.lit(default))


def token_hashes(text: Column) -> Column:
    """Array of 16-bit portable token hashes for a text column."""
    return F.transform(tokens_col(text), token_hash16)


def kgram_hashes(hashes: Column, k: int = 3, mod: int = 1000003) -> Column:
    """Polynomial rolling hash of each k-gram over a *materialized* token-hash
    array column (document fingerprinting's kgram stage).

    PERF CONTRACT: pass a bound column (``withColumn("hs", token_hashes(...))``
    first), never the raw ``token_hashes(text)`` expression — a lambda that
    references an unbound array expression re-evaluates it per element, which
    turns an O(n) stage into O(n²) hashing.  (Measured: 500 docs went from
    894 s to sub-second after materialization.)
    """
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
    fingerprint set.  Same perf contract as :func:`kgram_hashes`: ``kh`` must
    be a materialized column."""
    n = F.size(kh)
    mins = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.array_min(F.slice(kh, (i + 1).cast("int"), window)),
        ),
    ).otherwise(kh)
    return F.array_distinct(mins)
