"""Training-data curation: text cleanup and token-budget document packing.

Both are pure column/window expressions — no Python in the row loop, no
UDFs — so they codegen and scale like any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def clean_text(text: Column, lowercase: bool = False) -> Column:
    """Deterministic text cleanup: strip control characters, collapse runs
    of whitespace to single spaces, trim.

    The standard pre-dedup normalization pass — near-dup rates collapse when
    formatting noise (CRLF, tabs, NBSP, zero-width chars) is removed before
    shingling.  Unicode NFC normalization is deliberately NOT attempted:
    Spark has no built-in for it, and a per-row Python UDF would put the
    interpreter in the hottest loop of a 100 TB pass; run upstream tooling
    for NFC if the corpus needs it.
    """
    out = F.regexp_replace(
        text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b\\ufeff]", ""
    )
    out = F.trim(F.regexp_replace(out, "\\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def type_token_ratio(toks: Column) -> Column:
    """Distinct tokens / tokens (1.0 for empty docs) — boilerplate and
    template spam score low.  ``toks`` must be a materialized column."""
    n = F.size(toks)
    return F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    ).otherwise(F.lit(1.0))


def bigram_col(toks: Column) -> Column:
    """Word bigrams ("a b") of a MATERIALIZED token array, via the
    (element, index) two-parameter transform lambda: output i pairs
    toks[i+1] (1-based element_at) with toks[i+2]."""
    n = F.size(toks)
    return F.transform(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
    )


def top_bigram_fraction(bigrams: Column) -> Column:
    """Gopher-style repetition signal: occurrences of the most frequent
    bigram / total bigrams — detects looping generation and repeated
    headers.  O(distinct × n) per row (bounded by document length, not
    corpus size).  ``bigrams`` MUST be a materialized column — the nested
    lambdas reference it per element, and an unbound expression would
    re-evaluate the whole upstream each time (datapipe/text.py perf
    contract)."""
    nb = F.size(bigrams)
    top = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda b: F.size(F.filter(bigrams, lambda x: x == b)),
        )
    )
    return F.when(nb > 0, top.cast("double") / nb.cast("double")).otherwise(
        F.lit(0.0)
    )


PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # order matters: emails before bare domains, long digit runs after
    # structured formats so a phone number is not half-eaten by the
    # digit-run rule.
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Training-data PII scrub: emails, IPv4 addresses, phone-shaped digit
    runs → typed placeholders.  A chain of ``regexp_replace`` — pure
    codegen'd projection, no UDF, safe to run over 100 TB as part of any
    scan.  The pattern list is deliberately conservative (high precision):
    corpus-specific recall tuning belongs in config, not code.
    """
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    strata_col: str | None = None,
    budget: int = 256,
) -> DataFrame:
    """Assign each document to a fixed-token-budget pack (pretraining batch
    packing): documents are concatenated in ``id_col`` order and chunked
    every ``budget`` tokens; a document belongs to the pack where it STARTS
    (block-packing semantics — a long document may straddle a boundary, which
    is exactly what concat-then-chunk training does).

    pack_id = floor(exclusive-prefix-sum(tokens) / budget), computed with
    one running-sum window.  ``strata_col`` bounds the window: packing runs
    independently per stratum (language, source shard), so the sort is
    per-stratum, not a global single-partition sort — at 100 TB ALWAYS pass
    a stratum whose per-key volume fits a task (shard id, date bucket);
    ``None`` is for small corpora only.
    """
    parts = [F.col(strata_col)] if strata_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(prefix / F.lit(budget)).cast("bigint")
    )


def split_assignment(
    key: Column,
    fractions: dict[str, float],
    salt: str = "split",
) -> Column:
    """Deterministic train/val/test assignment from a stable key.

    ``md5(salt || key)`` → a uniform 16-bit integer → cumulative-fraction
    buckets, so the split is (a) reproducible across runs, engines and
    cluster sizes, (b) a pure projection — no shuffle, no sampling state,
    (c) stable under corpus growth: a document's split NEVER changes when
    other documents are added or removed, which is what keeps eval sets
    uncontaminated across corpus versions (re-sampling fractions per
    release would leak train docs into val).  The salt namespaces
    independent splits of the same corpus.

    Portable construction (hex-digit arithmetic, no engine-specific hash)
    so the DuckDB oracle reproduces the assignment bit-for-bit.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    alphabet = "0123456789abcdef"
    h = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    bucket = F.lit(0)
    for pos in range(4):
        digit = F.instr(F.lit(alphabet), F.substring(h, pos + 1, 1)) - 1
        bucket = bucket * 16 + digit
    out = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = bucket < F.lit(int(acc * 65536))
        out = F.when(cond, F.lit(name)) if out is None else out.when(
            cond, F.lit(name)
        )
    last = items[-1][0]
    return F.lit(last) if out is None else out.otherwise(F.lit(last))


def shuffle_order(key: Column, seed: str = "0") -> Column:
    """Deterministic global shuffle ORDER for training examples:
    ``md5(seed || key)``.  ``ORDER BY`` this column (or range-partition +
    local sort on it at scale) yields a reproducible pseudo-random
    permutation — same seed, same order, on any engine, with no
    coordinator-side RNG.  Changing the seed re-shuffles; appending
    documents interleaves them without disturbing relative order of the
    rest (each key's sort position is independent of corpus membership) —
    the property epoch-wise data loaders need for stable resume points.
    """
    return F.md5(F.concat(F.lit(seed + ":"), key.cast("string")))
