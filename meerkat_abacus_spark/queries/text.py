"""Text-analysis family: token/quality stats, language ID, fingerprinting,
cleaning, PII redaction, repetition, sampling, and sequence packing."""

from __future__ import annotations

from meerkat_abacus_spark.datapipe import text as tx
from meerkat_abacus_spark.operators import quality_control as qc
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ._shared import _register, _t
from .dedup import _TOK_HASH_SQL



# ---------------------------------------------------------------------------
# Text analysis: token counts, quality heuristics, language-ID — all pure
# column expressions (codegen'd; no Python in the row loop).
# ---------------------------------------------------------------------------

_STOP_EN = "', '".join(tx.LANG_PROFILES["en"])




@_register(
    "text_stats",
    f"""
    WITH tok AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe,
           ROUND(CAST(list_sum(list_transform(t, s -> len(s))) AS DOUBLE)
                 / greatest(len(t), 1), 4) AS mean_tok_len,
           ROUND(CAST(len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                      AS DOUBLE) / greatest(len(text), 1), 4) AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split_regex(trim(lower(text)),
                      '\\s+'), s -> s IN ('{_STOP_EN}'))) AS DOUBLE)
                 / greatest(len(t), 1), 4) AS stop_ratio
    FROM tok
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    staged = docs.withColumns(
        {
            "toks": tx.tokens_col(text),
            "toks_lower": tx.tokens_col(F.lower(text)),
        }
    )
    return staged.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        tx.bpe_token_count(text).alias("n_bpe"),
        F.round(tx.mean_token_length(F.col("toks")), 4).alias("mean_tok_len"),
        F.round(tx.punct_ratio(text), 4).alias("punct_ratio"),
        F.round(
            tx.stopword_ratio(F.col("toks_lower"), tx.LANG_PROFILES["en"]), 4
        ).alias("stop_ratio"),
    )




def _langid_case_sql() -> str:
    """CASE expression mirroring predict_language's deterministic argmax
    (ties pick the alphabetically-first language code)."""
    ratios = {
        lang: (
            "(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            f"""s -> s IN ('{"', '".join(words)}'))) AS DOUBLE) / """
            "greatest(len(string_split_regex(trim(text), '\\s+')), 1))"
        )
        for lang, words in tx.LANG_PROFILES.items()
    }
    best = "greatest(" + ", ".join(ratios.values()) + ")"
    arms = " ".join(
        f"WHEN {ratios[lang]} = __best THEN '{lang}'"
        for lang in sorted(tx.LANG_PROFILES)
    )
    return (
        f"CASE WHEN __best > 0 THEN (CASE {arms} END) ELSE 'und' END",
        best,
    )




_LANGID_CASE, _LANGID_BEST = _langid_case_sql()




@_register(
    "text_langid",
    f"""
    SELECT lang, predicted, COUNT(*) AS n FROM (
        SELECT lang, {_LANGID_CASE} AS predicted
        FROM (SELECT lang, text, {_LANGID_BEST} AS __best FROM documents)
    ) GROUP BY 1, 2
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks_lower", tx.tokens_col(F.lower(F.col("text")))
    )
    return (
        docs.select(
            "lang", tx.predict_language(F.col("toks_lower")).alias("predicted")
        )
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )




# ---------------------------------------------------------------------------
# Document fingerprinting: rolling k-gram hashes + winnowing (the classic
# near-dup fingerprint set), portable arithmetic in both engines.
# ---------------------------------------------------------------------------

_KGRAM_SQL = (
    "CASE WHEN len(hs) >= 3 THEN list_transform(range(1, len(hs) - 1), "
    "i -> (hs[i] * 961 + hs[i+1] * 31 + hs[i+2]) % 1000003) "
    "ELSE [] END"
)


_WINNOW_SQL = (
    "CASE WHEN len(kh) >= 4 THEN list_transform(range(1, len(kh) - 2), "
    "i -> list_aggregate(kh[i:i+3], 'min')) ELSE kh END"
)




@_register(
    "doc_fingerprint",
    f"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), h AS (
        SELECT doc_id, list_transform(toks, t -> {_TOK_HASH_SQL}) AS hs FROM tok
    ), kg AS (
        SELECT doc_id, {_KGRAM_SQL} AS kh FROM h
    ), win AS (
        SELECT doc_id, list_distinct({_WINNOW_SQL}) AS fp FROM kg
    )
    SELECT doc_id,
           len(fp) AS n_fp,
           CAST(list_aggregate(fp, 'min') AS BIGINT) AS min_fp,
           CAST(list_aggregate(fp, 'max') AS BIGINT) AS max_fp
    FROM win
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # Each stage materialized as a column: a lambda over an unbound array
    # expression re-evaluates it per element (O(n²) hashing — see
    # datapipe/text.py perf contract).
    staged = (
        docs.withColumn("toks", tx.tokens_col(F.col("text")))
        .withColumn("hs", tx.token_hashes(F.col("toks")))
        .withColumn("kh", tx.kgram_hashes(F.col("hs"), k=3))
        .withColumn("fp", tx.winnow(F.col("kh"), window=4))
    )
    return staged.select(
        "doc_id",
        F.size("fp").alias("n_fp"),
        F.array_min("fp").cast("long").alias("min_fp"),
        F.array_max("fp").cast("long").alias("max_fp"),
    )




# --- Composite quality score (cheap pre-filter before expensive stages) ----


@_register(
    "text_quality",
    f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), parts AS (
        SELECT doc_id,
               least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) AS length_term,
               1.0 - least(5.0 * CAST(len(regexp_replace(text,
                     '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                   / greatest(len(text), 1), 1.0) AS punct_term,
               least(5.0 * CAST(len(list_filter(toks,
                     s -> s IN ('{_STOP_EN}'))) AS DOUBLE)
                   / greatest(len(toks), 1), 1.0) AS stop_term
        FROM t
    )
    SELECT doc_id,
           ROUND((length_term + punct_term + stop_term) / 3, 4) AS quality
    FROM parts
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks_lower", tx.tokens_col(F.lower(F.col("text")))
    )
    return docs.select(
        "doc_id",
        F.round(
            tx.quality_score(F.col("text"), F.col("toks_lower")), 4
        ).alias("quality"),
    )




def _hex4_sql(key_sql: str, salt: str = "smp") -> str:
    """DuckDB mirror of the md5-hex4 16-bit bucket used by deterministic
    sampling (strpos arithmetic — portable, no engine-specific hex cast)."""
    m = f"md5('{salt}:' || {key_sql})"
    return (
        f"((strpos('0123456789abcdef', substr({m}, 1, 1)) - 1) * 4096"
        f" + (strpos('0123456789abcdef', substr({m}, 2, 1)) - 1) * 256"
        f" + (strpos('0123456789abcdef', substr({m}, 3, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({m}, 4, 1)) - 1))"
    )




# ---------------------------------------------------------------------------
# Training-data curation: per-stratum sampling (dataset mixing) and per-source
# top-k quality selection (domain-balanced filtering).
# ---------------------------------------------------------------------------


@_register(
    "stratified_sample",
    f"""
    SELECT lang,
           COUNT(*) AS n,
           MIN(doc_id) AS min_doc
    FROM documents
    WHERE {_hex4_sql('CAST(doc_id AS VARCHAR)')} <
          CASE lang WHEN 'en' THEN CAST(0.75 * 65536 AS INT)
                    WHEN 'zh' THEN CAST(0.5 * 65536 AS INT)
                    WHEN 'de' THEN CAST(0.25 * 65536 AS INT)
                    ELSE CAST(0.1 * 65536 AS INT) END
    GROUP BY 1
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-language keep fractions, md5-keyed so the sample
    is bit-reproducible in any engine and rows keep/drop consistently when
    only the weights change (operators/quality_control.py)."""
    docs = _t(spark, sf_dir, "documents")
    sampled = qc.stratified_deterministic_sample(
        docs, key_col="doc_id", strata_col="lang",
        fractions={"en": 0.75, "zh": 0.5, "de": 0.25},
        default_fraction=0.1,
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_doc")
    )




@_register(
    "quality_topk_per_source",
    f"""
    WITH t AS (
        SELECT doc_id, source, text,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), parts AS (
        SELECT doc_id, source,
               least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) AS length_term,
               1.0 - least(5.0 * CAST(len(regexp_replace(text,
                     '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                   / greatest(len(text), 1), 1.0) AS punct_term,
               least(5.0 * CAST(len(list_filter(toks,
                     s -> s IN ('{_STOP_EN}'))) AS DOUBLE)
                   / greatest(len(toks), 1), 1.0) AS stop_term
        FROM t
    ), scored AS (
        SELECT doc_id, source,
               ROUND((length_term + punct_term + stop_term) / 3, 4) AS quality
        FROM parts
    )
    SELECT doc_id, source, quality, rank FROM (
        SELECT doc_id, source, quality,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY quality DESC, doc_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balanced selection: keep the k highest-quality documents per
    source.  Ranking runs on the ROUNDED score in both engines so the
    tie-break (doc_id) is hit identically; the plan is one window over a
    (source)-partitioned shuffle with WindowGroupLimit pushing k into the
    sort — no full sort of the corpus."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks_lower", tx.tokens_col(F.lower(F.col("text")))
    )
    scored = docs.select(
        "doc_id",
        "source",
        F.round(
            tx.quality_score(F.col("text"), F.col("toks_lower")), 4
        ).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )




@_register(
    "doc_packing",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT lang, n_tokens,
               CAST(floor(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 256.0) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT lang, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget block packing (datapipe/curation.py): concat-order
    chunking into 256-token packs, windowed per language so no global
    sort exists in the plan."""
    from meerkat_abacus_spark.datapipe.curation import pack_documents

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tx.tokens_col(F.col("text"))).alias("n_tokens"),
    )
    packed = pack_documents(
        docs, id_col="doc_id", tokens_col="n_tokens",
        strata_col="lang", budget=256,
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )




@_register(
    "text_clean",
    """
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(text,
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u200b\\ufeff]',
                   '', 'g'),
               '\\s+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cleanup projection (datapipe/curation.py): control
    chars stripped, whitespace collapsed, trimmed — the canonical pre-dedup
    normalization."""
    from meerkat_abacus_spark.datapipe.curation import clean_text

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_text(F.col("text")).alias("cleaned"))




@_register(
    "text_redact_pii",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com ip 10.0.' || (doc_id % 256) || '.7 tel +1 555-010-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
               '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')) AS redacted_md5
    FROM seeded
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (datapipe/curation.py redact_pii): deterministic synthetic
    email/IP/phone are appended so every row exercises every pattern; the
    oracle applies the identical regex chain in DuckDB and compares md5 of
    the redacted text."""
    from meerkat_abacus_spark.datapipe.curation import redact_pii

    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +1 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return seeded.select(
        "doc_id", F.md5(redact_pii(F.col("t"))).alias("redacted_md5")
    )




@_register(
    "text_repetition",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), b AS (
        SELECT doc_id, toks,
               list_transform(range(1, greatest(len(toks), 1)),
                              i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
        FROM t
    )
    SELECT doc_id,
           ROUND(CASE WHEN len(toks) > 0
                      THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                      ELSE 1.0 END, 4) AS ttr,
           ROUND(CASE WHEN len(bigrams) > 0
                      THEN CAST(list_max(list_transform(list_distinct(bigrams),
                               bg -> len(list_filter(bigrams, x -> x = bg))))
                           AS DOUBLE) / len(bigrams)
                      ELSE 0.0 END, 4) AS top_bigram_frac
    FROM b
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (datapipe/curation.py):
    type-token ratio and top-bigram fraction.  toks and bigrams are
    materialized columns per the HOF perf contract."""
    from meerkat_abacus_spark.datapipe.curation import (
        bigram_col,
        top_bigram_fraction,
        type_token_ratio,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .withColumn("toks", tx.tokens_col(F.col("text")))
        .withColumn("bigrams", bigram_col(F.col("toks")))
    )
    return docs.select(
        "doc_id",
        F.round(type_token_ratio(F.col("toks")), 4).alias("ttr"),
        F.round(top_bigram_fraction(F.col("bigrams")), 4).alias(
            "top_bigram_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic dataset assembly: hash-keyed train/val/test split and
# seeded global shuffle order — the two release-reproducibility primitives
# a training-data pipeline runs after curation (datapipe/curation.py).
# ---------------------------------------------------------------------------


@_register(
    "dataset_split",
    f"""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN {_hex4_sql('CAST(doc_id AS VARCHAR)', 'split')}
                         < CAST(0.8 * 65536 AS INT) THEN 'train'
                    WHEN {_hex4_sql('CAST(doc_id AS VARCHAR)', 'split')}
                         < CAST(0.9 * 65536 AS INT) THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM assigned
    GROUP BY 1, 2
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: a pure md5-bucket
    projection (datapipe/curation.py:split_assignment), so a document's
    split never changes as the corpus grows — the property that keeps eval
    sets uncontaminated across releases.  ``id_sum`` pins the PER-DOCUMENT
    assignment into the oracle hash, not just the counts."""
    from meerkat_abacus_spark.datapipe.curation import split_assignment

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            split_assignment(
                F.col("doc_id"),
                {"train": 0.8, "val": 0.1, "test": 0.1},
            ).alias("split"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@_register(
    "corpus_shuffle",
    """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)))
                AS BIGINT) AS rank,
           doc_id
    FROM documents
    ORDER BY rank
    LIMIT 100
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle (datapipe/curation.py:
    shuffle_order): ORDER BY md5(seed||key) is a reproducible permutation
    with no coordinator RNG — at scale, range-partition on the shuffle key
    and sort within partitions for the same order without a single-node
    sort.  The head-of-permutation probe here is orderBy().limit(100) —
    TakeOrderedAndProject (per-partition top-k, driver merge of 100-row
    heaps), NOT a global-window sort — and only the 100 survivors pass
    through the rank window."""
    from meerkat_abacus_spark.datapipe.curation import shuffle_order

    docs = _t(spark, sf_dir, "documents")
    top = (
        docs.select(
            "doc_id", shuffle_order(F.col("doc_id"), seed="42").alias("__k")
        )
        .orderBy("__k")
        .limit(100)
    )
    # Constant partition key (VERDICT r9 ask #7): the frame is ≤100 rows
    # post-limit — single-partition by design — but an unpartitioned
    # window logs a "moving all data to a single partition" WARN per
    # sweep.  A bare literal gets folded out by EliminateWindowPartitions
    # (restoring the WARN), so the key is the sign bit of the
    # non-negative doc_id: constant 0 by construction, opaque to
    # constant folding, identical single-partition cost.
    w = Window.partitionBy(F.shiftright(F.col("doc_id"), 63)).orderBy("__k")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"), "doc_id"
    )


# ---------------------------------------------------------------------------
# Vocabulary build: global term + document frequencies, top-k.
# ---------------------------------------------------------------------------


@_register(
    "vocab_topk",
    r"""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM tok GROUP BY 1
    ORDER BY tf DESC, token ASC LIMIT 50
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by total term frequency, with
    document frequency — the first step of any tokenizer-training /
    data-mixing analysis pass.

    Scale shape: the explode is the only wide part and it feeds a groupBy
    whose partial (map-side) aggregate collapses each partition's token
    counts before the single shuffle on token; df rides the same shuffle
    as count(distinct doc_id).  The top-50 is orderBy+limit, which
    Catalyst plans as TakeOrderedAndProject — per-partition heaps and a
    driver-side merge of 50-row heads, never a global sort of the
    vocabulary."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# JSONL source round-trip: S-family breadth.  Training corpora ship as
# JSON-lines at least as often as parquet; prove the engine reads them with
# full fidelity (embedded newlines, quotes, unicode all survive).
# ---------------------------------------------------------------------------


@_register(
    "jsonl_source_roundtrip",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def jsonl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents table as JSON-lines, read it back with an
    explicit schema (never inference — a second full scan at 100 TB), and
    aggregate: the result must hash-equal the same aggregate over the
    original parquet, proving lossless JSONL round-trip of real text
    (newlines, quotes, unicode).

    Scale shape: the JSONL scan is splittable line-by-line, so it
    parallelizes like any text source; the explicit schema keeps it a
    single pass."""
    import os
    import tempfile

    from ._shared import _scratch_ready, _scratch_tag, build_shared_scratch

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.gettempdir() + f"/msa_jsonl_v1_{_scratch_tag(sf_dir)}"
    build_shared_scratch(
        path,
        lambda: _scratch_ready(path),
        lambda: docs.write.mode("overwrite").json(path),
    )
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Global-percentile quality gate: filter against a corpus-level statistic.
# ---------------------------------------------------------------------------


@_register(
    "quality_percentile_filter",
    f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), q AS (
        SELECT doc_id, lang,
               ROUND((least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
                + 1.0 - least(5.0 * CAST(len(regexp_replace(text,
                      '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                    / greatest(len(text), 1), 1.0)
                + least(5.0 * CAST(len(list_filter(toks,
                      s -> s IN ('{_STOP_EN}'))) AS DOUBLE)
                    / greatest(len(toks), 1), 1.0)) / 3, 4) AS quality
        FROM t
    ), thr AS (
        SELECT ROUND(quantile_cont(quality, 0.25), 4) AS p25 FROM q
    )
    SELECT lang,
           CAST(SUM(CASE WHEN quality >= p25 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           COUNT(*) AS n_total,
           p25 AS threshold
    FROM q, thr
    GROUP BY lang, p25
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gate: keep documents at or above the 25th
    percentile of the composite quality score — thresholds in real
    curation are set against the corpus distribution, not hardcoded.

    Scale shape: the percentile is ONE global aggregate (Spark's exact
    interpolated ``percentile``, partial-aggregated t-digest-free since
    the value set per partition is bounded by rounding at 4dp), then a
    literal-sized scalar broadcast-joined onto the scan — the fact table
    is read once and never shuffled.  Both engines rank on the ROUNDED
    score so the >= boundary cannot flip on last-ulp noise."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks_lower", tx.tokens_col(F.lower(F.col("text")))
    )
    q = docs.select(
        "doc_id",
        "lang",
        F.round(
            tx.quality_score(F.col("text"), F.col("toks_lower")), 4
        ).alias("quality"),
    )
    thr = q.agg(
        F.round(F.expr("percentile(quality, 0.25)"), 4).alias("threshold")
    )
    return (
        q.crossJoin(F.broadcast(thr))
        .groupBy("lang", "threshold")
        .agg(
            F.sum(
                F.when(F.col("quality") >= F.col("threshold"), 1).otherwise(0)
            ).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select("lang", "n_kept", "n_total", "threshold")
    )


# ---------------------------------------------------------------------------
# TF-IDF: per-source top terms ranked against global document frequency.
# ---------------------------------------------------------------------------


@_register(
    "tfidf_top_terms",
    r"""
    WITH tok AS (
        SELECT doc_id, source,
               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    ),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    dfreq AS (
        SELECT token, COUNT(DISTINCT doc_id) AS dfq FROM tok GROUP BY 1
    ),
    tf AS (
        SELECT source, token, COUNT(*) AS tfq FROM tok GROUP BY 1, 2
    ),
    scored AS (
        SELECT source, token, tfq,
               ROUND(tfq * ROUND(ln(CAST(n AS DOUBLE) / dfq), 6), 4) AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN nn
    )
    SELECT source, token, tfidf, rank FROM (
        SELECT source, token, tfidf,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY tfidf DESC, token ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per source: the characteristic-vocabulary probe
    behind corpus mixing decisions (which sources contribute what).

    Scale shape: one explode feeds BOTH aggregates (term frequency per
    source, document frequency global); the tf←df join runs on token —
    the same key both aggregates already shuffled on, so it co-partitions,
    and it is deliberately NOT broadcast-hinted (a 100 TB corpus has a
    vocabulary far past broadcast size; AQE upgrades it only when the
    measured df side is small).  Ranking is a per-source window over the
    aggregated (source × token) frame, not the token stream.  The idf is
    rounded to 6dp BEFORE the multiply so the cross-engine ranking cannot
    flip on last-ulp ln() noise (libm vs JVM)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    n_docs = docs.count()
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("dfq")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tfq"))
    scored = tf.join(dfreq, "token").select(
        "source",
        "token",
        F.round(
            F.col("tfq")
            * F.round(F.log(F.lit(float(n_docs)) / F.col("dfq")), 6),
            4,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "token", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# Inverted index build: token → posting list, content-addressed.
# ---------------------------------------------------------------------------


@_register(
    "inverted_index",
    r"""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    ),
    postings AS (
        SELECT token,
               COUNT(*) AS df,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
                   AS posting_hash
        FROM tok GROUP BY 1
    )
    SELECT token, df, first_doc, last_doc, posting_hash
    FROM postings WHERE df >= 100
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction for an inverted text index: per token the
    sorted document list (content-addressed via md5 so the oracle checks
    every element and its order, not just the count) for tokens appearing
    in >= 100 docs.

    Scale shape: explode → per-doc distinct (array_distinct BEFORE the
    explode, map-side) → one groupBy on token building the sorted posting
    via sort_array(collect_list).  Posting lists are the classic skew
    hazard — stopword tokens collect millions of ids — so a production
    variant shards hot tokens by (token, doc_id div B); here df is
    bounded by the corpus and the hash keeps the oracle exact."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            )
        ).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.sort_array(F.collect_list(F.col("doc_id"))), ","
                )
            ).alias("posting_hash"),
        )
        .filter(F.col("df") >= 100)
    )


# ---------------------------------------------------------------------------
# Grouped exact quantiles: the per-source quality distribution.
# ---------------------------------------------------------------------------


@_register(
    "quality_quantiles_by_source",
    f"""
    WITH t AS (
        SELECT doc_id, source, text,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), q AS (
        SELECT source,
               ROUND((least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
                + 1.0 - least(5.0 * CAST(len(regexp_replace(text,
                      '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                    / greatest(len(text), 1), 1.0)
                + least(5.0 * CAST(len(list_filter(toks,
                      s -> s IN ('{_STOP_EN}'))) AS DOUBLE)
                    / greatest(len(toks), 1), 1.0)) / 3, 4) AS quality
        FROM t
    )
    SELECT source,
           COUNT(*) AS n,
           ROUND(quantile_cont(quality, 0.25), 4) AS p25,
           ROUND(quantile_cont(quality, 0.50), 4) AS p50,
           ROUND(quantile_cont(quality, 0.75), 4) AS p75
    FROM q GROUP BY 1
    """,
)
def quality_quantiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality distribution (exact interpolated quartiles) —
    the profile that decides per-source mixing weights and thresholds.

    Scale shape: quality is a pure projection; the grouped percentile is
    one shuffle on source.  Exact grouped percentiles buffer each group's
    values — right for profiling runs over |sources| groups; the
    streaming-friendly alternative (approx_percentile, t-digest,
    partial-aggregable) is tolerance-tested in
    tests/test_ops_partitioning.py since its sketch output is
    engine-specific and cannot hash-match a DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks_lower", tx.tokens_col(F.lower(F.col("text")))
    )
    q = docs.select(
        "source",
        F.round(
            tx.quality_score(F.col("text"), F.col("toks_lower")), 4
        ).alias("quality"),
    )
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(quality, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(quality, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(quality, 0.75)"), 4).alias("p75"),
    )


from ._shared import ORACLES as _ORACLES_T  # noqa: E402  (oracle reuse)


@_register("inverted_index_salted", _ORACLES_T["inverted_index"])
def inverted_index_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe posting-list build: the two-phase salted form of
    inverted_index, certified IDENTICAL output by sharing its oracle.

    Phase 1 groups by (token, doc_id % 8): a stopword token's millions of
    postings spread over 8 reducers, each emitting a sorted partial list.
    Phase 2 merges the ≤8 partials per token — flatten + one sort of the
    final list — so no single reducer ever materializes a hot token's
    postings from the raw explode.  This is the generic recipe for
    skew-prone ORDERED aggregation (collect_list/sort) where a plain
    two-phase sum (functions/skew.py) doesn't apply."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            )
        ).alias("token"),
    )
    partial = tok.groupBy(
        "token", (F.col("doc_id") % 8).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.min("doc_id").alias("pmin"),
        F.max("doc_id").alias("pmax"),
        F.sort_array(F.collect_list("doc_id")).alias("plist"),
    )
    return (
        partial.groupBy("token")
        .agg(
            F.sum("pn").alias("df"),
            F.min("pmin").alias("first_doc"),
            F.max("pmax").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.sort_array(F.flatten(F.collect_list("plist"))), ","
                )
            ).alias("posting_hash"),
        )
        .filter(F.col("df") >= 100)
    )


# ---------------------------------------------------------------------------
# Curation dead-letter: filter with an audit trail, not a silent drop.
# ---------------------------------------------------------------------------


@_register(
    "text_reject_reasons",
    f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), scored AS (
        SELECT doc_id, lang,
               len(toks) AS n_tokens,
               CAST(len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                    AS DOUBLE) / greatest(len(text), 1) AS punct
        FROM t
    ), routed AS (
        SELECT doc_id, lang,
               CASE WHEN n_tokens < 5 THEN 'too_short'
                    WHEN punct > 0.2 THEN 'too_much_punct'
                    ELSE 'clean' END AS route
        FROM scored
    )
    SELECT route, lang, COUNT(*) AS n
    FROM routed GROUP BY 1, 2
    """,
)
def text_reject_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation dead-letter routing: every dropped document carries WHY it
    was dropped (first matching rule wins), so filter-rate regressions are
    debuggable per reason × language instead of a silent shrinking count —
    the datapipe counterpart of the K4 form dead-letter sink.

    Scale shape: one projection computes all gate features, one CASE
    routes, one partial-aggregated groupBy counts — a single scan, no
    per-rule passes."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col(F.lower(F.col("text")))
    )
    scored = docs.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        tx.punct_ratio(F.col("text")).alias("punct"),
    )
    route = (
        F.when(F.col("n_tokens") < 5, "too_short")
        .when(F.col("punct") > 0.2, "too_much_punct")
        .otherwise("clean")
    )
    return scored.groupBy(route.alias("route"), F.col("lang")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Deterministic per-group subsample: fixed-n eval slices per source.
# ---------------------------------------------------------------------------


@_register(
    "sample_n_per_group",
    f"""
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5('grp:' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents
    )
    SELECT source, COUNT(*) AS n_sampled,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS sample_hash
    FROM ranked WHERE rn <= 5
    GROUP BY 1
    """,
)
def sample_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-group deterministic subsample (5 docs per source,
    ranked by a salted md5 of the id): the fixed-size eval-slice draw —
    reproducible across engines and runs, unlike rand()-based sampling.
    Content-addressed output so the oracle certifies the exact member
    set, not just counts.

    Scale shape: one window per group over (source) — and since only
    rank <= 5 survives, a production variant pre-filters with a cheap
    per-partition top-n before the shuffle; here groups are small enough
    that the plain window is the honest plan."""
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    key = F.md5(F.concat(F.lit("grp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    sampled = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
        ).alias("sample_hash"),
    )


# ---------------------------------------------------------------------------
# Corpus bigram frequencies: the n-gram table tokenizer/LM prep starts from.
# ---------------------------------------------------------------------------


@_register(
    "bigram_topk",
    """
    WITH tok AS (
        SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    bg AS (
        SELECT UNNEST(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
            AS bigram
        FROM tok
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY 1
    ORDER BY n DESC, bigram LIMIT 50
    """,
)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigrams — the adjacent-pair frequency table behind
    tokenizer training, collocation mining and boilerplate detection
    (vocab_topk's unigram sibling).

    Scale shape: bigram construction is a pure projection (transform over
    the token array, no self-join); the count is one hash-partitioned
    groupBy with map-side partial agg, and the top-k is
    TakeOrderedAndProject — per-partition heads, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = docs.select(toks.alias("toks"))
    bigrams = F.transform(
        F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, F.element_at(F.col("toks"), i + F.lit(2))
        ),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Training-mixture report: the per-(source, lang) composition table every
# data-mixing decision reads.
# ---------------------------------------------------------------------------


@_register(
    "mixture_report",
    """
    WITH per AS (
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS total_tokens
        FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_docs) AS t FROM per)
    SELECT source, lang, n_docs, total_tokens,
           ROUND(n_docs * 1.0 / (SELECT t FROM tot), 4) AS doc_share
    FROM per
    """,
)
def mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) corpus composition: document count, token
    count, and each cell's share of the corpus — the mixing table a
    pretraining pipeline rebalances against.

    Scale shape: one partial-aggregated groupBy collapses the corpus to
    |sources| x |langs| rows; the share denominator is a broadcast of ONE
    row (crossJoin of the re-aggregated total), not a single-partition
    window over the fact."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("total_tokens"),
    )
    tot = per.agg(F.sum("n_docs").alias("__t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        F.round(F.col("n_docs") / F.col("__t"), 4).alias("doc_share"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling with an INTEGER-EXACT priority key
# (advisor r6): the earlier exponential-race key rounded -ln(u)/w to 9dp
# before ranking, but rounding cannot prevent a rank flip when the true
# value lies within an ulp of a rounding boundary — a residual
# nondeterministic oracle-failure class.  The key is now pure integer
# arithmetic on the md5 value, so BOTH engines compute the identical
# BIGINT and the compare has no float in it anywhere.
# ---------------------------------------------------------------------------

# 15 hex chars = 60 bits of md5 — fits BIGINT with headroom.
_U60_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', "
    f"substr(md5(CAST(doc_id AS VARCHAR)), {p + 1}, 1)) - 1) * {16 ** (14 - p)}"
    for p in range(15)
) + ")"


@_register(
    "weighted_sample",
    f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CAST({_U60_SQL} // GREATEST(n_chars, 1) AS BIGINT) AS skey
        FROM documents
    )
    SELECT doc_id, source, n_chars, skey
    FROM keyed ORDER BY skey, doc_id LIMIT 100
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-document sample weighted by length via an integer priority
    race: each doc draws a deterministic 60-bit uniform U from
    md5(doc_id) and competes with key ``U div weight`` (weight =
    n_chars); the k smallest keys win.  Inclusion odds grow monotonically
    with weight — the integer-exact analogue of the Efraimidis-Spirakis
    exponential race (which ranks by -ln(u)/w): dividing the uniform by
    the weight rather than exponentiating keeps the key computable in
    exact BIGINT arithmetic, so the draw is bit-reproducible across
    engines, runs and corpus growth (a doc's key never changes when other
    docs arrive — same anti-contamination property as dataset_split's md5
    buckets), with no float rounding guard and no ulp-boundary flip risk.

    Scale shape: key construction is a pure projection; selection is
    TakeOrderedAndProject (per-partition top-k, no global sort); doc_id
    breaks exact ties."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    u60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("long")
    keyed = docs.select(
        "doc_id", "source", "n_chars",
        u60.alias("__u"), w.alias("__w"),
    ).select(
        "doc_id", "source", "n_chars",
        F.expr("__u div __w").alias("skey"),
    )
    return keyed.orderBy("skey", "doc_id").limit(100)


# ---------------------------------------------------------------------------
# BM25 retrieval: the inverted-index consumer.  Exactness discipline:
# the tf saturation part is ONE division of exact integers (k1=6/5 and
# b=3/4 cross-multiplied through, so tf, dl, N and total_len never touch
# a float until the final divide), the idf is rounded to 6dp straight off
# ln() (the repo's tfidf discipline), and per-term scores become BIGINT
# micro-units BEFORE the per-document sum — integer sums are
# order-independent, so multi-term accumulation cannot flip the hash.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("vector", "stream", "hash")


@_register(
    "bm25_search",
    f"""
    WITH dl AS (
        SELECT doc_id,
               len(string_split_regex(trim(lower(text)), '\\s+')) AS dl
        FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM dl),
    tok AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok
        WHERE token IN {_BM25_TERMS!r}
        GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS dfq FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc_id,
               CAST(ROUND(
                   ROUND(ln(1 + (s.n - d.dfq + 0.5) / (d.dfq + 0.5)), 6)
                   * (CAST(44 * tf.tf * s.total AS DOUBLE)
                      / CAST(20 * tf.tf * s.total + 6 * s.total
                             + 18 * l.dl * s.n AS DOUBLE))
                   * 1000000, 0) AS BIGINT) AS term_micro
        FROM tf
        JOIN dfreq d USING (token)
        JOIN dl l ON l.doc_id = tf.doc_id
        CROSS JOIN stats s
    )
    SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS score_micro
    FROM scored GROUP BY 1
    ORDER BY score_micro DESC, doc_id LIMIT 10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 (k1=1.2, b=0.75) for a fixed keyword
    query — the retrieval scorer a decontamination / quality pipeline
    runs over the inverted index.

    Scale shape: doc length is a projection over the documents scan
    (no token-stream aggregate for it); the explode feeds only the
    term-frequency aggregate, and the query-term filter prunes it to
    |terms|·|docs| rows BEFORE any join; df and the global (N, total)
    scalars join back broadcast-small (one row / |terms| rows); the
    final ranking is TakeOrderedAndProject.  Scoring exactness: tf part
    = one integer-rational division (k1, b cross-multiplied through),
    idf rounded 6dp off ln(), per-term scores in BIGINT micro-units so
    the per-doc sum is order-independent — no float accumulation
    anywhere."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    # doc length is a PROJECTION over the documents scan (size of the
    # split), not an explode+count branch — one fewer Exchange and one
    # fewer corpus re-scan than aggregating the token stream for it.
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfq"))
    idf6 = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("dfq") + F.lit(0.5))
            / (F.col("dfq") + F.lit(0.5))
        ),
        6,
    )
    tfpart = (44 * F.col("tf") * F.col("total")).cast("double") / (
        20 * F.col("tf") * F.col("total")
        + 6 * F.col("total")
        + 18 * F.col("dl") * F.col("n")
    ).cast("double")
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf6 * tfpart * F.lit(1_000_000.0), 0)
            .cast("bigint")
            .alias("term_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_micro").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(10)
    )


@_register(
    "value_histogram",
    """
    WITH b AS (
        SELECT event_type,
               CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19) AS BIGINT)
                   AS bucket
        FROM events
    )
    SELECT event_type, bucket, COUNT(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of event values per type (20 bins of width 25,
    clamped) — the profiling primitive behind quality dashboards and
    skew diagnosis.  One projection + one partial-aggregated groupBy;
    the bucket id is floor division of identical doubles, so both
    engines bin identically."""
    events = _t(spark, sf_dir, "events")
    bucket = (
        F.least(
            F.greatest(F.floor(F.col("value") / F.lit(25.0)), F.lit(0)),
            F.lit(19),
        )
    ).cast("bigint")
    return (
        events.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring: the KenLM-shaped quality filter reduced
# to its distributable core.  Exactness: each DISTINCT token's -log p is
# rounded once to 6dp and scaled to BIGINT micro-units; per-document
# accumulation and the final mean are integer ops, so summation order can
# never flip the hash (same discipline as bm25_search).
# ---------------------------------------------------------------------------


@_register(
    "unigram_logprob_score",
    """
    WITH tok AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM vocab),
    lp AS (
        SELECT token,
               CAST(ROUND(ROUND(-ln((cnt + 1.0) / (t.total + t.v)), 6)
                          * 1000000, 0) AS BIGINT) AS nlp_micro
        FROM vocab CROSS JOIN tot t
    ),
    scored AS (
        SELECT tok.doc_id, SUM(l.nlp_micro) AS sum_micro,
               COUNT(*) AS n_tok
        FROM tok JOIN lp l USING (token)
        GROUP BY 1
    )
    SELECT doc_id,
           CAST(sum_micro // n_tok AS BIGINT) AS avg_nlp_micro
    FROM scored
    ORDER BY avg_nlp_micro DESC, doc_id LIMIT 50
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most 'surprising' documents by mean unigram negative log
    probability (add-one smoothed, corpus-trained) — the reduced form of
    the perplexity filters pretraining pipelines run (KenLM-style), with
    the n>1 context window left to a real LM.

    Scale shape: ONE explode feeds both the vocabulary aggregate and the
    scoring join; -log p is computed per DISTINCT token (vocab-sized, not
    corpus-sized), rounded 6dp and scaled to BIGINT micro-units exactly
    once; the token→score join runs on the same key the vocab aggregate
    shuffled on (co-partitioned), deliberately unhinted (a 100 TB corpus
    vocabulary outgrows broadcast; AQE promotes when measured small); the
    per-doc sum and the mean are pure integer arithmetic — no float
    accumulates anywhere; final top-k is TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.round(
                -F.log((F.col("cnt") + F.lit(1.0)) / (F.col("total") + F.col("v"))),
                6,
            )
            * F.lit(1_000_000.0),
            0,
        )
        .cast("bigint")
        .alias("nlp_micro"),
    )
    scored = (
        tok.join(lp, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("nlp_micro").alias("sum_micro"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.expr("sum_micro div n_tok").cast("bigint").alias("avg_nlp_micro"),
        )
        .orderBy(F.col("avg_nlp_micro").desc(), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Document chunking with overlap: the context-window primitive every
# embedding / RAG / packing pipeline runs before encoding.  Pure
# sequence+slice+explode — no UDF, no shuffle until the consumer asks.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # overlap = size - stride = 8 tokens


@_register(
    "doc_chunking",
    f"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               UNNEST(generate_series(
                   1, greatest(len(t) - {_CHUNK_SIZE - _CHUNK_STRIDE}, 1),
                   {_CHUNK_STRIDE})) AS chunk_start,
               t
        FROM tok
    )
    SELECT doc_id, chunk_start,
           len(t[chunk_start : chunk_start + {_CHUNK_SIZE - 1}])
               AS n_chunk_tokens,
           md5(array_to_string(t[chunk_start : chunk_start + {_CHUNK_SIZE - 1}],
               ' ')) AS chunk_hash
    FROM chunks
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks ({_CHUNK_SIZE} tokens, stride
    {_CHUNK_STRIDE}, 8-token overlap) — the pre-encoding chunker of
    embedding/RAG pipelines, content-addressed (md5 of the chunk text) so
    the oracle checks exact chunk boundaries without hauling chunk bodies
    through the compare.

    Scale shape: tokens are bound ONCE behind a Generate barrier (the
    module's perf contract), chunk starts are a ``sequence`` + ``explode``
    — row counts grow ~n/stride per doc with zero shuffle; hashing is
    md5-portable.  At 100 TB this is a map-only stage that feeds the
    encoder's ``mapInPandas``."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    staged = docs.select(
        "doc_id",
        F.explode(F.array(tx.tokens_col(F.col("text")))).alias("t"),
    )
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("t") - F.lit(overlap), F.lit(1)),
        F.lit(_CHUNK_STRIDE),
    )
    chunked = staged.select(
        "doc_id", F.explode(starts).alias("chunk_start"), "t"
    )
    chunk = F.slice(
        F.col("t"), F.col("chunk_start"), F.lit(_CHUNK_SIZE)
    )
    return chunked.select(
        "doc_id",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
