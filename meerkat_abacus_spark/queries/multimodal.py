"""Multimodal columns: binary payload plumbing with deterministic fake
decode (schema/partitioning/batch shape real; codecs stubbed per SURVEY)."""

from __future__ import annotations

from meerkat_abacus_spark.datapipe.multimodal import attach_binary_payload, decode_media
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ._shared import _register, _t, render_two_band_oracle



# ---------------------------------------------------------------------------
# Multimodal plumbing: opaque binary payload → Arrow-batched mapInPandas
# decode (stubbed deterministically; see datapipe/multimodal.py) — checked
# against a SQL oracle computing the same bytes arithmetic.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_decode",
    """
    SELECT doc_id,
           'image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           ascii(substr(text, 1, 1)) AS first_byte,
           CAST(list_sum(list_transform(range(1, 9),
                i -> ascii(substr(text, i, 1)))) AS BIGINT) AS feature
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    decoded = decode_media(attach_binary_payload(docs, text_col="text"))
    return decoded.select(
        "doc_id", "media_type", "byte_len", "first_byte", "feature"
    )




@_register(
    "multimodal_resize",
    """
    SELECT doc_id,
           'image' AS media_type,
           md5(substring(text, 1, 32)) AS payload_md5,
           CAST(least(len(text), 32) AS INT) AS out_len
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in/binary-out mapInPandas plumbing (datapipe/multimodal.py
    resize_media); the oracle recomputes the deterministic truncation stub.
    The corpus is pure ASCII, so string arithmetic == byte arithmetic on
    the oracle side."""
    from meerkat_abacus_spark.datapipe.multimodal import resize_media

    docs = _t(spark, sf_dir, "documents")
    resized = resize_media(
        attach_binary_payload(docs, text_col="text"), target_bytes=32
    )
    return resized.select(
        "doc_id",
        "media_type",
        F.md5(F.col("payload")).alias("payload_md5"),
        "out_len",
    )




@_register(
    "multimodal_frames",
    """
    SELECT doc_id,
           CAST(u AS INT) AS frame_idx,
           CAST(64 AS INT) AS frame_len,
           md5(substring(text, CAST(u * 64 + 1 AS INT), 64)) AS frame_md5
    FROM (
        SELECT doc_id, text,
               unnest(range(0, len(text) // 64, 2)) AS u
        FROM documents
    )
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame-sampling fan-out (datapipe/multimodal.py sample_frames):
    every 2nd complete 64-byte frame, checked by per-frame md5 against the
    oracle's string-chunk arithmetic."""
    from meerkat_abacus_spark.datapipe.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    return sample_frames(
        attach_binary_payload(docs, text_col="text"), frame_size=64, every_n=2
    )


# ---------------------------------------------------------------------------
# Multimodal → similarity bridge: the feature-extract stage emits a real
# embedding column, sign-LSH buckets block the pairwise term, cosine
# verifies — the full image-near-dup pipeline shape with the encoder
# stubbed (datapipe/multimodal.py embed_media).
# ---------------------------------------------------------------------------

_EMB_TERM = (
    "(CASE WHEN len(text) >= {p} THEN ascii(substr(text, {p}, 1)) - 105 "
    "ELSE 0 END)"
)
_EMB_DIM_SQL = [
    "CAST(" + " + ".join(_EMB_TERM.format(p=d + 1 + 8 * i) for i in range(8))
    + " AS DOUBLE)"
    for d in range(8)
]
_MM_BUCKET_SQL = "|| ".join(
    f"(CASE WHEN {{side}}.v[{i + 1}] >= 0 THEN '1' ELSE '0' END) "
    for i in range(8)
)

# Second band (r13, the dedup_embedding_lsh pattern at dim 8): rotated
# hyperplanes from coordinate differences at stride 1 AND stride 2 — 8
# planes, so the band keeps bucket-count parity with the sign band.
_MM_DIFF_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (1, 3), (2, 4), (5, 7), (6, 8)]
_MM_BUCKET2_SQL = "|| ".join(
    f"(CASE WHEN {{side}}.v[{i}] - {{side}}.v[{j}] >= 0 "
    "THEN '1' ELSE '0' END) "
    for i, j in _MM_DIFF_PAIRS
)
_MM_COS_SQL = (
    "(list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))"
)


# Persisted embedded-corpus frames, keyed by (appId, dataset fingerprint)
# and BOUNDED (VERDICT r13 ask #7 / ADVICE r13 #3): the banded pair
# generator scans its input once per band side plus twice for the verify
# join, and the Arrow extractor is the expensive stage at scale — so the
# narrow (id, 8-double, 2 keys) projection is extracted once and pinned.
# persist(), NOT localCheckpoint(): lazy (building the DataFrame must not
# run the extractor — tools/explain.py constructs plans for every
# INTERESTING query) and the cached plan stays visible to the
# plan-invariant checks (a checkpoint truncates the tree at an
# ExistingRDD scan, hiding the documents FileScan pruning evidence).
# Previously the query persisted unconditionally with no release path, so
# a long-lived session sweeping many sf_dirs accumulated one cache entry
# per dataset forever; this mirrors queries/dedup.py's _CAND_CACHE —
# bounded eviction with unpersist, plus an explicit clear for harnesses.
_EMB_CACHE: "dict[tuple, DataFrame]" = {}


def _embedded_corpus_cached(
    spark: SparkSession, sf_dir: str, corpus: DataFrame
) -> DataFrame:
    from ._shared import _scratch_tag_ok

    tag, tag_ok = _scratch_tag_ok(sf_dir)
    if not tag_ok:
        # Path-only fingerprint (ADVICE r14 #1): the tag no longer hashes
        # the dataset's (name, size, mtime) listing, so caching under it
        # could serve a stale pinned frame against a regenerated dataset.
        # Skip the cache entirely — unpinned is correct, just slower —
        # mirroring _scratch_tag's own memo skip.
        return corpus
    key = (spark.sparkContext.applicationId, tag)
    # LRU, not FIFO (VERDICT r14 ask #6): re-insert on hit so eviction
    # (front pop) drops the least-recently-USED frame — a hot dataset
    # alternating with three cold ones must survive the pressure.
    cached = _EMB_CACHE.pop(key, None)
    if cached is not None:
        _EMB_CACHE[key] = cached
        return cached
    pinned = corpus.persist()
    while len(_EMB_CACHE) >= 4:
        old = _EMB_CACHE.pop(next(iter(_EMB_CACHE)))
        try:
            old.unpersist()
        except Exception:
            pass
    _EMB_CACHE[key] = pinned
    return pinned


def clear_embed_cache() -> None:
    """Unpersist and drop every pinned embedded-corpus frame — the
    multimodal twin of queries.dedup.clear_candidate_cache, called by
    bench.py / rehearsal harnesses before stopping the SparkSession."""
    while _EMB_CACHE:
        _, frame = _EMB_CACHE.popitem()
        try:
            frame.unpersist(blocking=True)
        except Exception:
            pass


@_register(
    "multimodal_embed_neardup",
    render_two_band_oracle(
        f"SELECT doc_id, [{', '.join(_EMB_DIM_SQL)}] AS v FROM documents",
        "doc_id", _MM_BUCKET_SQL, _MM_BUCKET2_SQL, _MM_COS_SQL,
        cap=5000, min_cosine=0.995,
    ),
)
def multimodal_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → feature-extract (embedding) → sign-LSH block → cosine
    verify: the composed multimodal near-dup pipeline, sharing
    dedup_embedding_lsh's TWO-BAND cap discipline (r13): coordinate signs
    plus rotated coordinate-difference signs (stride 1 + stride 2 pairs
    at dim 8, keeping 2⁸ bucket parity per band), antithetic md5 sample
    caps per band, one cosine verify pass over the distinct candidate
    union.  A capped hot bucket therefore gets a second,
    complementary-sampled chance instead of single-band cap²/n²; only the
    embedding SOURCE differs from the dedup family (Arrow-batched
    extractor instead of a stored column)."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.datapipe import similarity as sim
    from meerkat_abacus_spark.datapipe.multimodal import embed_media

    docs = _t(spark, sf_dir, "documents")
    emb = embed_media(attach_binary_payload(docs, text_col="text"))
    corpus = _embedded_corpus_cached(
        spark,
        sf_dir,
        emb.withColumn("b1", sim.coordinate_sign_bucket(F.col("embedding"), 8))
        .withColumn(
            "b2", sim.diff_sign_bucket(F.col("embedding"), _MM_DIFF_PAIRS)
        )
        .select("doc_id", "embedding", "b1", "b2"),
    )
    pairs = dd.embedding_near_dup_pairs_banded(
        corpus, id_col="doc_id", vec_col="embedding", band_cols=["b1", "b2"],
        min_cosine=0.995, max_block=5000, cap_policy="sample",
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 3).alias("cosine"))
