"""Similarity search over embedding columns.

Two tiers:

- brute-force cosine top-k — the correctness baseline.  Queries broadcast
  (they're the small side); the corpus is scanned once, partition-parallel,
  and the per-query top-k is a groupBy window.  Fine for ≤ millions of
  corpus rows × few queries.
- sign-LSH bucketed ANN — the scale path.  Each vector gets a bucket key
  from the sign pattern of a fixed set of coordinates (a deterministic,
  engine-portable stand-in for random hyperplanes); search touches only the
  query's bucket.  On a 1000-executor cluster the corpus is hash-partitioned
  by bucket, so a query probes one partition instead of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from meerkat_abacus_spark.datapipe.dedup import cosine_similarity


def sign_lsh_bucket(vec: Column, dims: int = 8) -> Column:
    """Bucket key = concatenated sign bits of the first ``dims`` coordinates.

    Deterministic and reproducible in plain SQL (the oracle recomputes it);
    swap in md5-derived pseudo-random hyperplanes for production skew
    resistance without changing the plan shape.
    """
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(dims)
    ]
    return F.concat(*bits)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Self-matches are excluded; ties break on neighbor id so results are
    fully deterministic across engines.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    sim = cosine_similarity(F.col("qv"), F.col("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bucket_dims: int = 8,
) -> DataFrame:
    """ANN top-k: candidates limited to the query's sign-LSH bucket.

    Recall < 1 by construction; at scale add multi-probe (flip one bit per
    probe) by unioning bucket keys — the plan stays a bucket-key equi-join.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            sign_lsh_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
        )
    )
    sim = cosine_similarity(F.col("qv"), F.col("cv"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
