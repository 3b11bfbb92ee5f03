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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (the
    inverted list), probe only the query's ``n_probe`` nearest lists.

    ``centroids`` is (centroid_id, vector) — train however you like (k-means
    upstream, or any deterministic subset for reproducible tests).  At scale
    the corpus is hash-partitioned by ``centroid_id``, so a query touches
    ``n_probe`` partitions instead of the full corpus; the centroid table
    broadcasts.

    Plan: two broadcast joins (corpus×centroids to build lists once —
    amortized across queries; queries×centroids per query batch) and one
    equi-join on centroid_id. No cross product ever materializes.
    """
    cent = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col(vec_col).alias("cv_cent")
        )
    )

    def assign(df: DataFrame, idc: str, out: str, probes: int) -> DataFrame:
        sim = cosine_similarity(F.col(vec_col), F.col("cv_cent"))
        w = Window.partitionBy(idc).orderBy(
            F.col("__csim").desc(), F.col("centroid_id").asc()
        )
        return (
            df.crossJoin(cent)
            .withColumn("__csim", sim)
            .withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= probes)
            .select(df["*"], F.col("centroid_id").alias(out))
        )

    lists = assign(corpus, id_col, "list_id", 1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "list_id"
    )
    probed = assign(queries, id_col, "list_id", n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "list_id"
    )
    sim = cosine_similarity(F.col("qv"), F.col("cv"))
    scored = (
        probed.join(lists, "list_id")
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
