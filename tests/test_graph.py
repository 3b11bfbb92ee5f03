"""datapipe/graph.py: fixed-iteration PageRank semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ring_edges(spark, n=10):
    # directed ring 0->1->...->n-1->0: perfectly symmetric, so every node
    # must end at exactly 1/n.
    return spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )


def test_pagerank_uniform_on_ring(spark):
    from meerkat_abacus_spark.datapipe.graph import pagerank

    ranks = pagerank(_ring_edges(spark), iterations=4).collect()
    assert len(ranks) == 10
    for r in ranks:
        assert abs(r["rank"] - 0.1) < 1e-12


def test_pagerank_mass_and_sink_ordering(spark):
    from meerkat_abacus_spark.datapipe.graph import pagerank

    # star: 0..4 all point at 5; 5 points at 0.  Node 5 must out-rank the
    # spokes, and total mass stays <= 1 (= 1 here: no dangling nodes).
    edges = spark.createDataFrame(
        [(i, 5) for i in range(5)] + [(5, 0)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert got[5] == max(got.values())
    assert got[5] > got[1] > 0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_per_iter_round_is_stable_across_partitionings(spark):
    from meerkat_abacus_spark.datapipe.graph import pagerank

    edges = _ring_edges(spark, 50).unionByName(
        spark.createDataFrame(
            [(i, (i * 7 + 3) % 50) for i in range(50)], "src long, dst long"
        )
    ).filter(F.col("src") != F.col("dst"))
    a = pagerank(edges, iterations=3, per_iter_round=9)
    b = pagerank(edges.repartition(13), iterations=3, per_iter_round=9)
    ra = {r["node"]: r["rank"] for r in a.collect()}
    rb = {r["node"]: r["rank"] for r in b.collect()}
    assert ra == rb


def test_pagerank_fixed_point_rejects_int64_overflow(spark):
    """A long-decimal damping (huge fraction numerator p) would make
    p * s silently wrap int64 in non-ANSI Spark (advisor r7) — the guard
    must raise instead, and short-decimal dampings must stay accepted."""
    import pytest

    from meerkat_abacus_spark.datapipe.graph import pagerank

    edges = _ring_edges(spark, 4)
    with pytest.raises(ValueError, match="int64"):
        pagerank(
            edges,
            iterations=1,
            damping=0.123456789,  # p = 123456789 / 1e9
            fixed_point_scale=10**12,
        )
    ok = pagerank(
        edges, iterations=2, damping=0.85, fixed_point_scale=10**12
    ).collect()
    assert {r["rank"] for r in ok} == {10**12 // 4}
