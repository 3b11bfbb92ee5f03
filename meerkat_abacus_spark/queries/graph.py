"""Graph-propagation queries: fixed-iteration PageRank over a derived
document link graph, oracle-checked by unrolling the same iterations in SQL.

The link graph is synthesized deterministically from the documents table
(node = doc_id; three out-edges per node at ``(id*31 + 7 + j) mod N``,
self-loops dropped) so both engines construct the identical graph from the
identical parquet — the graph-shape analogue of the planted near-dup
corpora the dedup family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_abacus_spark.datapipe.graph import pagerank
from ._shared import _register, _t

_DAMP = 0.85  # = 17/20 exactly in the fixed-point update
_ITERS = 3
_SCALE = 10**12  # rank unit = 1e-12 of total mass


def _pagerank_oracle_sql() -> str:
    """Unrolled ``_ITERS`` PageRank iterations in EXACT integer arithmetic
    (advisor r6: per-iteration float rounding retained an ulp-boundary
    flip risk).  Ranks are BIGINT micro-units of 1/{scale}; integer sums
    are order-independent and ``//`` (floor div on non-negatives) is
    identical in both engines, so the oracle is bit-exact vs Spark's
    ``div``-based fixed-point path with no rounding guard at all."""
    iter_cte = """
    r{k} AS (
        SELECT nd.node,
               CAST((SELECT b FROM basev)
                    + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS s
            FROM edges_deg e JOIN r{prev} r ON e.src = r.node
            GROUP BY 1
        ) s USING (node)
    )"""
    iters = ",".join(
        iter_cte.format(k=k, prev=k - 1) for k in range(1, _ITERS + 1)
    )
    return f"""
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    raw_edges AS (
        SELECT doc_id AS src,
               (doc_id * 31 + 7 + j) % (SELECT n FROM nn) AS dst
        FROM documents CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) t
    ),
    edges AS (SELECT src, dst FROM raw_edges WHERE dst != src),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
    edges_deg AS (SELECT e.src, e.dst, o.outdeg
                  FROM edges e JOIN outdeg o USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    basev AS (SELECT (3 * {_SCALE}) // (20 * n) AS b FROM nn),
    r0 AS (SELECT node,
                  CAST({_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rank
           FROM nodes),
    {iters}
    SELECT node, rank AS rank_micro
    FROM r{_ITERS}
    ORDER BY rank_micro DESC, node
    LIMIT 100
    """


@_register("pagerank_docs", _pagerank_oracle_sql())
def pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 documents by fixed-iteration PageRank over the derived link
    graph — the reference-structure quality signal a crawl-corpus pipeline
    computes before sampling (see datapipe/graph.py for the scale shape:
    one edge join + one partial-agg shuffle per iteration, lineage pinned,
    one scalar to the driver).  Ranks are exact BIGINT micro-units
    (fixed_point_scale=1e12) so the cross-engine compare has no float in
    it anywhere."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    dsts = F.array(
        *[(F.col("doc_id") * 31 + 7 + j) % F.lit(n) for j in (0, 1, 2)]
    )
    edges = (
        docs.select(F.col("doc_id").alias("src"), F.explode(dsts).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )
    ranks = pagerank(
        edges, iterations=_ITERS, damping=_DAMP, fixed_point_scale=_SCALE
    )
    return (
        ranks.select("node", F.col("rank").alias("rank_micro"))
        .orderBy(F.col("rank_micro").desc(), F.col("node"))
        .limit(100)
    )
