"""Link-graph propagation: fixed-iteration PageRank over an edge DataFrame.

The training-data-pipeline use case: score documents/pages by reference
structure (quality weighting for crawl corpora, seed expansion, spam
demotion) — the same iterated sparse matrix-vector product behind every
"importance" signal.  The reference engine has no graph operator; this is
a scale-path extra in the same family as dedup's connected components
(``datapipe/dedup.py``), and it reuses that operator's Spark discipline:

- **per iteration, the edge list is touched exactly once**: one equi-join
  of edges→ranks on the source node, one hash aggregation of contributions
  by destination.  Both shuffle on node id; with edges pre-partitioned by
  ``src`` the join side is exchange-free after the first iteration.
- **map-side partial aggregation** collapses per-partition contributions
  before the shuffle, so per-iteration shuffle volume is O(distinct dst
  per partition), not O(edges).
- **lineage is pinned per iteration** (``localCheckpoint``; reliable
  ``checkpoint`` on clusters via ``checkpoint_dir``) — without it each
  pass replays every previous pass and the plan goes quadratic, the same
  failure mode connected components guards against.
- **the driver sees one scalar** (the node count), never rows.

Semantics: the standard damped update
``r' = (1-d)/N + d * Σ_{(s→t) ∈ E} r(s)/outdeg(s)`` with NO dangling-mass
redistribution (nodes without out-edges leak their damped mass, as in the
original formulation); fixed ``iterations``, no convergence test — rank
queries want a deterministic, engine-reproducible result, and the oracle
unrolls the same iterations in SQL.

``per_iter_round`` optionally rounds ranks to that many decimals after
each iteration: double summation order differs across engines (and across
partitionings), and rounding well below the precision anyone reads (e.g.
9dp) stops the noise compounding through iterations — the trick that
makes cross-engine hash comparison of an iterative float algorithm stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    per_iter_round: int | None = None,
    checkpoint_dir: str | None = None,
    fixed_point_scale: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank: returns ``(node, rank)`` for every node
    appearing as a source or destination in ``edges``.

    ``fixed_point_scale`` switches to EXACT integer arithmetic (advisor r6:
    per-iteration rounding still leaves a residual flip risk when a true
    value lands within an ulp of a rounding boundary).  Ranks become
    BIGINT units of 1/scale: the initial mass is ``scale div N``, each
    edge contributes ``rank div outdeg``, and the damped update is
    ``base + (p*s) div q`` with damping expressed exactly as the fraction
    p/q (0.85 = 17/20).  Integer sums are order-independent and integer
    division is identical in every engine, so the result is bit-exact
    across engines BY CONSTRUCTION — no rounding guard needed.  The
    truncation each op loses is < 1/scale (~1e-12 at the default query
    scale), far below anything a rank consumer reads."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _pin(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # One shuffle up front; every iteration reuses the pinned (src, dst,
    # outdeg) rows and the pinned node set.
    edges_deg = _pin(edges.join(outdeg, "src"))
    nodes = _pin(nodes)
    n = nodes.count()  # the single driver scalar

    if fixed_point_scale is not None:
        from fractions import Fraction

        S = fixed_point_scale
        frac = Fraction(str(damping))
        p, q = frac.numerator, frac.denominator
        # The damped update computes p * s with s bounded by the total
        # mass S (contributions are rank div outdeg, summed over a
        # partition of the edge set, so Σs <= Σrank <= S).  A damping
        # value that is not a short decimal (e.g. 0.123456789 → p ≈ 1.2e8)
        # can push p * S past int64, which non-ANSI Spark wraps SILENTLY
        # into wrong ranks (advisor r7).  Fail loudly instead.
        if p * S > 2**63 - 1:
            raise ValueError(
                f"damping numerator {p} * fixed_point_scale {S} exceeds "
                "int64; use a shorter-decimal damping or a smaller scale"
            )
        ranks = nodes.select(
            "node", F.lit(S // n).cast("long").alias("rank")
        )
        base = F.lit(((q - p) * S) // (q * n)).cast("long")
        for _ in range(iterations):
            contribs = (
                edges_deg.join(ranks, edges_deg.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank div outdeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            rank_expr = base + F.expr(
                f"({p} * coalesce(s, 0L)) div {q}"
            )
            ranks = _pin(
                nodes.join(contribs, "node", "left").select(
                    "node", rank_expr.cast("long").alias("rank")
                )
            )
        return ranks

    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    base = F.lit((1.0 - damping) / float(n))
    for _ in range(iterations):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        rank_expr = base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
        if per_iter_round is not None:
            rank_expr = F.round(rank_expr, per_iter_round)
        ranks = _pin(
            nodes.join(contribs, "node", "left").select(
                "node", rank_expr.alias("rank")
            )
        )
    return ranks
