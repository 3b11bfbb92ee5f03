"""Scale rehearsal for the dedup family (round-2 verdict #8).

Builds a ~sf1.0 documents corpus (10x the sf0.1 table; every copy gets a
distinct marker token spliced between words so copies are NOT near-dups of
each other — the duplicate structure within each copy mirrors the source
data, the corpus-level uniqueness mirrors a real 10x scale-up), then times
``dedup_minhash_lsh`` and ``dedup_clusters`` at sf0.1 and sf~1.0 and
reports LSH bucket-size discipline (max / p99 band-bucket population).

Run: ``python tools/scale_rehearsal.py``  → one JSON line.
Evidence target: sf1.0 wall within ~10x of sf0.1 (linear-ish), max bucket
size flat — candidate generation stays equi-join-bounded, no quadratic
spill.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_sf1(spark, src_dir: str, dest_dir: str) -> None:
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    copies = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * k).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                # splice a copy-marker token between every pair of words:
                # nearly every shingle differs, so copies are unique docs
                else F.regexp_replace(
                    F.col("text"), " ", f" w{k}x "
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(10)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest_dir}/documents.parquet")


def bucket_stats(spark, sf_dir: str) -> dict:
    """Band-bucket population distribution for the minhash-LSH config used
    by the dedup_minhash_lsh query — computed via the SAME staged
    ``lsh_band_key_rows`` construction the shipped operator uses, under
    queries.MINHASH_CFG, so the audit always measures the shipped
    parameterization."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries import MINHASH_CFG, _doc_corpus

    keys = dd.lsh_band_key_rows(
        _doc_corpus(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        shingle_k=MINHASH_CFG["shingle_k"],
        num_hashes=MINHASH_CFG["num_hashes"],
        bands=MINHASH_CFG["bands"],
        rows_per_band=MINHASH_CFG["rows_per_band"],
    )
    sizes = keys.groupBy("band_key").count()
    row = sizes.agg(
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    return {"max_bucket": row["max"], "p99_bucket": row["p99"],
            "n_buckets": row["n_buckets"]}


REHEARSED = (
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash_wide",
    "dedup_repeated_spans",
    # text-aggregation family (r5): explode-heavy aggregations whose output
    # is top-k / threshold-bounded — wall must scale with the corpus, rows
    # must not explode
    "vocab_topk",
    "tfidf_top_terms",
    "inverted_index",
    "fuzzy_decontaminate",
    # cross-document span-level dedup removal (r9): gram-keyed equi-join,
    # rewrite output is one row per doc — wall must scale with corpus
    "dedup_span_removal",
)


def time_queries(spark, sf_dir: str) -> dict:
    from meerkat_abacus_spark.queries import QUERIES

    out = {}
    for name in REHEARSED:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    return out


def build_events_10x(spark, src_dir: str, dest_dir: str) -> None:
    """10x the events form table with DISJOINT ids/users per copy — the
    composed pipeline's volume AND key cardinality both scale, mirroring a
    real 10x deployment (more clinics, not more rows per clinic)."""
    from meerkat_abacus_spark.queries import _t

    events = _t(spark, src_dir, "events")
    copies = [
        events.select(
            (F.col("event_id") + 10_000_000 * k).alias("event_id"),
            "ts",
            (F.col("user_id") + 1_000_000 * k).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(10)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest_dir}/events.parquet")


def time_pipeline(spark, sf_dir: str) -> dict:
    """Wall time of the composed QC->fanout->coding->aggregate pipeline
    (pipeline_composed = plans/pipeline.py's surveillance_pipeline): the
    flagship end-to-end chain, timed warm (first run pays codegen)."""
    from meerkat_abacus_spark.queries import QUERIES

    QUERIES["pipeline_composed"](spark, sf_dir).count()  # warmup
    t0 = time.time()
    n = QUERIES["pipeline_composed"](spark, sf_dir).count()
    return {"pipeline_composed": {"sec": round(time.time() - t0, 2), "rows": n}}


def build_events_100x(spark, src_dir: str, dest_dir: str) -> None:
    """100x events with disjoint ids/users per copy (r6 verdict ask #7):
    the composed surveillance pipeline has been rehearsed at 10x but
    never at 100x — volume AND key cardinality (clinics/users) both
    scale, mirroring a 100x deployment."""
    from meerkat_abacus_spark.queries import _t

    events = _t(spark, src_dir, "events")
    copies = [
        events.select(
            (F.col("event_id") + 10_000_000 * k).alias("event_id"),
            "ts",
            (F.col("user_id") + 1_000_000 * k).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(100)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dest_dir}/events.parquet"
    )


def pipeline_stage_rows(spark, sf_dir: str) -> dict:
    """Per-stage row counts of the composed surveillance pipeline
    (QC-shaped input → to_data_type fan-out → coding → date filter →
    report aggregate) — the cardinality waterfall the 100x leg reports
    alongside wall time.  Uses the SAME specs/rules as the certified
    pipeline_composed query."""
    from meerkat_abacus_spark.operators.to_data_type import DataTypeSpec
    from meerkat_abacus_spark.plans.pipeline import surveillance_pipeline
    from meerkat_abacus_spark.queries import _t
    from meerkat_abacus_spark.queries.surveillance import _PIPE_RULES

    events = _t(spark, sf_dir, "events")
    specs = [
        DataTypeSpec(name="Case", type="case", form="events",
                     db_column="event_type", condition="purchase",
                     date="ts", var="tot_1", uuid="event_id"),
        DataTypeSpec(name="Visit", type="visit", form="events",
                     date="ts", var="vis_1", uuid="event_id"),
    ]
    data = surveillance_pipeline(
        {"events": events}, specs, _PIPE_RULES, links=None, epi_config="day:0"
    )
    filtered = data.filter(F.col("epi_year") >= 2023)
    report = (
        filtered.select(
            "type", F.explode(F.map_keys(F.col("variables"))).alias("var_id")
        )
        .groupBy("type", "var_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return {
        "events_rows": events.count(),
        "coded_rows": data.count(),
        "date_filtered_rows": filtered.count(),
        "report_rows": report.count(),
    }


def candidate_waterfall(spark, sf_dir: str) -> dict:
    """Candidate-pair counts per stage of the dedup_clusters leg (r7
    verdict ask #3): the 3-gen corpus → staged hash rows → band rows →
    over-cap buckets → raw band-collision pairs → unique pairs → verified
    (jaccard >= 0.4) pairs → components.  Same construction as the shipped
    query (shared MINHASH_CFG + datapipe functions), so the reported
    growth IS the shipped operator's growth."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries import MINHASH_CFG
    from meerkat_abacus_spark.queries._shared import _doc_corpus3

    cfg = MINHASH_CFG
    corpus = _doc_corpus3(spark, sf_dir)
    hs = dd.staged_shingle_hash_rows(
        corpus, "doc_id", "text", cfg["shingle_k"]
    ).localCheckpoint(eager=False)
    keys = dd.lsh_band_key_rows(
        corpus, "doc_id", "text", cfg["shingle_k"], cfg["num_hashes"],
        cfg["bands"], cfg["rows_per_band"], staged=hs,
    ).localCheckpoint(eager=False)
    over = (
        keys.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("m"))
        .filter(F.col("n") > cfg["max_bucket_size"])
    )
    left = (
        keys.join(
            F.broadcast(over.select("band_key", F.col("m").alias("__min_id"))),
            "band_key", "left",
        )
        .filter(
            F.col("__min_id").isNull() | (F.col("id") == F.col("__min_id"))
        )
        .select("id", "band_key")
    )
    raw = (
        left.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    uniq = raw.dropDuplicates(["id_a", "id_b"]).localCheckpoint(eager=False)
    verified = dd.attach_jaccard(uniq, hs).filter(
        F.col("jaccard") >= 0.4
    ).localCheckpoint(eager=False)
    comps = dd.connected_components_star(verified)
    return {
        "docs": corpus.count(),
        "band_rows": keys.count(),
        "overcap_buckets": over.count(),
        "raw_band_pairs": raw.count(),
        "unique_pairs": uniq.count(),
        "verified_pairs": verified.count(),
        "component_nodes": comps.count(),
    }


def clusters_stage_timings(spark, sf_dir: str) -> dict:
    """WALL-CLOCK attribution per stage of dedup_clusters (VERDICT r15
    ask #5: minhash scales 12.1x at 100x data but clusters scales 28.8x,
    and cc_profile shows the CC itself converging in one round — so the
    extra factor must live in the stages around it).  Same construction
    as :func:`candidate_waterfall` (shared MINHASH_CFG + datapipe
    functions over the 3-gen corpus), but every stage boundary is
    materialized (localCheckpoint) and counted IN ORDER, so each timing
    pays only its own stage: shingle-hash staging → band keys → over-cap
    bucket agg → capped pair join + dedup → jaccard verify → star CC.
    NOTE the corpus asymmetry this leg makes explicit: dedup_minhash_lsh
    runs on the 2-gen corpus (2x docs), dedup_clusters on the 3-gen
    corpus (3x docs) — the headline 12.1x-vs-28.8x comparison spans
    corpora of different sizes, not just different work."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries import MINHASH_CFG
    from meerkat_abacus_spark.queries._shared import _doc_corpus3

    cfg = MINHASH_CFG
    corpus = _doc_corpus3(spark, sf_dir)
    out: dict = {}

    def staged(name: str, df):
        df = df.localCheckpoint(eager=False)
        t0 = time.time()
        n = df.count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        return df

    hs = staged(
        "hash_rows",
        dd.staged_shingle_hash_rows(corpus, "doc_id", "text", cfg["shingle_k"]),
    )
    keys = staged(
        "band_keys",
        dd.lsh_band_key_rows(
            corpus, "doc_id", "text", cfg["shingle_k"], cfg["num_hashes"],
            cfg["bands"], cfg["rows_per_band"], staged=hs,
        ),
    )
    over = staged(
        "overcap_buckets",
        keys.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("m"))
        .filter(F.col("n") > cfg["max_bucket_size"]),
    )
    left = (
        keys.join(
            F.broadcast(over.select("band_key", F.col("m").alias("__min_id"))),
            "band_key", "left",
        )
        .filter(F.col("__min_id").isNull() | (F.col("id") == F.col("__min_id")))
        .select("id", "band_key")
    )
    uniq = staged(
        "unique_pairs",
        left.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"]),
    )
    verified = staged(
        "verified_pairs",
        dd.attach_jaccard(uniq, hs).filter(F.col("jaccard") >= 0.4),
    )
    stats: dict = {}
    t0 = time.time()
    comps = dd.connected_components_star(verified, stats=stats)
    grouped = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    n = grouped.count()
    out["cc_and_group"] = {
        "sec": round(time.time() - t0, 2),
        "rows": n,
        "cc_iterations": stats.get("iterations"),
    }
    total = round(sum(v["sec"] for v in out.values()), 2)
    out["total_sec"] = total
    for name, v in list(out.items()):
        if isinstance(v, dict) and total:
            v["share"] = round(v["sec"] / total, 3)
    return out


def span_waterfall(spark, sf_dir: str) -> dict:
    """Per-stage cardinalities of dedup_span_removal (r8 verdict ask #2):
    documents → k-gram occurrences → distinct grams → cross-document
    grams → duplicate occurrences → covered token positions → rewritten
    docs / removed spans.  Built from the SAME datapipe construction as
    the shipped query (k = queries.dedup._SPAN_K), so the reported growth
    is the shipped operator's growth — the candidate stage must scale
    with gram occurrences (corpus tokens), never quadratically."""
    from meerkat_abacus_spark.queries._shared import _t
    from meerkat_abacus_spark.queries.dedup import _SPAN_K as k
    from meerkat_abacus_spark.datapipe import dedup as dd

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.filter(
            F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")
        ).alias("ts"),
    )
    n = F.size("ts")
    occ = toks.select(
        "id",
        F.posexplode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice("ts", i + 1, k))
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "g"),
    ).localCheckpoint(eager=True)
    owners = (
        occ.groupBy("g")
        .agg(F.min("id").alias("owner"), F.max("id").alias("mx"))
    )
    cross = owners.filter(F.col("mx") > F.col("owner"))
    dup = occ.join(cross.select("g", "owner"), "g").filter(
        F.col("id") > F.col("owner")
    )
    covered = dup.select(
        "id", F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("c")
    ).distinct()
    out = dd.span_dedup_removal(docs, k=k)
    agg = out.agg(
        F.sum(F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0)).alias("rw"),
        F.sum("n_spans_removed").alias("sp"),
    ).collect()[0]
    return {
        "docs": docs.count(),
        "gram_occurrences": occ.count(),
        "distinct_grams": owners.count(),
        "crossdoc_grams": cross.count(),
        "dup_occurrences": dup.count(),
        "covered_positions": covered.count(),
        "docs_rewritten": agg["rw"],
        "spans_removed": agg["sp"],
    }


def span_fixpoint(spark, sf_dir: str) -> dict:
    """Second-pass residual of dedup_span_removal (VERDICT r9 ask #5).

    The rewrite is not idempotent by construction (same as Lee et al.'s
    suffix-array excision): splicing out a covered run can join the
    tokens on either side into a NEW k-window that also recurs across
    documents.  This leg quantifies the docstring's claim — run pass 1,
    feed the rewritten corpus through pass 2, and report pass-2 removals
    relative to pass 1 (expected ≪1%; if it ever turns material, the
    operator grows an iterate_to_fixpoint option)."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries._shared import _t
    from meerkat_abacus_spark.queries.dedup import _SPAN_K as k

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def _agg(out):
        row = out.agg(
            F.sum("n_tokens").alias("tok"),
            F.sum("n_removed_tokens").alias("rm"),
            F.sum("n_spans_removed").alias("sp"),
            F.sum(
                F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0)
            ).alias("rw"),
        ).collect()[0]
        return {
            "tokens": row["tok"], "removed_tokens": row["rm"],
            "spans_removed": row["sp"], "docs_rewritten": row["rw"],
        }

    p1 = dd.span_dedup_removal(docs, k=k).localCheckpoint(eager=True)
    s1 = _agg(p1)
    p2 = dd.span_dedup_removal(
        p1.select("doc_id", F.col("clean_text").alias("text")), k=k
    )
    s2 = _agg(p2)
    p1.unpersist()
    return {
        "pass1": s1,
        "pass2": s2,
        "residual_removed_ratio": round(
            s2["removed_tokens"] / max(s1["removed_tokens"], 1), 6
        ),
        "residual_spans_ratio": round(
            s2["spans_removed"] / max(s1["spans_removed"], 1), 6
        ),
    }


def build_docs_100x(spark, src_dir: str, dest_dir: str) -> None:
    """100x the documents corpus (1.5M docs) with the same marker-token
    splice as :func:`build_sf1` — copies are corpus-unique, duplicate
    structure per copy mirrors the source.  One shuffle-free union of 100
    projections, repartitioned once at the write."""
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    copies = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * k).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.regexp_replace(F.col("text"), " ", f" w{k}x ")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(100)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dest_dir}/documents.parquet"
    )


def skew_leg(spark, sf_dir: str) -> dict:
    """Hot-key stress for the ORDERED-aggregation skew recipe: plain vs
    salted inverted-index posting build on the same corpus, plus the
    hottest token's document frequency (= the single-reducer fan-in the
    plain build concentrates on one task and the salted build spreads over
    8 shards).  The salted variant's wall should track the plain one at
    1x and degrade strictly less as the hot posting grows — the evidence
    behind the 'skew handled' claim for holistic collects, complementing
    the skew_salted_agg oracle row (which certifies equality, not
    scaling)."""
    from meerkat_abacus_spark.queries import QUERIES, _t

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("token"),
    )
    hot = (
        tok.groupBy("token").count().orderBy(F.desc("count")).limit(1)
        .collect()[0]
    )
    out: dict = {"hot_token_df": hot["count"]}
    for name in ("inverted_index", "inverted_index_salted"):
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    return out


def hot_basket_leg(spark, sf_dir: str, hot_parts: int = 30_000) -> dict:
    """VERDICT r10 ask #7: co-occurrence hot-basket stress.  Plants ONE
    order holding ``hot_parts`` distinct parts next to the sf0.1 lineitem
    (the 10^4-item basket a single hot user/session key produces at
    100 TB) and times basket_pairs' PRE-JOIN guard (ask #2's fix: the
    ≤20-size semi-join filters both self-join inputs, so the hot basket
    never enters the pairwise term) against the old guard-AFTER-join
    shape, which generates ~hot_parts²/2 pairs first and drops them
    after.  The guarded wall should stay flat vs the unplanted corpus;
    the unguarded one degrades with the square of the basket size."""
    from meerkat_abacus_spark.queries import QUERIES, _t
    from meerkat_abacus_spark.queries._shared import _scratch_tag

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    hot = spark.range(hot_parts).select(
        F.lit(-1).cast("long").alias("l_orderkey"),
        (F.col("id") + 10_000_000).alias("l_partkey"),
    )
    planted = tempfile.gettempdir() + f"/msa_hotbasket_{_scratch_tag(sf_dir)}"
    shutil.rmtree(planted, ignore_errors=True)
    os.makedirs(planted)
    li.unionByName(hot).write.parquet(planted + "/lineitem.parquet")

    def unguarded(sf: str):
        items = (
            spark.read.parquet(sf + "/lineitem.parquet")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        sized = (
            items.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= 20)
            .select(F.col("l_orderkey").alias("__sized_ok"))
        )
        a, b = items.alias("a"), items.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .join(sized, F.col("a.l_orderkey") == F.col("__sized_ok"))
            .select(
                F.col("a.l_partkey").alias("part_a"),
                F.col("b.l_partkey").alias("part_b"),
            )
        )
        return (
            pairs.groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
            .limit(50)
        )

    out: dict = {"hot_basket_size": hot_parts}
    QUERIES["basket_pairs"](spark, sf_dir).collect()  # discarded JIT warmup
    t0 = time.time()
    base_rows = sorted(map(tuple, QUERIES["basket_pairs"](spark, sf_dir).collect()))
    out["guarded_unplanted_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    guarded_rows = sorted(
        map(tuple, QUERIES["basket_pairs"](spark, planted).collect())
    )
    out["guarded_hot_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    unguarded_rows = sorted(map(tuple, unguarded(planted).collect()))
    out["unguarded_hot_sec"] = round(time.time() - t0, 2)
    # the hot basket is over-cap, so it changes NO answers — all three runs
    # must agree (the guard is a plan optimization, not a semantics change)
    out["answers_identical"] = base_rows == guarded_rows == unguarded_rows
    out["guarded_flat_ratio"] = (
        round(out["guarded_hot_sec"] / out["guarded_unplanted_sec"], 2)
        if out["guarded_unplanted_sec"]
        else None
    )
    out["unguarded_degrade_ratio"] = (
        round(out["unguarded_hot_sec"] / out["guarded_hot_sec"], 2)
        if out["guarded_hot_sec"]
        else None
    )
    shutil.rmtree(planted, ignore_errors=True)
    return out


def capped_recall_minhash(
    spark, docs_dir: str, sample_buckets: int = 20, sample_members: int = 120
) -> dict:
    """Quantify the MinHash bucket-cap recall trade (VERDICT r11 ask #2).

    The STAR policy (datapipe/dedup.py minhash_lsh_candidates) bounds an
    over-cap band bucket at O(n) star edges instead of O(n²) pairs — a
    similar pair inside such a bucket survives only if another band emits
    it or one member IS the bucket minimum.  This leg measures what that
    actually costs on the 100×-docs corpus: sample ``sample_buckets``
    over-cap buckets uniformly (md5 order), exact-verify Jaccard on up to
    ``sample_members`` members each, and check which verified-true pairs
    the shipped candidate generator emitted anyway.  The per-pair rates
    extrapolate by pair capacity (ratio estimator) to ALL capped buckets;
    pairs sitting in several capped buckets can be counted once per
    bucket, so the extrapolated miss is an UPPER bound.

    Driver-side collects are bounded metadata: the (band_key, n) list of
    over-cap buckets (6.5k rows at 1.5M docs) and per-bucket sample
    counts."""
    import hashlib

    from pyspark.sql import Window

    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries import MINHASH_CFG
    from meerkat_abacus_spark.queries._shared import _doc_corpus3
    from meerkat_abacus_spark.queries.dedup import _verified_candidates

    cfg = MINHASH_CFG
    cap = cfg["max_bucket_size"]
    corpus = _doc_corpus3(spark, docs_dir)
    hs = dd.staged_shingle_hash_rows(
        corpus, "doc_id", "text", cfg["shingle_k"]
    ).localCheckpoint(eager=False)
    keys = dd.lsh_band_key_rows(
        corpus, "doc_id", "text", cfg["shingle_k"], cfg["num_hashes"],
        cfg["bands"], cfg["rows_per_band"], staged=hs,
    ).localCheckpoint(eager=True)
    capped_rows = (
        keys.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .collect()
    )
    out: dict = {"cap": cap, "capped_buckets": len(capped_rows)}
    if not capped_rows:
        out.update(
            {"est_missed_true_pairs": 0, "missed_fraction": 0.0}
        )
        return out

    def _cap2(n: int) -> int:
        return n * (n - 1) // 2

    total_capacity = sum(_cap2(r["n"]) for r in capped_rows)
    sampled = sorted(
        capped_rows,
        key=lambda r: hashlib.md5(str(r["band_key"]).encode()).hexdigest(),
    )[:sample_buckets]
    skeys = [r["band_key"] for r in sampled]

    w = Window.partitionBy("band_key").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    mem = (
        keys.filter(F.col("band_key").isin(skeys))
        .select("band_key", "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sample_members)
        .select("band_key", "id")
        .localCheckpoint(eager=True)
    )
    pairs = (
        mem.alias("a")
        .join(
            mem.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.band_key").alias("band_key"),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
    )
    # exact verification on the sampled pairs (same jaccard as the engine)
    jpairs = pairs.join(
        hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")),
        "id_a",
    ).join(
        hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size(F.col("hs_a")) + F.size(F.col("hs_b")) - inter
    true_pairs = (
        jpairs.select(
            "band_key", "id_a", "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.4)
        .localCheckpoint(eager=True)
    )
    # which true pairs did the shipped generator emit anyway (other band,
    # or one member is the bucket min)?  _verified_candidates is the
    # SHARED cached frame the dedup_clusters query itself serves from.
    cands = _verified_candidates(spark, docs_dir, corpus, "corpus3")
    missed = true_pairs.join(
        cands.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    )

    sampled_pairs = pairs.count()
    n_true = true_pairs.count()
    n_missed = missed.count()
    verified_total = cands.count()
    true_rate = n_true / sampled_pairs if sampled_pairs else 0.0
    missed_rate = n_missed / sampled_pairs if sampled_pairs else 0.0
    est_missed = missed_rate * total_capacity
    est_true = true_rate * total_capacity
    out.update(
        {
            "sampled_buckets": len(sampled),
            "sampled_pairs": sampled_pairs,
            "sampled_true_pairs": n_true,
            "sampled_missed_true_pairs": n_missed,
            "recovered_fraction": (
                round(1.0 - n_missed / n_true, 4) if n_true else None
            ),
            "capped_pair_capacity": total_capacity,
            "est_true_pairs_in_capped": int(est_true),
            "est_missed_true_pairs": int(est_missed),
            "verified_pairs_total": verified_total,
            "missed_fraction": (
                round(est_missed / (verified_total + est_missed), 6)
                if (verified_total + est_missed)
                else 0.0
            ),
        }
    )
    return out


def capped_recall_embedding(spark, sf_dir: str, plant: int = 6000) -> dict:
    """Quantify the sign-LSH embedding cap's recall trade under BOTH
    policies (VERDICT r11 ask #2).  On this corpus no natural bucket is
    over-cap (reported), so the leg PLANTS one: ``plant`` vectors sharing
    one base vector's orthant, a third of them near-identical jitters
    (pairwise cosine ≥ 0.99 — true dups at risk) and the rest
    magnitude-perturbed decoys (same signs, cosine < 0.99).  A sampled
    exact-cosine pass measures the bucket's true-pair rate, extrapolated
    to the bucket's pair capacity = what the old SKIP policy lost whole;
    the shipped SAMPLE policy (r12: dedup_embedding_lsh keeps a
    deterministic md5-ordered ≤cap subset) is then run for real and its
    emitted hot-bucket pairs counted — the recovered fraction — with the
    natural under-cap pairs asserted identical under both policies."""
    import numpy as np

    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.datapipe import similarity as sim
    from meerkat_abacus_spark.queries._shared import _emb_corpus

    corpus = _emb_corpus(spark, sf_dir)
    cap = 5000
    bucketed = corpus.withColumn(
        "bucket", sim.coordinate_sign_bucket(F.col("embedding"), 8)
    )
    natural_over = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .count()
    )
    base = corpus.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    rng = np.random.RandomState(7)
    n_dup = plant // 3
    rows = []
    for i in range(plant):
        v = np.asarray(base, dtype=np.float64)
        if i < n_dup:  # tiny jitter: pairwise cosine stays >= 0.99
            v = v * (1.0 + 0.002 * rng.standard_normal(len(v)))
        else:  # same signs (same orthant), cosine pushed < 0.99
            # 1.5x magnitude spread measured: decoy-decoy max cosine
            # 0.985, decoy-dup max 0.984 — clean margin under the 0.99
            # verify threshold (0.6x leaked decoy pairs at 0.994)
            v = v * (1.0 + 1.5 * rng.rand(len(v)))
        rows.append((5_000_000 + i, [float(x) for x in v]))
    planted = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    ).withColumn("label", F.lit(-1))
    full = corpus.unionByName(planted)

    def lsh_pairs(c, policy):
        cb = c.withColumn(
            "bucket", sim.coordinate_sign_bucket(F.col("embedding"), 8)
        )
        return dd.embedding_near_dup_pairs(
            cb, id_col="vec_id", vec_col="embedding", block_col="bucket",
            min_cosine=0.99, max_block=cap, cap_policy=policy,
        ).select("id_a", "id_b")

    def lsh_pairs_banded(c):
        # the SHIPPED r13 path: two antithetically-sampled bands
        cb = c.withColumn(
            "b1", sim.coordinate_sign_bucket(F.col("embedding"), 8)
        ).withColumn("b2", sim.paired_diff_sign_bucket(F.col("embedding"), 8))
        return dd.embedding_near_dup_pairs_banded(
            cb, id_col="vec_id", vec_col="embedding", band_cols=["b1", "b2"],
            min_cosine=0.99, max_block=cap, cap_policy="sample",
        ).select("id_a", "id_b")

    base_pairs = sorted(map(tuple, lsh_pairs(corpus, "skip").collect()))
    planted_pairs = sorted(map(tuple, lsh_pairs(full, "skip").collect()))
    sample_pairs = sorted(map(tuple, lsh_pairs(full, "sample").collect()))
    banded_pairs = sorted(map(tuple, lsh_pairs_banded(full).collect()))
    banded_base = sorted(map(tuple, lsh_pairs_banded(corpus).collect()))
    # collateral loss: NATURAL vectors sharing the plant's orthant are in
    # the over-cap bucket too — their previously-emitted pairs drop with
    # it; pairs in every OTHER bucket must be untouched
    hot_bucket = (
        planted.withColumn(
            "bucket", sim.coordinate_sign_bucket(F.col("embedding"), 8)
        )
        .select("bucket")
        .first()["bucket"]
    )
    hot_ids = {
        r["vec_id"]
        for r in bucketed.filter(F.col("bucket") == hot_bucket)
        .select("vec_id")
        .collect()
    }
    lost_natural = [p for p in base_pairs if p[0] in hot_ids]
    expected_after = [p for p in base_pairs if p[0] not in hot_ids]

    # exact-verify a member sample of the planted (skipped) bucket
    m = 200
    sample = planted.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(m)
    sampled_true = (
        dd.embedding_near_dup_pairs(
            sample.withColumn("blk", F.lit(1)),
            id_col="vec_id", vec_col="embedding", block_col="blk",
            min_cosine=0.99,
        )
    ).count()
    rate = sampled_true / (m * (m - 1) // 2)
    capacity = plant * (plant - 1) // 2
    est_lost = int(rate * capacity)
    # the SAMPLE policy, measured for real.  ADVICE r12 #3: est_lost
    # estimates PLANTED-only true pairs (the member sample is drawn from
    # `planted`), so the recovered numerator counts planted-endpoint
    # pairs only — natural co-orthant members' pairs (which skip also
    # lost) are reported separately, not folded into the fraction.
    hot_member = hot_ids | {5_000_000 + i for i in range(plant)}
    planted_ids = {5_000_000 + i for i in range(plant)}

    def _split(pairs):
        # EITHER-endpoint membership: band-2 (paired-diff) buckets can
        # legitimately join a hot-orthant member to a vector OUTSIDE the
        # band-1 hot bucket, so p[0]-only classification would undercount
        # the banded path's hot-involving pairs
        hot = [
            p for p in pairs if p[0] in hot_member or p[1] in hot_member
        ]
        planted_only = [
            p for p in hot if p[0] in planted_ids and p[1] in planted_ids
        ]
        rest = [
            p for p in pairs
            if p[0] not in hot_member and p[1] not in hot_member
        ]
        return hot, planted_only, rest

    sample_hot, sample_planted, sample_rest = _split(sample_pairs)
    banded_hot, banded_planted, banded_rest = _split(banded_pairs)
    return {
        "cap": cap,
        "natural_capped_buckets": natural_over,
        "planted_bucket_size": plant,
        "planted_true_members": n_dup,
        "sampled_members": m,
        "sampled_true_rate": round(rate, 4),
        "skip_est_lost_true_pairs": est_lost,
        "natural_pairs_lost_in_hot_bucket_skip": len(lost_natural),
        "other_buckets_unaffected_skip": planted_pairs == expected_after,
        "baseline_true_pairs": len(base_pairs),
        "sample_policy": {
            "kept_hot_members": min(cap, plant + len(hot_ids)),
            "emitted_hot_bucket_pairs": len(sample_hot),
            "emitted_planted_only_pairs": len(sample_planted),
            "recovered_fraction_vs_skip_loss": round(
                len(sample_planted) / est_lost, 3
            )
            if est_lost
            else None,
            "natural_hot_pairs_recovered": len(sample_hot)
            - len(sample_planted),
            "expected_fraction_cap_sq_over_n_sq": round(
                (cap * cap) / ((plant + len(hot_ids)) ** 2), 3
            ),
            "other_buckets_unaffected": sample_rest == expected_after,
        },
        # the SHIPPED r13 two-band path (VERDICT r12 ask #4): antithetic
        # per-band samples bound the straddle loss to 2*((n-cap)/n)^2,
        # and the rotated band's different geometry DISSOLVES the planted
        # orthant outright — per-coordinate-scaled decoys scatter across
        # paired-diff buckets, so the dup cluster lands in an UNDER-CAP
        # band-2 bucket and every true pair is re-emitted (measured
        # r13: emitted_planted_only == C(n_dup, 2) exactly; the vs-est
        # fraction exceeds 1 only because est_lost is a 200-member
        # sample estimate of that same quantity)
        "banded_policy": {
            "bands": 2,
            "emitted_hot_bucket_pairs": len(banded_hot),
            "emitted_planted_only_pairs": len(banded_planted),
            "exact_true_planted_pairs": (plant // 3) * (plant // 3 - 1) // 2,
            "recovered_fraction_vs_exact": round(
                len(banded_planted)
                / ((plant // 3) * (plant // 3 - 1) // 2),
                3,
            ),
            "recovered_fraction_vs_skip_loss": round(
                len(banded_planted) / est_lost, 3
            )
            if est_lost
            else None,
            "natural_hot_pairs_recovered": len(banded_hot)
            - len(banded_planted),
            "expected_fraction_antithetic": round(
                1.0
                - 2.0
                * (((plant + len(hot_ids)) - cap) / (plant + len(hot_ids)))
                ** 2,
                3,
            ),
            # on natural (no over-cap) data the banded output must be a
            # SUPERSET of single-band (band 1's candidates all survive an
            # inactive cap); any extras are true pairs band 1 split
            # across a coordinate-sign boundary — recall, not divergence
            "natural_superset_of_single_band": set(banded_base)
            >= set(base_pairs),
            "extra_true_pairs_from_band2_natural": len(banded_base)
            - len(base_pairs),
            # pairs touching no hot member must be unperturbed by the
            # plant: every one appears in the banded no-plant baseline
            "non_hot_pairs_unaffected": set(banded_rest)
            <= set(banded_base),
        },
    }


def capped_recall_fuzzy(spark, sf_dir: str, plant: int = 1500) -> dict:
    """Quantify fuzzy_name_linkage's block-cap recall trade (VERDICT r11
    ask #2).  No natural sf0.1 block exceeds the ≤1000 guard (reported),
    so the leg plants ONE hot block — ``plant`` names sharing the
    blocking prefix, seeded with known edit-distance-1 pairs — and
    exact-verifies a member sample with the query's own levenshtein ≤ 1
    predicate.  The old SKIP policy lost the whole block: measured rate
    × capacity = that recall bound.  The SHIPPED query (r12) uses the
    SAMPLE policy — it keeps a deterministic md5-ordered ≤1000-member
    subset of the hot block — so the leg runs it for real and reports
    the hot block's emitted pair count as the recovered measure, with
    every under-cap block's row asserted identical."""
    from meerkat_abacus_spark.queries import QUERIES, _t

    cust = _t(spark, sf_dir, "customer")
    natural_over = (
        cust.groupBy(F.substring("c_name", 10, 7).alias("blk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1000)
        .count()
    )
    # planted names: Customer#HOTBLOCK prefix → one shared blk "HOTBLOC";
    # pairs (2g, 2g+1) differ by one trailing char → levenshtein 1
    rows = []
    for i in range(plant):
        g, variant = divmod(i, 2)
        rows.append(
            (9_000_000 + i, f"Customer#HOTBLOCKnm{g:05d}{'x' if variant else 'y'}")
        )
    planted = spark.createDataFrame(rows, schema="c_custkey long, c_name string")
    # pid-suffixed AND try/finally-scoped (ADVICE r12 #2): a crashed run
    # must not leave /tmp/msa_fuzzy_hot_<pid> behind for no later cleanup
    # to reclaim (the pid never recurs under the old-name sweep).
    planted_dir = tempfile.gettempdir() + f"/msa_fuzzy_hot_{os.getpid()}"
    shutil.rmtree(planted_dir, ignore_errors=True)
    os.makedirs(planted_dir)
    try:
        return _capped_recall_fuzzy_body(
            spark, sf_dir, plant, cust, planted, planted_dir, natural_over
        )
    finally:
        shutil.rmtree(planted_dir, ignore_errors=True)


def _capped_recall_fuzzy_body(
    spark, sf_dir, plant, cust, planted, planted_dir, natural_over
) -> dict:
    from meerkat_abacus_spark.queries import QUERIES

    cust.select("c_custkey", "c_name").unionByName(planted).write.parquet(
        planted_dir + "/customer.parquet"
    )

    base_rows = sorted(
        map(tuple, QUERIES["fuzzy_name_linkage"](spark, sf_dir).collect())
    )
    # the SHIPPED query: sample policy — the hot block emits one
    # aggregated row for its kept ≤cap members
    hot_rows = sorted(
        map(tuple, QUERIES["fuzzy_name_linkage"](spark, planted_dir).collect())
    )
    hot_row = [r for r in hot_rows if r[0] == "HOTBLOC"]
    rest_rows = [r for r in hot_rows if r[0] != "HOTBLOC"]
    recovered_pairs = int(hot_row[0][1]) if hot_row else 0
    # exact-verify a sample of the planted block with the same predicate
    m = 400
    sample = planted.orderBy(F.md5(F.col("c_custkey").cast("string"))).limit(m)
    sampled_true = (
        sample.alias("a")
        .join(
            sample.alias("b"),
            F.col("a.c_custkey") < F.col("b.c_custkey"),
        )
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1
        )
        .count()
    )
    rate = sampled_true / (m * (m - 1) // 2)
    capacity = plant * (plant - 1) // 2
    est_lost = int(round(rate * capacity))
    return {
        "cap": 1000,
        "natural_capped_blocks": natural_over,
        "planted_block_size": plant,
        # the x/y variants seed distance-1 pairs, but near-identical
        # serials (nm00001x vs nm00002x) are ALSO within distance 1 —
        # the sampled rate measures the block's REAL pair population
        # under the query's own predicate, which is the point
        "seeded_variant_pairs": plant // 2,
        "sampled_members": m,
        "sampled_true_rate": round(rate, 6),
        "skip_est_lost_true_pairs": est_lost,
        "under_cap_blocks_unaffected": base_rows == sorted(rest_rows),
        "baseline_blocks": len(base_rows),
        "sample_policy": {
            "kept_hot_members": min(1000, plant),
            "emitted_hot_block_pairs": recovered_pairs,
            "recovered_fraction_vs_skip_loss": round(
                recovered_pairs / est_lost, 3
            )
            if est_lost
            else None,
            "expected_fraction_cap_sq_over_n_sq": round(
                (1000 * 1000) / (plant * plant), 3
            ),
        },
    }


def cc_profile_leg(spark, sf_dirs: dict) -> dict:
    """Per-iteration connected-components breakdown (VERDICT r11 ask #4):
    for each labelled corpus, materialize the verified LSH pairs FIRST
    (so candidate generation is excluded from the CC wall — r11's 215 s
    "CC" number conflated the two), then run
    ``connected_components_star`` with its stats hook and publish
    iterations, per-round wall/probe and the contracting edge counts."""
    from meerkat_abacus_spark.datapipe import dedup as dd
    from meerkat_abacus_spark.queries._shared import _doc_corpus3
    from meerkat_abacus_spark.queries.dedup import _verified_candidates

    out = {}
    for label, d in sf_dirs.items():
        corpus = _doc_corpus3(spark, d)
        v = _verified_candidates(spark, d, corpus, "corpus3")
        t0 = time.time()
        n_edges = v.count()  # force the cached candidates frame
        gen_sec = round(time.time() - t0, 2)
        stats: dict = {}
        t0 = time.time()
        comps = dd.connected_components_star(v, stats=stats)
        nodes = comps.count()
        out[label] = {
            "candidates_materialize_sec": gen_sec,
            "cc_wall_sec": round(time.time() - t0, 2),
            "verified_edges": n_edges,
            "component_nodes": nodes,
            **stats,
        }
    # worst-case STRUCTURE demo: a 20k-node path (diameter 20k) must
    # converge in O(log n) alternation rounds, where label propagation
    # would need 20k hops — the property that makes the operator safe on
    # arbitrary 100 TB near-dup graphs, not just diameter-2 LSH output
    path = spark.range(20_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats = {}
    t0 = time.time()
    n = dd.connected_components_star(path, stats=stats).count()
    out["deep_path_20k"] = {
        "cc_wall_sec": round(time.time() - t0, 2),
        "nodes": n,
        "iterations": stats.get("iterations"),
        "edges_by_round": [r["edges"] for r in stats.get("rounds", [])],
    }
    return out


def main() -> None:
    from meerkat_abacus_spark.session import get_spark

    # The rehearsal retains localCheckpoint blocks from every leg's
    # waterfall in one long-lived JVM; with the 100x-docs leg the 8g
    # session default OOMs.  Bigger heap is scoped to this tool — bench
    # and the query surface keep the lean default.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    # Pre-touch the heap at startup (r17): on this sandbox VM a large
    # heap commits lazily at ~165 MB/s of first-touch page faulting, so
    # the FIRST heavy leg of a fresh 32g session used to absorb up to
    # ~260 s of heap-commit inside its timed stages (the r16 "410 s at
    # 10x docs" mystery — attribution in OPTIMIZATION_r17.md).  -Xms=max
    # + AlwaysPreTouch moves that cost to session startup, off every
    # leg's clock.
    mem = os.environ["SPARK_DRIVER_MEMORY"]
    spark = get_spark(app_name="scale_rehearsal", extra_conf={
        "spark.driver.extraJavaOptions":
            f"-Xss64m -Xms{mem} -XX:+AlwaysPreTouch",
    })
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dest = tempfile.gettempdir() + "/msa_scale_sf1"
    shutil.rmtree(dest, ignore_errors=True)
    build_sf1(spark, src, dest)
    build_events_10x(spark, src, dest)

    report = {
        "sf0.1": {**time_queries(spark, src), **bucket_stats(spark, src),
                  **time_pipeline(spark, src)},
        "sf~1.0": {**time_queries(spark, dest), **bucket_stats(spark, dest),
                   **time_pipeline(spark, dest)},
    }
    for name in REHEARSED + ("pipeline_composed",):
        a = report["sf0.1"][name]["sec"]
        b = report["sf~1.0"][name]["sec"]
        report[f"{name}_scale_ratio_10x_data"] = round(b / a, 2) if a else None

    # --- hot-key skew leg: plain vs salted posting-list build ---
    report["skew_inverted_index"] = {
        "sf0.1": skew_leg(spark, src),
        "sf~1.0": skew_leg(spark, dest),
    }
    for name in ("inverted_index", "inverted_index_salted"):
        a = report["skew_inverted_index"]["sf0.1"][name]["sec"]
        b = report["skew_inverted_index"]["sf~1.0"][name]["sec"]
        report[f"{name}_skew_ratio_10x_data"] = round(b / a, 2) if a else None

    # --- hot-basket co-occurrence leg (r10 verdict ask #7) ---
    report["hot_basket_pairs"] = hot_basket_leg(spark, src)

    # --- dedup_clusters candidate-pair waterfall (r7 verdict ask #3) ---
    report["clusters_waterfall"] = {
        "sf0.1": candidate_waterfall(spark, src),
        "sf~1.0": candidate_waterfall(spark, dest),
    }

    # --- dedup_span_removal stage waterfall (r8 verdict ask #2) ---
    report["span_waterfall"] = {
        "sf0.1": span_waterfall(spark, src),
        "sf~1.0": span_waterfall(spark, dest),
    }

    # --- dedup_span_removal second-pass residual (r9 verdict ask #5) ---
    report["span_fixpoint"] = {"sf~1.0": span_fixpoint(spark, dest)}

    # --- 100x surveillance-pipeline leg (r6 verdict ask #7) ---
    dest100 = tempfile.gettempdir() + "/msa_scale_events100"
    shutil.rmtree(dest100, ignore_errors=True)
    build_events_100x(spark, src, dest100)
    report["pipeline_100x"] = {
        "sf0.1": {**time_pipeline(spark, src),
                  "stages": pipeline_stage_rows(spark, src)},
        "sf~10": {**time_pipeline(spark, dest100),
                  "stages": pipeline_stage_rows(spark, dest100)},
    }
    a = report["pipeline_100x"]["sf0.1"]["pipeline_composed"]["sec"]
    b = report["pipeline_100x"]["sf~10"]["pipeline_composed"]["sec"]
    report["pipeline_scale_ratio_100x_data"] = round(b / a, 2) if a else None
    shutil.rmtree(dest100, ignore_errors=True)

    # --- 100x-docs dedup leg (un-gated r12, VERDICT r11 ask #5 — ~5 min;
    # every round publishes it now) --- the question it answers is the
    # 1000x one: the 10x legs show ratios, this shows the SAME bucket-cap
    # discipline holding two decades up, with the waterfall proving
    # candidate growth stays pair-bounded, not quadratic.
    dest100d = tempfile.gettempdir() + "/msa_scale_docs100"
    shutil.rmtree(dest100d, ignore_errors=True)
    build_docs_100x(spark, src, dest100d)
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.queries.dedup import clear_candidate_cache
    from meerkat_abacus_spark.queries.multimodal import clear_embed_cache

    # The earlier corpora's candidate caches are dead weight here and
    # their storage pressure is what pushes Spark's CacheManager into
    # its flaky rebuild path (observed: NPE in tryRebuildCacheEntry /
    # CachedRDDBuilder.copy under GC pressure on the 1.5M-doc leg).
    # Release them before the biggest corpus runs.
    clear_candidate_cache()
    clear_embed_cache()
    spark.catalog.clearCache()

    leg: dict = {}
    for name in ("dedup_minhash_lsh", "dedup_clusters"):
        t0 = time.time()
        n = QUERIES[name](spark, dest100d).count()
        leg[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    leg.update(bucket_stats(spark, dest100d))
    report["dedup_100x"] = {
        "sf~10_docs": leg,
        "clusters_waterfall": candidate_waterfall(spark, dest100d),
    }
    for name in ("dedup_minhash_lsh", "dedup_clusters"):
        a = report["sf0.1"][name]["sec"]
        b = leg[name]["sec"]
        report[f"{name}_scale_ratio_100x_data"] = (
            round(b / a, 2) if a else None
        )

    # --- CC per-iteration profile (VERDICT r11 ask #4): splits the
    # dedup_clusters wall into candidate generation vs the star
    # contraction proper, with per-round wall/probe/edge counts, plus a
    # worst-case 20k-diameter path demo ---
    report["cc_profile"] = cc_profile_leg(
        spark, {"sf0.1": src, "sf~10_docs": dest100d}
    )

    # --- dedup_clusters per-stage wall attribution (VERDICT r15 ask #5):
    # which stage carries the 100x clusters ratio, with per-stage 100x/1x
    # ratios so the superlinear term is named, not guessed ---
    report["clusters_breakdown"] = {
        "sf0.1": clusters_stage_timings(spark, src),
        "sf~10_docs": clusters_stage_timings(spark, dest100d),
    }
    bd = report["clusters_breakdown"]
    report["clusters_stage_ratios_100x"] = {
        name: round(
            bd["sf~10_docs"][name]["sec"] / bd["sf0.1"][name]["sec"], 1
        )
        for name in (
            "hash_rows", "band_keys", "overcap_buckets",
            "unique_pairs", "verified_pairs", "cc_and_group",
        )
        if bd["sf0.1"][name]["sec"]
    }

    # --- over-cap recall quantification (VERDICT r11 ask #2): what the
    # three cap policies actually cost in true pairs ---
    report["capped_recall"] = {
        "minhash_star": capped_recall_minhash(spark, dest100d),
        "embedding_cap": capped_recall_embedding(spark, src),
        "fuzzy_cap": capped_recall_fuzzy(spark, src),
    }
    shutil.rmtree(dest100d, ignore_errors=True)

    from _stamp import artifact_stamp  # noqa: E402

    report["artifact_commit"] = artifact_stamp()
    print(json.dumps(report))
    shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()
