"""Round-17 job-level profiles for the two slowest headline queries
(VERDICT r16 asks #3/#4): ann_lsh_topk's serving path and
dedup_clusters' star-CC iteration machinery.

Each phase is timed with the query warm (2 prior full runs) and the
Spark status tracker's job ids recorded per phase, so the output
attributes wall to JOBS (driver latency vs executor work), not just to
code lines.  Pure measurement — no engine change.

Run: python tools/profile_r17.py [ann|cc|bench20]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from meerkat_abacus_spark.session import get_spark

    return get_spark(app_name="profile_r17")


def _jobs(spark) -> int:
    t = spark.sparkContext.statusTracker()
    return len(t.getJobIdsForGroup(None))


def profile_ann() -> None:
    spark = _spark()
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.queries.ann import _lsh_index_path, _NBITS
    from meerkat_abacus_spark.datapipe import similarity as sim
    from pyspark.sql import functions as F

    # warm twice: codegen, reader memos, scratch index build
    for _ in range(2):
        QUERIES["ann_lsh_topk"](spark, SF_DIR).count()

    out: dict = {}

    def phase(name, fn):
        j0 = _jobs(spark)
        t0 = time.time()
        r = fn()
        out[name] = {"sec": round(time.time() - t0, 4), "jobs": _jobs(spark) - j0}
        return r

    path = phase("index_path_check", lambda: _lsh_index_path(spark, SF_DIR))
    idx_byid = phase("index_frames", lambda: sim._lsh_index_frames(spark, path))
    idx, byid = idx_byid
    qids = list(range(20))
    qrows = phase(
        "byid_collect",
        lambda: byid.filter(F.col("neighbor_id").isin(qids))
        .dropDuplicates(["neighbor_id"])
        .select(
            F.col("neighbor_id").alias("query_id"),
            "cv",
            F.col("pbucket").cast("string").alias("home"),
        )
        .collect(),
    )
    out["n_qrows"] = len(qrows)

    def build_probe():
        probed_rows = [
            (r["query_id"], list(r["cv"]), "b" + key)
            for r in qrows
            for key in sim._hamming_ball(r["home"][1:], 0)
        ]
        probe_keys = sorted({p for _, _, p in probed_rows})
        probed = spark.createDataFrame(
            probed_rows,
            schema="query_id long, qv array<double>, pbucket string",
        )
        return probed, probe_keys

    probed, probe_keys = phase("createDataFrame", build_probe)
    out["n_probe_keys"] = len(probe_keys)

    def score():
        from meerkat_abacus_spark.datapipe.similarity import (
            _stored_or_computed_cn,
            dot_product,
            l2_norm,
        )
        from pyspark.sql import Window

        lists = _stored_or_computed_cn(
            idx.filter(F.col("pbucket").isin(probe_keys))
        )
        p = probed.withColumn("__qn", l2_norm(F.col("qv")))
        s = dot_product(F.col("qv"), F.col("cv")) / (
            F.col("__qn") * F.col("__cn")
        )
        scored = (
            F.broadcast(p)
            .join(lists, "pbucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", s.alias("cosine"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
        )

    plan = phase("plan_build", score)
    phase("exec_count", lambda: plan.count())
    # whole-query references, same warm session
    phase("full_query_run", lambda: QUERIES["ann_lsh_topk"](spark, SF_DIR).count())
    phase("full_query_run2", lambda: QUERIES["ann_lsh_topk"](spark, SF_DIR).count())
    # how many files does the byid sidecar hold?
    byid_dir = path + "_byid"
    out["byid_parquet_files"] = sum(
        1 for f in os.listdir(byid_dir) if f.endswith(".parquet")
    )
    out["bucket_dirs"] = sum(
        1 for d in os.listdir(path) if d.startswith("pbucket=")
    )
    print("PROFILE_ANN " + json.dumps(out))
    spark.stop()


def profile_cc() -> None:
    spark = _spark()
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.queries._shared import _doc_corpus3
    from meerkat_abacus_spark.queries.dedup import _verified_candidates
    from meerkat_abacus_spark.datapipe import dedup as dd
    from pyspark.sql import functions as F

    for _ in range(2):
        QUERIES["dedup_clusters"](spark, SF_DIR).count()

    out: dict = {}

    def phase(name, fn):
        j0 = _jobs(spark)
        t0 = time.time()
        r = fn()
        out[name] = {"sec": round(time.time() - t0, 4), "jobs": _jobs(spark) - j0}
        return r

    corpus = phase("corpus_build", lambda: _doc_corpus3(spark, SF_DIR))
    pairs = phase(
        "verified_candidates_cached",
        lambda: _verified_candidates(spark, SF_DIR, corpus, "corpus3"),
    )
    stats: dict = {}
    comps = phase(
        "cc_star_eager",
        lambda: dd.connected_components_star(pairs, stats=None),
    )
    agg = phase(
        "final_group_plan",
        lambda: comps.groupBy("component").agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum(
                F.when(F.col("node") == F.col("component"), 1).otherwise(0)
            ).alias("n_kept"),
        ),
    )
    phase("final_count", lambda: agg.count())
    phase("full_query_run", lambda: QUERIES["dedup_clusters"](spark, SF_DIR).count())
    phase("full_query_run2", lambda: QUERIES["dedup_clusters"](spark, SF_DIR).count())
    print("PROFILE_CC " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ann"
    if which == "ann":
        profile_ann()
    elif which == "cc":
        profile_cc()
