"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() forces the full plan; results
are small aggregates so no collect overhead distorts timing).

Timing policy (r9, VERDICT r8 ask #4): $SPARK_GRAFT_BENCH_RUNS (default 3)
runs per query, reported as a COLD/WARM split — ``cold`` is run 1 (pays
whole-stage-codegen compilation, JIT, and any amortized build the query
serves from: the shared MinHash candidates frame, the persisted LSH/IVF
indexes), ``warm`` is the min of the remaining runs (steady-state
data-volume cost, robust to background load; observed: identical code
swinging 29 -> 61 s suite-total under contention).  Both totals are
reported so amortized caches are visible in the artifact itself instead
of only in the SCALE_* rehearsal files.  ``value`` stays the warm suite
total — comparable to r8's min-of-3 headline number.

Contention sentinel (r10, VERDICT r9 ask #3; hardened r11, ADVICE r10
#4): a fixed-work deterministic BLAS matmul (steady to ±1% after warmup —
NOT a Spark job, whose timing keeps falling for dozens of invocations as
the JIT re-optimizes) is timed BETWEEN every pair of queries (plus suite
pre/post), so each query is BRACKETED by two sentinel samples.  A query's
``cal`` is the mean of its surrounding pair — contention arriving
mid-query now shows up in that query's own normalization instead of being
attributed to the next one — and ``cal_ref`` is the MEDIAN of all
sentinels (one anomalously fast sample no longer deflates every other
query's normalized number).  Each query's ``warm_norm`` rescales warm by
``cal_ref / cal``: CPU-bound work under c× slowdown inflates ~c×, so the
normalized number is the comparable-across-rounds one;
``value_normalized`` is its suite total, while ``value`` stays the raw
warm total for artifact continuity.

Index-lifecycle split (r11, VERDICT r10 ask #3): the persisted LSH index
scratch build rehearses the full maintenance lifecycle (base 80% + delta
append 20% + compaction, gated by _LIFECYCLE_DONE) — ~15 s of ONE-TIME
build cost that made r10's cold suite total incomparable to r9's.  The
build now runs BEFORE the timing loop and is reported as its own
``index_build_sec`` metric; per-query cold measures query serving only.

Two-line artifact format (r12, VERDICT r11 ask #1): the driver records a
FIXED-SIZE TAIL of bench stdout (~2 KB observed), and r11's single
detailed JSON line outgrew it (the 21-sentinel calibration vector pushed
the object's head out of the capture window — ``BENCH_r11.json`` has
``"parsed": null``).  ``main`` therefore prints TWO JSON lines:

1. the full detailed line (per-query cold/warm/cal/warm_norm, sentinel
   vector, index-build metrics) — for humans and BENCH_NOTES;
2. LAST, a compact totals-only line (suite totals, per-query WARM map,
   index build) built by :func:`compact_artifact` and kept well under the
   capture window, so the machine-readable record survives tail capture.

A driver that parses the last JSON-loadable line of the tail gets line 2.
``tests/test_bench_artifact.py`` pipes the exact stdout through a
simulated 2 KB tail window and asserts the parse.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan/agg, dim joins + coding,
# epi-week, link collection, window dedup, alert aggs, MinHash LSH, ANN,
# text stats, fingerprinting, multimodal decode.
HEADLINE = [
    "pricing_summary",
    "flagship_cases_region_epiweek",
    "qc_filters",
    "epiweek_counts",
    "coding_variables",
    "links_ordered",
    "initial_visit_dedup",
    "alert_threshold",
    "alert_double_double",
    "location_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    "ann_brute_topk",
    "ann_lsh_topk",
    "text_stats",
    "multimodal_decode",
    "dedup_clusters",
    "pipeline_composed",
]


_CAL_MAT = None


def _calibrate(spark=None, best_of: int = 2) -> float:
    """Fixed-work CPU sentinel: a deterministic BLAS matmul, best of
    ``best_of`` runs (a single run can eat a scheduling hiccup that has
    nothing to do with host load).

    Deliberately NOT a Spark job (r10, VERDICT r9 ask #3): a JVM
    sentinel's timing keeps falling for dozens of invocations as the C2
    JIT re-optimizes (measured: 0.22 → 0.08 across one bench run), so an
    interleaved JVM sentinel conflates compiler state with host load and
    mis-normalizes every early query.  The matmul reaches steady state
    after two calls and then holds to ±1% on idle hardware — what it
    measures is exactly the thing the normalization needs: how much CPU
    the host is actually giving this process right now."""
    import numpy as np

    global _CAL_MAT
    if _CAL_MAT is None:
        _CAL_MAT = np.random.RandomState(0).rand(1200, 1200)
        for _ in range(3):  # BLAS thread pool + cache warmup
            _CAL_MAT @ _CAL_MAT
    best = None
    for _ in range(best_of):
        t0 = time.time()
        for _ in range(3):
            _CAL_MAT @ _CAL_MAT
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


# Generous margin under the ~2215-char tail observed in BENCH_r11.json:
# the compact line must survive the driver's capture window whole.
_COMPACT_BUDGET = 1900

# Max/min sentinel ratio above which the run is declared contended.
# Calibrated from the BENCH_AB_r13 adjudication: quiet-host runs sit at
# ~1.0-1.5; the r12 "drift" round's load would have shown >3.
CONTENTION_SPREAD_LIMIT = 2.0


def contention_banner(sentinels: list) -> str | None:
    """The explicit flag VERDICT r13 ask #8 requires: when the sentinel
    spread says the run was contended, the artifact must SAY SO in words
    so the next drift round cannot be argued from a flagged line.
    Returns the banner string for spread > CONTENTION_SPREAD_LIMIT, else
    None (quiet run, or not enough sentinels to judge)."""
    vals = [s for s in sentinels if s is not None and s > 0]
    if len(vals) < 2:
        return None
    spread = max(vals) / min(vals)
    if spread <= CONTENTION_SPREAD_LIMIT:
        return None
    return (
        f"CONTENDED — cal_spread {spread:.2f} > {CONTENTION_SPREAD_LIMIT}: "
        "round-over-round comparison invalid, run the alternating "
        "fresh-process A/B (tools/ab_minhash100x.py pattern) before "
        "claiming or conceding drift"
    )


def compact_artifact(detailed: dict) -> dict:
    """The totals-only artifact line (VERDICT r11 ask #1): everything the
    round-over-round trend needs — suite totals, per-query WARM seconds,
    index-build split — and nothing that grows with instrumentation (the
    sentinel vector and per-query cold/cal/warm_norm stay in the detailed
    line only).  Size-guarded so adding a 21st headline query fails a
    test instead of silently outgrowing the driver's tail window again."""
    out = {
        "metric": detailed["metric"],
        "value": detailed["value"],
        "value_cold": detailed["value_cold"],
        "value_normalized": detailed["value_normalized"],
        "unit": detailed["unit"],
        "queries": {
            name: t["warm"] for name, t in detailed["queries"].items()
        },
        "index_build_sec": detailed["index_build_sec"],
        "sf": detailed["sf"],
        "runs_per_query": detailed["runs_per_query"],
        # the round's median sentinel: r_a/r_b cal_ref ratio is the
        # host-speed correction when trending value across rounds (the
        # within-round normalization can't see a uniformly slower host)
        "cal_ref": detailed["calibration"]["ref"],
        # max/min sentinel ratio: >~2 means the run was contended and
        # round-over-round drift conclusions need an A/B, not this line
        "cal_spread": detailed["calibration"].get("spread"),
    }
    line = json.dumps(out)
    if len(line) > _COMPACT_BUDGET:
        raise ValueError(
            f"compact bench line is {len(line)} chars > budget "
            f"{_COMPACT_BUDGET}; trim the headline set or the compact "
            "schema before it outgrows the driver's tail capture"
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers so timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # One-time scratch-index lifecycle builds, OUTSIDE the timing loop
    # (VERDICT r10 ask #3): reported as their own metric so cold totals
    # stay round-comparable while the lifecycle cost stays visible.
    index_build: dict[str, float] = {}
    if any(q.startswith("ann_lsh") for q in HEADLINE):
        from meerkat_abacus_spark.queries.ann import _lsh_index_path

        t0 = time.time()
        # force_rebuild: measure the real base+append+compact lifecycle
        # every round, even when a prior run's scratch index survives
        _lsh_index_path(spark, sf_dir, force_rebuild=True)
        index_build["lsh_index_lifecycle"] = round(time.time() - t0, 3)

    cal_pre = _calibrate(spark)

    timings: dict[str, dict[str, float]] = {}
    # Bracketing sentinels (ADVICE r10 #4): sentinel i sits AFTER query i
    # and BEFORE query i+1; each query normalizes by the mean of its
    # surrounding pair, so mid-query contention is attributed to the
    # query it actually hit.
    sentinels = [cal_pre]
    for name in HEADLINE:
        fn = QUERIES[name]
        cold = None
        warm = None
        for i in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            if i == 0:
                cold = dt
            else:
                warm = dt if warm is None else min(warm, dt)
        if warm is None:  # runs == 1
            warm = cold
        sentinels.append(_calibrate(spark))
        timings[name] = {
            "cold": round(cold, 3),
            "warm": round(warm, 3),
            "cal": round((sentinels[-2] + sentinels[-1]) / 2, 4),
        }

    cal_post = sentinels[-1]
    cal_ref = sorted(sentinels)[len(sentinels) // 2]  # robust: median
    for t in timings.values():
        t["warm_norm"] = round(t["warm"] * cal_ref / t["cal"], 3)
    total_warm = round(sum(t["warm"] for t in timings.values()), 3)
    total_cold = round(sum(t["cold"] for t in timings.values()), 3)
    total_norm = round(sum(t["warm_norm"] for t in timings.values()), 3)
    detailed = {
        "metric": "headline_suite_total",
        "value": total_warm,
        "value_cold": total_cold,
        "value_normalized": total_norm,
        "unit": "sec",
        "queries": timings,
        "index_build_sec": index_build,
        "sf": float(sf),
        "runs_per_query": runs,
        "calibration": {
            "pre": cal_pre,
            "post": cal_post,
            "ref": cal_ref,
            # contention index (r13, after the BENCH_AB_r13 adjudication
            # showed a single median can't flag mid-suite load): the
            # max/min sentinel ratio across the run.  ~1.0-1.5 on a quiet
            # host; the r12 "drift" round would have shown >3 here and
            # self-flagged as noise instead of costing an A/B to settle.
            "spread": round(max(sentinels) / min(sentinels), 2)
            if min(sentinels) > 0
            else None,
            "sentinels": sentinels,
        },
    }
    # Contention banner FIRST (VERDICT r13 ask #8): a contended run must
    # self-flag in words, not just in an index a reader has to know to
    # check.  Printed before the JSON lines so the compact line stays the
    # last JSON-loadable line in the driver's tail window.
    banner = contention_banner(sentinels)
    if banner:
        print(banner)
    # Detailed line first (humans, BENCH_NOTES); compact totals line LAST
    # so it lands whole inside the driver's fixed-size stdout tail
    # (VERDICT r11 ask #1 — r11's single big line had its head cut off).
    print(json.dumps(detailed))
    print(json.dumps(compact_artifact(detailed)))
    sys.stdout.flush()

    # Clean teardown (VERDICT r8 "what's wrong" #2): unpersist the shared
    # candidates cache and stop the session so no executor-side storage
    # outlives the context — the r8 artifact tail's "Failed to update
    # accumulator" ERROR spam came from exactly that.
    from meerkat_abacus_spark.queries.dedup import clear_candidate_cache
    from meerkat_abacus_spark.queries.multimodal import clear_embed_cache

    clear_candidate_cache()
    clear_embed_cache()
    spark.stop()


if __name__ == "__main__":
    main()
