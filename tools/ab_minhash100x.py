"""A/B harness for the 100x-docs dedup leg (VERDICT r12 ask #1).

SCALE_r12's ``dedup_minhash_lsh`` 100x-docs wall nearly doubled vs r11
(100.2 -> 189.6 s) with byte-identical waterfall counts, while
``dedup_clusters`` got faster (215.3 -> 158.8 s) — total drift only ~10%.
This harness adjudicates whether the TREE changed speed or the rehearsal
process's history/ordering did:

- builds the 1.5M-doc corpus ONCE (tree-independent: both trees' \
  build_docs_100x are byte-identical projections of sf0.1), kept on disk;
- each measurement is a FRESH interpreter/JVM (``--run <tree>``) that
  times the BLAS sentinel, then dedup_minhash_lsh.count(), sentinel,
  dedup_clusters.count(), sentinel — the same two queries the rehearsal
  leg times, stripped of every other leg;
- ``--ab <treeA> <treeB> <reps>`` alternates trees A/B/A/B... so host
  drift averages out of the comparison.

Usage:
    python tools/ab_minhash100x.py --build
    python tools/ab_minhash100x.py --ab /tmp/r11tree /root/repo 3
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

# Corpus under test: defaults to the 100x-docs amplification; the r17
# band-key adjudication points AB_CORPUS at the 1x (sf0.1) and 10x
# corpora so the same alternating fresh-process protocol covers all
# three scales (VERDICT r16 ask #2).
CORPUS = os.environ.get(
    "AB_CORPUS", tempfile.gettempdir() + "/msa_ab_docs100"
)


def _sentinel() -> float:
    import numpy as np

    m = np.random.RandomState(0).rand(1200, 1200)
    for _ in range(3):
        m @ m
    best = None
    for _ in range(2):
        t0 = time.time()
        for _ in range(3):
            m @ m
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def build() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from meerkat_abacus_spark.session import get_spark
    from tools.scale_rehearsal import build_docs_100x

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark(app_name="ab_build")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    shutil.rmtree(CORPUS, ignore_errors=True)
    build_docs_100x(spark, src, CORPUS)
    print(json.dumps({"built": CORPUS}))


def run(tree: str) -> None:
    sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.session import get_spark

    # AB_PRETOUCH=1 (r17): commit the whole heap at session startup
    # (-Xms=max, AlwaysPreTouch) so first-touch page faulting cannot land
    # in the first timed stage.  Measured on this sandbox VM: a fresh
    # 32g-heap session's FIRST heavy query pays up to ~260 s of lazy
    # heap-commit (~165 MB/s first-touch) distributed into its stages —
    # 282.9 s cold vs 24.6 s with pre-touch vs 23.8 s at 8g, identical
    # query/data (OPTIMIZATION_r17.md, band-key adjudication).  The
    # startup cost is reported separately and stays off the query clock.
    extra = {}
    t_sess = time.time()
    if os.environ.get("AB_PRETOUCH") == "1":
        mem = os.environ.get("SPARK_DRIVER_MEMORY", "32g")
        extra["spark.driver.extraJavaOptions"] = (
            f"-Xss64m -Xms{mem} -XX:+AlwaysPreTouch"
        )
    spark = get_spark(app_name="ab_run", extra_conf=extra)
    sess_s = round(time.time() - t_sess, 2)
    # AB_RUNS>1 (r17): re-run each query with the shared candidates
    # cache cleared between runs (every run recomputes from parquet) —
    # run 1 pays codegen/JIT, the min of later runs is the steady-state
    # representation cost the adjudication needs.
    runs = max(1, int(os.environ.get("AB_RUNS", "1")))
    out: dict = {"tree": tree, "session_startup_s": sess_s,
                 "sent_pre": _sentinel()}
    for name in ("dedup_minhash_lsh", "dedup_clusters"):
        walls = []
        for i in range(runs):
            try:
                from meerkat_abacus_spark.queries.dedup import (
                    clear_candidate_cache,
                )
                clear_candidate_cache()
            except Exception:
                pass
            t0 = time.time()
            n = QUERIES[name](spark, CORPUS).count()
            walls.append(round(time.time() - t0, 2))
        out[name] = {"sec": min(walls), "runs": walls, "rows": n}
        out[f"sent_after_{name}"] = _sentinel()
    print("ABRESULT " + json.dumps(out))


def ab(tree_a: str, tree_b: str, reps: int) -> None:
    results = []
    for i in range(reps):
        for tree in (tree_a, tree_b):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", tree],
                capture_output=True, text=True, timeout=1800,
            )
            line = [
                ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")
            ]
            if not line:
                print(f"rep {i} tree {tree}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                continue
            r = json.loads(line[-1][len("ABRESULT "):])
            r["rep"] = i
            results.append(r)
            print(json.dumps(r))
    import statistics

    summary: dict = {}
    for tree in (tree_a, tree_b):
        rows = [r for r in results if r["tree"] == tree]
        summary.setdefault(tree, {})["completed_reps"] = len(rows)
        summary[tree]["failed_reps"] = reps - len(rows)
        for q in ("dedup_minhash_lsh", "dedup_clusters"):
            vals = sorted(r[q]["sec"] for r in rows)
            summary[tree][q] = {
                "runs": vals,
                "min": vals[0] if vals else None,
                "median": round(statistics.median(vals), 2) if vals else None,
            }
        sents = sorted(
            s for r in rows
            for s in (r["sent_pre"], r["sent_after_dedup_minhash_lsh"],
                      r["sent_after_dedup_clusters"])
        )
        summary[tree]["sentinel_median"] = sents[len(sents) // 2] if sents else None
    print("ABSUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    if sys.argv[1] == "--build":
        build()
    elif sys.argv[1] == "--run":
        run(sys.argv[2])
    elif sys.argv[1] == "--ab":
        ab(sys.argv[2], sys.argv[3], int(sys.argv[4]))
