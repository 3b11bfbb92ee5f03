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

CORPUS = tempfile.gettempdir() + "/msa_ab_docs100"


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

    spark = get_spark(app_name="ab_run")
    out: dict = {"tree": tree, "sent_pre": _sentinel()}
    for name in ("dedup_minhash_lsh", "dedup_clusters"):
        t0 = time.time()
        n = QUERIES[name](spark, CORPUS).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
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
