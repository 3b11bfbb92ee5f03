"""Data-bound bench leg (VERDICT r16 ask #7): a measurement that moves
when EXECUTORS do work, unlike the sf0.1 headline suite (8 cores beat 32
there — it now times driver latency).

Times dedup_minhash_lsh + dedup_clusters on the 10x-docs corpus (the
SCALE rehearsal's build_sf1 construction) in FRESH processes at 32 and 8
cores, alternating, min-of-reps, BLAS-sentinel-bracketed.  A healthy
data-bound leg shows 32c distinctly faster than 8c; the ratio is the
"second, core-scaling-positive column" for BENCH_NOTES.  bench.py and
its driver contract are untouched.

Usage:
    python tools/databound_leg.py --build          # stage the corpus
    python tools/databound_leg.py --ab [reps=2]    # alternating runs
    python tools/databound_leg.py --run <cpus>     # one fresh sample
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = tempfile.gettempdir() + "/msa_databound_10x"
QUERIES_TIMED = ("dedup_minhash_lsh", "dedup_clusters")


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
    import shutil

    from meerkat_abacus_spark.session import get_spark
    from tools.scale_rehearsal import build_sf1

    spark = get_spark(app_name="databound_build")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(CORPUS, ignore_errors=True)
    build_sf1(spark, src, CORPUS)
    print(json.dumps({"built": CORPUS}))
    spark.stop()


def run(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.session import get_spark

    # Pre-touch the heap at startup (r17): keeps lazy heap-commit page
    # faulting (~165 MB/s on this VM) out of the timed queries — see
    # tools/scale_rehearsal.py and OPTIMIZATION_r17.md.
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    t_sess = time.time()
    spark = get_spark(app_name=f"databound_c{cpus}", extra_conf={
        "spark.driver.extraJavaOptions":
            f"-Xss64m -Xms{mem} -XX:+AlwaysPreTouch",
    })
    out: dict = {"cpus": cpus, "sent_pre": _sentinel(), "queries": {},
                 "session_startup_s": round(time.time() - t_sess, 2)}
    for name in QUERIES_TIMED:
        t0 = time.time()
        n = QUERIES[name](spark, CORPUS).count()
        out["queries"][name] = {"sec": round(time.time() - t0, 2), "rows": n}
        out.setdefault("sent_after", {})[name] = _sentinel()
    print("DBRESULT " + json.dumps(out))
    spark.stop()


def ab(reps: int) -> None:
    results = []
    for i in range(reps):
        for cpus in (32, 8):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", str(cpus)],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [
                ln for ln in p.stdout.splitlines() if ln.startswith("DBRESULT ")
            ]
            if not lines:
                print(f"rep {i} cpus {cpus}: FAILED\n{p.stdout[-1500:]}\n"
                      f"{p.stderr[-1500:]}")
                continue
            r = json.loads(lines[-1][len("DBRESULT "):])
            r["rep"] = i
            results.append(r)
            print(json.dumps(r))
    summary: dict = {"corpus": CORPUS, "reps": reps}
    for cpus in (32, 8):
        rows = [r for r in results if r["cpus"] == cpus]
        t: dict = {"completed": len(rows)}
        for q in QUERIES_TIMED:
            vals = sorted(r["queries"][q]["sec"] for r in rows)
            t[q] = {"runs": vals, "min": vals[0] if vals else None}
        sents = sorted(
            s for r in rows
            for s in [r["sent_pre"], *r.get("sent_after", {}).values()]
        )
        t["sentinel_median"] = sents[len(sents) // 2] if sents else None
        t["sentinel_spread"] = (
            round(sents[-1] / sents[0], 2) if sents and sents[0] > 0 else None
        )
        summary[f"c{cpus}"] = t
    for q in QUERIES_TIMED:
        lo = summary["c8"][q]["min"]
        hi = summary["c32"][q]["min"]
        summary[f"{q}_c8_over_c32"] = round(lo / hi, 2) if lo and hi else None
    print("DBSUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    if sys.argv[1] == "--build":
        build()
    elif sys.argv[1] == "--run":
        run(int(sys.argv[2]))
    elif sys.argv[1] == "--ab":
        ab(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
