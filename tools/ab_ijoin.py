"""A/B harness for the streaming per-file interval-join leg (VERDICT r14
ask #5).

STREAM_SCALE_r14's ``ijoin_1x`` (per-file micro-batching — the certified
query's replay mode) drew 127.3 s vs r13's 19.3 s, with one 84 s
micro-batch and a 1670 s state-commit wall: the same host-window
signature the dedup legs adjudicated to noise via alternating A/Bs, but
this leg never got one.  Each measurement here is a FRESH
interpreter/JVM running exactly the rehearsal's ``run_ijoin_once``
(1x users, hdfs provider, per-file batches) bracketed by BLAS
sentinels; ``--ab`` alternates trees so host drift averages out of the
comparison.  Adjudicate on min-of-reps and the per-batch
``commitTimeMs`` split — if the per-file state-maintenance cost is real
and tree-resident, the slow tree's minimum stays slow at matched
sentinels AND its commit-ms grows; a host window inflates both trees'
spreads together (see tools/ab_headline.py: MIN-OF-REPS UNDER CONTENDED
SENTINELS).

Usage:
    python tools/ab_ijoin.py --ab /tmp/r13tree /tmp/r14tree 3
    python tools/ab_ijoin.py --run <tree>   # one fresh-process sample
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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


def run(tree: str) -> None:
    sys.path.insert(0, tree)
    from meerkat_abacus_spark.session import get_spark
    from tools.stream_scale_rehearsal import run_ijoin_once

    spark = get_spark(app_name="ab_ijoin")
    out: dict = {"tree": tree, "sent_pre": _sentinel()}
    # warmup leg exactly like the rehearsal (codegen/JIT), then measure
    run_ijoin_once(spark, "warm", 1, SRC)
    got = run_ijoin_once(spark, "one", 1, SRC)
    out["ijoin_1x"] = got
    out["sent_post"] = _sentinel()
    print("ABRESULT " + json.dumps(out))


def ab(tree_a: str, tree_b: str, reps: int) -> None:
    results = []
    for i in range(reps):
        for tree in (tree_a, tree_b):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", tree],
                capture_output=True, text=True, timeout=3600,
            )
            line = [
                ln for ln in p.stdout.splitlines()
                if ln.startswith("ABRESULT ")
            ]
            if line:
                results.append(json.loads(line[0][len("ABRESULT "):]))
                print(line[0])
            else:
                print(f"REP {i} {tree} FAILED rc={p.returncode}: "
                      f"{p.stderr.strip()[-300:]}")
    summary: dict = {}
    for tree in (tree_a, tree_b):
        rows = [r for r in results if r["tree"] == tree]
        secs = sorted(r["ijoin_1x"]["sec"] for r in rows)
        commits = [
            sum(b["commit"] or 0 for b in r["ijoin_1x"]["per_batch_state_ms"])
            for r in rows
        ]
        sents = sorted(
            s for r in rows for s in (r["sent_pre"], r["sent_post"])
        )
        summary[tree] = {
            "completed_reps": len(rows),
            "failed_reps": reps - len(rows),
            "min_sec": secs[0] if secs else None,
            "all_sec": secs,
            "commit_ms_totals": sorted(commits),
            "rows": rows[0]["ijoin_1x"]["joined_rows"] if rows else None,
            "sentinel_median": sents[len(sents) // 2] if sents else None,
            "sentinel_spread": (
                round(sents[-1] / sents[0], 2)
                if sents and sents[0] > 0 else None
            ),
        }
    print("ABSUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if len(argv) >= 2 and argv[0] == "--run":
        run(argv[1])
    elif len(argv) >= 4 and argv[0] == "--ab":
        ab(argv[1], argv[2], int(argv[3]))
    else:
        raise SystemExit(
            "usage: --run <tree> | --ab <treeA> <treeB> <reps>"
        )
