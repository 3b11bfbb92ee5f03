"""Per-query A/B harness for headline-suite drift (VERDICT r13 asks #1, #6).

BENCH_AB_r13 adjudicated most round-over-round drift to host noise, but
two queries deserve standing error bars:

- ``pipeline_composed`` — the ONE query whose per-tree ranges were
  disjoint and monotone across all six r13 A/B runs (r11 0.356-0.459 →
  r12 0.617-0.632 → r13 0.663-0.721, min-of-reps 1.86× over two rounds);
- ``flagship_cases_region_epiweek`` — posted the two highest values of
  all six runs and +39% on the r13 driver artifact.

This harness extends the ``tools/ab_minhash100x.py`` pattern with what a
~1 s query affords: MANY reps per tree, and a BUILD/EXECUTE split per
measurement — ``build_s`` is the time for the registered callable to
return its DataFrame (driver-side: python composition + Catalyst
analysis of the plan), ``exec_s`` is ``.count()`` (optimization +
execution).  A drift that lives in ``build_s`` is added plan complexity
(more expressions in the coding/fan-out machinery); one in ``exec_s`` is
added stages/shuffles or slower operators.  Each process runs every
query ``--inner`` times after a discarded warmup and reports per-run
values, bracketed by BLAS sentinels.

MIN-OF-REPS UNDER CONTENDED SENTINELS (VERDICT r14 ask #7): legs of this
harness may themselves run while the host is loaded — BENCH_AB_r14's
isolated legs ran at sentinel_spread 10.2-15.9 — and the harness STILL
adjudicates via min-of-reps.  That is deliberate, and it does not
contradict bench.py's "cal_spread > 2 ⇒ comparison invalid" banner: the
banner guards SINGLE-sample suite totals, where one contended window
corrupts the only number you have; here each tree gets N alternating
fresh processes, and under intermittent load the MINIMUM converges to
the quiet-host value as long as at least one rep per tree lands in a
quiet window (the mean/median do not — they absorb the load).  The
alternation matters: trees interleave in time, so a sustained load
window inflates all trees' minima together instead of biasing one side.
Per-leg sentinel spread is printed with the summary so a leg where NO
rep ran quiet (min itself suspect) is visible; treat a leg whose spread
is high AND whose min tracks its median as still-contended and re-run.

Usage:
    python tools/ab_headline.py --ab <treeA> <treeB> [treeC ...] \
        --reps 5 [--queries pipeline_composed,flagship_cases_region_epiweek]
    python tools/ab_headline.py --run <tree>   # one fresh-process sample
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DEFAULT_QUERIES = ("pipeline_composed", "flagship_cases_region_epiweek")
INNER = int(os.environ.get("AB_HEADLINE_INNER", "3"))


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


def run(tree: str, queries: tuple[str, ...], precede: tuple[str, ...]) -> None:
    sys.path.insert(0, tree)
    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.session import get_spark

    spark = get_spark(app_name="ab_headline")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # shared warmup: parquet footers + JIT of the scan path
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out: dict = {"tree": tree, "sent_pre": _sentinel(), "queries": {}}
    # --precede: replicate the bench SUITE CONTEXT — run these queries
    # untimed first, so the timed queries inherit whatever JVM/code-cache/
    # executor-storage state the suite predecessors leave behind.  This is
    # the leg that separates "the query got slower" from "the query's
    # neighborhood got slower" (VERDICT r13 ask #1).
    t0 = time.time()
    for name in precede:
        QUERIES[name](spark, sf_dir).count()
    if precede:
        out["precede_sec"] = round(time.time() - t0, 2)
        out["precede_n"] = len(precede)
        out["sent_after_precede"] = _sentinel()
    for name in queries:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # discarded warmup (codegen/JIT)
        runs = []
        for _ in range(INNER):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            runs.append(
                {"build_s": round(t1 - t0, 4), "exec_s": round(t2 - t1, 4),
                 "total_s": round(t2 - t0, 4)}
            )
        out["queries"][name] = runs
        out.setdefault("sent_after", {})[name] = _sentinel()
    print("ABRESULT " + json.dumps(out))


def ab(
    trees: list[str],
    reps: int,
    queries: tuple[str, ...],
    precede: tuple[str, ...] = (),
) -> None:
    import statistics

    results = []
    for i in range(reps):
        for tree in trees:
            cmd = [sys.executable, os.path.abspath(__file__), "--run", tree,
                   "--queries", ",".join(queries)]
            if precede:
                cmd += ["--precede", ",".join(precede)]
            p = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800,
            )
            lines = [
                ln for ln in p.stdout.splitlines()
                if ln.startswith("ABRESULT ")
            ]
            if not lines:
                print(
                    f"rep {i} tree {tree}: FAILED\n"
                    f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
                )
                continue
            r = json.loads(lines[-1][len("ABRESULT "):])
            r["rep"] = i
            results.append(r)
            print(json.dumps(r))
    summary: dict = {}
    for tree in trees:
        rows = [r for r in results if r["tree"] == tree]
        t: dict = {"completed_reps": len(rows), "failed_reps": reps - len(rows)}
        for q in queries:
            per_run = [run for r in rows for run in r["queries"][q]]
            for k in ("build_s", "exec_s", "total_s"):
                vals = sorted(run[k] for run in per_run)
                t.setdefault(q, {})[k] = {
                    "min": vals[0] if vals else None,
                    "median": (
                        round(statistics.median(vals), 4) if vals else None
                    ),
                    "max": vals[-1] if vals else None,
                }
        sents = sorted(
            s
            for r in rows
            for s in [r["sent_pre"], *r.get("sent_after", {}).values()]
        )
        t["sentinel_median"] = sents[len(sents) // 2] if sents else None
        t["sentinel_spread"] = (
            round(sents[-1] / sents[0], 2) if sents and sents[0] > 0 else None
        )
        summary[tree] = t
    print("ABSUMMARY " + json.dumps(summary))
    # Per-leg spread + protocol note (VERDICT r14 ask #7): min-of-reps
    # stays valid under intermittent load (alternating fresh processes;
    # the min converges to the quiet-host value) — see module docstring.
    for tree, t in summary.items():
        print(
            f"LEG {tree}: sentinel_spread {t['sentinel_spread']} "
            f"median {t['sentinel_median']} — adjudicate on min-of-reps; "
            "a high spread flags contention, it does not invalidate the "
            "min (module docstring: MIN-OF-REPS UNDER CONTENDED SENTINELS)"
        )


def _parse_queries(argv: list[str]) -> tuple[str, ...]:
    if "--queries" in argv:
        i = argv.index("--queries")
        return tuple(argv[i + 1].split(","))
    return DEFAULT_QUERIES


def _parse_precede(argv: list[str]) -> tuple[str, ...]:
    if "--precede" in argv:
        i = argv.index("--precede")
        return tuple(q for q in argv[i + 1].split(",") if q)
    return ()


_USAGE = (
    "usage: --run <tree> | --ab <trees...> --reps N "
    "[--queries a,b] [--precede a,b]"
)


if __name__ == "__main__":
    argv = sys.argv[1:]
    # Guard before indexing (ADVICE r14 #3): no args, or --run with no
    # tree operand, must print usage rather than IndexError.
    if not argv or argv[0] not in ("--run", "--ab") or (
        argv[0] == "--run" and len(argv) < 2
    ):
        raise SystemExit(_USAGE)
    qs = _parse_queries(argv)
    pre = _parse_precede(argv)
    if argv[0] == "--run":
        run(argv[1], qs, pre)
    elif argv[0] == "--ab":
        trees = []
        i = 1
        while i < len(argv) and not argv[i].startswith("--"):
            trees.append(argv[i])
            i += 1
        reps = 5
        if "--reps" in argv:
            reps = int(argv[argv.index("--reps") + 1])
        if not trees:
            raise SystemExit(_USAGE)
        ab(trees, reps, qs, pre)
