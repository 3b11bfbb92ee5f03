"""One-shot evidence harness (r4 verdict #8): full-registry oracle compare
+ pytest + every scale rehearsal, collapsed into one JSON artifact.

Runs, in order:

1. ``tools/compare.py`` over the ENTIRE registry at sf0.01 (the driver's
   correctness gate only snapshots the first 50 entries; this closes the
   gap for the rest),
2. ``pytest tests/ -q``,
3. an ANSI driver simulation: every registered query executed at sf0.001
   on a session with ``spark.sql.ansi.enabled=true`` — the round driver
   owns its SparkSession and Spark 4 defaults ANSI ON, so this catches
   ANSI-unsafe expressions our own session factory would mask,
4. an artifact-provenance check (VERDICT r15 ask #7): the current
   round's committed SCALE/SCALE_ANN/STREAM_SCALE artifacts must be
   stamped (tools/_stamp.py) with a commit whose diff vs HEAD is
   doc/artifact-only, else the gate fails,
5. the three scale rehearsals (dedup+pipeline, ANN incl. index build,
   streaming state) unless ``--skip-rehearsals``.

Usage::

    python tools/verify_all.py [--out VERIFY_rNN.json] [--skip-rehearsals]

Exit status is non-zero if any compare line failed or pytest failed, so the
tool doubles as a CI gate.  Rehearsal JSONs are embedded verbatim in the
summary (and stay available as separate committed artifacts).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LINE_RE = re.compile(r"(OK|FAIL|ERR|SKIP)\s+([a-z0-9_]+):")


def parse_compare_output(stdout: str, stderr: str, registry) -> dict:
    """Fold compare.py's output into the report row.

    Primary path (VERDICT r11 ask #7): the final machine-readable JSON
    summary line compare.py now prints.  Fallback (compare crashed before
    its summary): scrape the per-query OK/FAIL/SKIP lines so the report
    still names what did run.  Pure function — unit-tested in
    tests/test_bench_artifact.py alongside the bench two-line format."""
    import json as _json

    registry = set(registry)
    lines = stdout.strip().splitlines()
    if lines:  # only the LAST line may be the summary
        try:
            cand = _json.loads(lines[-1])
        except ValueError:
            cand = None
        if isinstance(cand, dict) and cand.get("summary") == "compare":
            # ok-by-name isn't in the summary; a sweep whose reached
            # count (ok + failed + skipped) covers the registry left
            # nothing out.
            reached = cand["ok"] + len(cand["failures"]) + cand["skip"]
            missing = (
                [] if reached >= len(registry)
                else [f"<{len(registry) - reached} unreached>"]
            )
            return {
                "total": len(registry),
                "ok": cand["ok"],
                "skip": cand["skip"],
                "failures": sorted(cand["failures"]),
                "missing": missing,
                "source": "json_summary",
            }
    statuses = dict()
    for status, name in LINE_RE.findall(stdout + stderr):
        statuses[name] = status
    return {
        "total": len(registry),
        "ok": sum(1 for s in statuses.values() if s == "OK"),
        "skip": sum(1 for s in statuses.values() if s == "SKIP"),
        "failures": sorted(
            n for n, s in statuses.items() if s in ("FAIL", "ERR")
        ),
        "missing": sorted(registry - set(statuses)),
        "source": "scrape_fallback",
    }


def run_compare(sf_dir: str) -> dict:
    from meerkat_abacus_spark.queries import QUERIES

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/compare.py", sf_dir],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    out = parse_compare_output(proc.stdout, proc.stderr, QUERIES)
    out["sf_dir"] = sf_dir
    out["sec"] = round(time.time() - t0, 1)
    return out


def run_pytest() -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    m = re.search(r"(\d+) passed", tail)
    f = re.search(r"(\d+) failed", tail)
    return {
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else (0 if proc.returncode == 0 else -1),
        "summary": tail,
        "sec": round(time.time() - t0, 1),
    }


ANSI_SIM = """
import json, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.ansi.enabled", "true")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
import __spark_entry__ as E
assert E.entry(spark).count() > 0
bad = []
for name, fn in E.queries().items():
    try:
        fn(spark, "/root/testdata/sf0.001").count()
    except Exception as ex:
        bad.append([name, str(ex)[:200]])
print("ANSI_RESULT " + json.dumps(bad))
"""


def run_ansi_sim() -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", ANSI_SIM],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    failures = None
    for line in proc.stdout.splitlines():
        if line.startswith("ANSI_RESULT "):
            failures = json.loads(line[len("ANSI_RESULT "):])
    # Standing codegen gate (VERDICT r14 ask #4): janino compile failures
    # do NOT fail queries — Spark logs an ERROR and silently falls back
    # to interpreted execution (~10x slower on the r14 probe-fan-out
    # incident).  Scan the captured session log; ANY hit fails the gate
    # even when every query returned rows.  tools/ansi_sim.py applies the
    # same markers for standalone runs.
    if os.path.join(REPO, "tools") not in sys.path:
        sys.path.insert(0, os.path.join(REPO, "tools"))
    from ansi_sim import scan_codegen_errors

    codegen_errors = scan_codegen_errors(proc.stdout + "\n" + proc.stderr)
    return {
        "failures": failures if failures is not None else [["harness", "no result line"]],
        "codegen_errors": codegen_errors,
        "sec": round(time.time() - t0, 1),
    }


def run_readme_counts() -> dict:
    """VERDICT r10 ask #4: README's generated counts must match ground
    truth.  Regenerates them in place and reports drift — a drifted README
    fails the gate (and is left corrected for the commit that fixes it)."""
    path = os.path.join(REPO, "README.md")
    before = open(path).read()
    proc = subprocess.run(
        [sys.executable, "tools/gen_readme_counts.py"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    after = open(path).read()
    # fail CLOSED: a crashed generator means the counts were never
    # verified — that must fail the gate, not report "no drift"
    return {
        "drifted": before != after or proc.returncode != 0,
        "generator_rc": proc.returncode,
        "summary": (proc.stdout + proc.stderr).strip()[-500:],
    }


def current_round() -> int:
    """The round being built = one past the newest driver correctness
    artifact (the driver writes CORRECTNESS_r{N}.json at round end)."""
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        for m in [re.match(r"CORRECTNESS_r(\d+)\.json$", f)]
        if m
    ]
    return (max(rounds) + 1) if rounds else 1


def run_artifact_stamps() -> dict:
    """VERDICT r15 ask #7: the current round's committed rehearsal
    artifacts must carry a commit stamp whose diff against HEAD is
    doc/artifact-only — a number produced on code that later changed is
    STALE and fails the gate (regenerate it, or finish the code first).
    Artifacts not yet produced this round are reported but don't fail:
    the pre-rehearsal verify pass runs before they exist; the FINAL
    verify of the round must see all three present and current."""
    from _stamp import _code_only, code_diff_vs_head

    n = current_round()
    out: dict = {"round": n, "artifacts": {}, "stale": [], "missing": []}
    # Per-artifact relevance: an artifact is stale only when code that
    # can feed ITS numbers changed — the package, or its own harness.
    # (A gate amendment in the ANN harness must not force a dedup
    # rehearsal rerun.)
    relevant = {
        f"SCALE_r{n:02d}.json": (
            "meerkat_abacus_spark", "tools/scale_rehearsal.py",
        ),
        f"SCALE_ANN_r{n:02d}.json": (
            "meerkat_abacus_spark", "tools/ann_scale_rehearsal.py",
        ),
        f"STREAM_SCALE_r{n:02d}.json": (
            "meerkat_abacus_spark", "tools/stream_scale_rehearsal.py",
        ),
    }
    for fname in relevant:
        fpath = os.path.join(REPO, fname)
        if not os.path.exists(fpath):
            out["missing"].append(fname)
            continue
        try:
            with open(fpath) as fh:
                stamp = json.load(fh).get("artifact_commit")
        except (OSError, json.JSONDecodeError):
            stamp = None
        if not stamp or not stamp.get("commit"):
            out["artifacts"][fname] = {"commit": None}
            out["stale"].append(fname)  # unstamped = unverifiable
            continue
        diff = code_diff_vs_head(stamp["commit"], relevant[fname])
        row = {
            "commit": stamp["commit"],
            "dirty_code_paths": _code_only(
                stamp.get("dirty_code_paths", []), relevant[fname]
            ),
            "code_diff_vs_head": diff,
        }
        out["artifacts"][fname] = row
        if diff is None or diff or row["dirty_code_paths"]:
            out["stale"].append(fname)
    return out


def run_rehearsal(script: str) -> dict | None:
    proc = subprocess.run(
        [sys.executable, f"tools/{script}"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-rehearsals", action="store_true")
    args = ap.parse_args()

    # Round-start automation (VERDICT r8 ask #3): fold any newer driver
    # artifacts into the rotation snapshot before anything imports the
    # queries package, so the registry ordering and the staleness
    # invariants are evaluated against fresh certification data.
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_rotation import regenerate_if_stale

    if regenerate_if_stale():
        print("regenerated runtime rotation snapshot from newer driver artifacts",
              file=sys.stderr)

    report: dict = {
        "compare": run_compare(args.sf_dir),
        "pytest": run_pytest(),
        "ansi_sim": run_ansi_sim(),
        "readme_counts": run_readme_counts(),
        "artifact_stamps": run_artifact_stamps(),
    }
    if not args.skip_rehearsals:
        report["rehearsals"] = {
            "dedup_and_pipeline_10x": run_rehearsal("scale_rehearsal.py"),
            "ann_100x": run_rehearsal("ann_scale_rehearsal.py"),
            "stream_state_10x_users": run_rehearsal("stream_scale_rehearsal.py"),
        }
    ok = (
        not report["compare"]["failures"]
        and not report["compare"]["missing"]
        and report["pytest"]["failed"] == 0
        and not report["ansi_sim"]["failures"]
        and not report["ansi_sim"]["codegen_errors"]
        and not report["readme_counts"]["drifted"]
        and not report["artifact_stamps"]["stale"]
    )
    report["green"] = ok
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as fh:
            fh.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
