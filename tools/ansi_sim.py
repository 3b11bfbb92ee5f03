"""Driver simulation under ANSI mode (verify skill step 2).

The round driver owns its own SparkSession and Spark 4 defaults ANSI ON,
while this repo's session factory turns ANSI off — so any ANSI-unsafe
expression (bare casts, out-of-range arithmetic, invalid date parses)
only surfaces here.  Runs entry() plus every registered query at sf0.001.

STANDING CODEGEN GATE (VERDICT r14 ask #4): janino compile failures —
e.g. a generated method growing past the 64 KB JVM limit — do NOT fail
the query; Spark logs an ERROR and silently falls back to interpreted
execution (~10x slower on the r14 probe-fan-out incident, visible only
to someone reading stderr).  So the sim now runs itself as a subprocess,
scans the combined session log for CodeGenerator error markers, and
EXITS NONZERO on any hit even when every query returned rows.  The
verify harness records the result as ``ansi_codegen_clean``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Lines that certify a silent interpreted-execution fallback.  "ERROR
# CodeGenerator" is the log4j tag on every compile failure; the janino
# class name and the 64 KB message catch reformatted log layouts.
CODEGEN_MARKERS = (
    "ERROR CodeGenerator",
    "InternalCompilerException",
    "grows beyond 64 KB",
)


def scan_codegen_errors(log_text: str) -> list:
    """Session-log lines certifying a silent codegen fallback — pure so
    tests/test_bench_artifact.py can pin the gate without a subprocess."""
    return [
        line.strip()[:300]
        for line in log_text.splitlines()
        if any(m in line for m in CODEGEN_MARKERS)
    ]


def main() -> None:
    if os.environ.get("ANSI_SIM_CHILD") != "1":
        # Parent: re-exec the sim as a child and grep ITS session log —
        # a process cannot grep its own live stderr, and the log4j
        # appender writes the CodeGenerator errors there.
        import subprocess

        env = dict(os.environ, ANSI_SIM_CHILD="1")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        hits: list[str] = []
        assert proc.stdout is not None
        for line in proc.stdout:
            sys.stdout.write(line)
            hits.extend(scan_codegen_errors(line))
        rc = proc.wait()
        if hits:
            print(
                f"CODEGEN-FALLBACK: {len(hits)} CodeGenerator error "
                "line(s) in the session log — queries passed but ran "
                "interpreted (VERDICT r14 ask #4 gate):"
            )
            for h in hits[:10]:
                print(f"  {h}")
            sys.exit(2)
        print("codegen clean: zero CodeGenerator errors in the session log")
        sys.exit(rc)
    _run_sim()


def _run_sim() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as E

    n = E.entry(spark).count()
    assert n >= 0
    print(f"entry OK ({n} rows)")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    failed = []
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf).count()
            print(f"OK    {name} ({time.time() - t0:.1f}s)")
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:200]}")
    spark.stop()
    if failed:
        print(f"{len(failed)} ANSI failures: {failed}")
        sys.exit(1)
    print("all queries ANSI-clean")


if __name__ == "__main__":
    main()
