"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf dir, compare
row count + sorted-column value hash.  Usage:

    python tools/compare.py [sf_dir] [query ...]

Output: one OK/FAIL/SKIP line per query, then a FINAL machine-readable
JSON summary line (VERDICT r11 ask #7) —
``{"summary": "compare", "total": N, "ok": N, "skip": N,
"failures": [...], "skipped": [...], "sf_dir": ...}`` — so
tools/verify_all.py and any independent gate runner parse the result
instead of scraping the textual lines (robust to format drift).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    norm = _normalize(df)
    payload = norm.to_csv(index=False).encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from meerkat_abacus_spark.queries import ORACLES, QUERIES
    from meerkat_abacus_spark.session import get_spark

    only = sys.argv[2:] or list(QUERIES)

    spark = get_spark(app_name="compare")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures: list[str] = []
    skipped: list[str] = []
    ok = 0
    for name in only:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in ORACLES:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}, {t_spark:.1f}s)")
            skipped.append(name)
            continue
        try:
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL  {name}: columns spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            failures.append(name)
            continue
        hs, ho = value_hash(sdf), value_hash(odf)
        if hs != ho:
            print(f"FAIL  {name}: value hash mismatch ({len(sdf)} rows)")
            a, b = _normalize(sdf), _normalize(odf)
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
            else:
                print("  spark head:\n", a.head(5))
                print("  oracle head:\n", b.head(5))
            failures.append(name)
            continue
        ok += 1
        print(f"OK    {name}: {len(sdf)} rows match ({t_spark:.1f}s spark)")
    # Machine-readable summary, LAST line (VERDICT r11 ask #7): consumed
    # by tools/verify_all.py and independent gate runs instead of
    # scraping the per-query lines above.
    print(
        json.dumps(
            {
                "summary": "compare",
                "sf_dir": sf_dir,
                "total": len(only),
                "ok": ok,
                "skip": len(skipped),
                "failures": failures,
                "skipped": skipped,
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
