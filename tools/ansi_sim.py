"""Driver simulation under ANSI mode (verify skill step 2).

The round driver owns its own SparkSession and Spark 4 defaults ANSI ON,
while this repo's session factory turns ANSI off — so any ANSI-unsafe
expression (bare casts, out-of-range arithmetic, invalid date parses)
only surfaces here.  Runs entry() plus every registered query at sf0.001.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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
