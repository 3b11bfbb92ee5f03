"""Deterministic synthetic form generator (S5).

Reference: util/create_fake_data.py:15-279 — seeded per-field specs
(``one``/``multiple``/``integer``/``range``/``date``/``patient_id``).  Here
the generator is a ``spark.range(N)`` plus column expressions seeded via
``rand(seed)`` / md5 arithmetic — fully distributed, no driver-side loop, so
fixture generation scales with the cluster like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_form(
    spark: SparkSession,
    n: int,
    field_specs: dict[str, dict],
    seed: int = 1,
    uuid_col: str = "meta/instanceID",
) -> DataFrame:
    """Build an N-row form DataFrame from per-field specs:

    - ``{"one": [choices]}``       uniform pick
    - ``{"multiple": [choices]}``  comma-joined random subset
    - ``{"integer": [lo, hi]}``    uniform int (as string, ODK semantics)
    - ``{"date": [start, end]}``   ISO date between bounds
    - ``{"patient_id": m}``        colliding small-int ids (dedup fixtures)
    """
    df = spark.range(n).withColumnRenamed("id", "__i")
    cols: dict[str, F.Column] = {
        uuid_col: F.concat(F.lit("uuid:"), F.md5(F.concat(F.lit(seed), F.col("__i"))))
    }
    for idx, (name, spec) in enumerate(sorted(field_specs.items())):
        r = F.rand(seed + idx)
        if "one" in spec:
            choices = spec["one"]
            cols[name] = F.element_at(
                F.array(*[F.lit(c) for c in choices]),
                (F.floor(r * len(choices)) + 1).cast("int"),
            )
        elif "multiple" in spec:
            choices = spec["multiple"]
            picks = F.filter(
                F.array(
                    *[
                        F.when(F.rand(seed + idx * 101 + j) < 0.5, F.lit(c))
                        for j, c in enumerate(choices)
                    ]
                ),
                lambda x: x.isNotNull(),
            )
            cols[name] = F.concat_ws(",", picks)
        elif "integer" in spec:
            lo, hi = spec["integer"]
            cols[name] = (F.floor(r * (hi - lo + 1)) + lo).cast("int").cast("string")
        elif "date" in spec:
            start, end = spec["date"]
            span = F.datediff(F.lit(end), F.lit(start))
            cols[name] = F.date_format(
                F.date_add(F.to_date(F.lit(start)), (r * span).cast("int")),
                "yyyy-MM-dd'T'HH:mm:ss",
            )
        elif "patient_id" in spec:
            cols[name] = F.floor(r * spec["patient_id"]).cast("int").cast("string")
        else:
            raise ValueError(f"unknown field spec for {name}: {spec}")
    return df.withColumns(cols).drop("__i")
