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
    - ``{"multiple-spaces": [..]}``  space-joined random subset
      (create_fake_data.py:48-50)
    - ``{"integer": [lo, hi]}``    uniform int (as string, ODK semantics)
    - ``{"range": [lo, hi]}``      uniform float (create_fake_data.py:53-55)
    - ``{"date": [start, end]}``   ISO date between bounds
    - ``{"patient_id": m}``        colliding small-int ids (dedup fixtures)
    - ``{"data": [values]}``       pick from a caller-supplied value list —
      the reference's ``data``-ref spec resolves a key in its side-band
      ``data`` dict (create_fake_data.py:69-76); here the caller resolves
      the key and passes the list (empty list → NULL, matching the
      reference's ``len(data[argument]) == 0 → None``)
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
        elif "multiple" in spec or "multiple-spaces" in spec:
            sep = "," if "multiple" in spec else " "
            choices = spec.get("multiple") or spec["multiple-spaces"]
            picks = F.filter(
                F.array(
                    *[
                        F.when(F.rand(seed + idx * 101 + j) < 0.5, F.lit(c))
                        for j, c in enumerate(choices)
                    ]
                ),
                lambda x: x.isNotNull(),
            )
            cols[name] = F.concat_ws(sep, picks)
        elif "integer" in spec:
            lo, hi = spec["integer"]
            cols[name] = (F.floor(r * (hi - lo + 1)) + lo).cast("int").cast("string")
        elif "range" in spec:
            lo, hi = spec["range"]
            cols[name] = (F.lit(float(lo)) + r * (float(hi) - float(lo))).cast(
                "string"
            )
        elif "data" in spec:
            values = list(spec["data"])
            if not values:
                cols[name] = F.lit(None).cast("string")
            else:
                cols[name] = F.element_at(
                    F.array(*[F.lit(v) for v in values]),
                    (F.floor(r * len(values)) + 1).cast("int"),
                )
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
