"""J2/K2: incremental recompute of link-affected base rows ≡ full recompute."""

from pyspark.sql import functions as F

from meerkat_abacus_spark.operators.coding import Rule, code_dataframe
from meerkat_abacus_spark.operators.links import LinkDef, add_links
from meerkat_abacus_spark.plans.incremental import (
    affected_base_rows,
    incremental_recode,
)

LINK = LinkDef(name="fu", type="case", to_form="f", from_form="b",
               from_column="key", to_column="key",
               order_by="date;date", uuid="uuid")

RULES = [
    Rule(id="n_fu", method="value", db_column="uuid", condition="",
         multiple_link="count", form="fu"),
]


def _recompute(to_form):
    def run(base_slice):
        linked = add_links(base_slice, {"f": to_form}, [LINK])
        return code_dataframe(linked, RULES).select(
            "uuid", F.lit("case").alias("type"),
            F.element_at("variables", "n_fu").alias("n_fu"),
        )
    return run


def test_incremental_equals_batch(spark, tmp_path):
    base = spark.createDataFrame(
        [("b1", "k1"), ("b2", "k2"), ("b3", "k3")], ["uuid", "key"]
    )
    to_v1 = spark.createDataFrame(
        [("t1", "k1", "2017-01-01")], ["uuid", "key", "date"]
    )
    path = str(tmp_path / "data")

    # bootstrap: full recompute over v1
    full_v1 = _recompute(to_v1)(base)
    full_v1.write.mode("overwrite").parquet(path)

    # a new linked row for k2 arrives → only b2 is affected
    new_rows = spark.createDataFrame(
        [("t2", "k2", "2017-02-01")], ["uuid", "key", "date"]
    )
    to_v2 = to_v1.unionByName(new_rows)

    affected = affected_base_rows(base, new_rows, LINK)
    assert [r["uuid"] for r in affected.collect()] == ["b2"]

    incremental_recode(
        spark, base, new_rows, LINK, _recompute(to_v2), path,
        keys=["uuid", "type"],
    )

    got = {
        r["uuid"]: r["n_fu"] for r in spark.read.parquet(path).collect()
    }
    expected = {
        r["uuid"]: r["n_fu"] for r in _recompute(to_v2)(base).collect()
    }
    assert got == expected
    assert got["b2"] == "1" and got["b1"] == "1" and got["b3"] is None
