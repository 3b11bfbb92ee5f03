"""Tests for G2 multi-row split, J6 ray-casting, A5 topic fan-out."""

from pyspark.sql import functions as F

from meerkat_abacus_spark.operators.geo import locate_points, point_in_polygon
from meerkat_abacus_spark.operators.multirow import split_multiple_rows
from meerkat_abacus_spark.operators.send_alerts import (
    render_alert_messages,
    topic_fan_out,
)


def test_multirow_split_uuid_and_projection(spark):
    """Reference to_codes.py:110-136 — pt1./gender1, pt2./gender2 explode to
    sub-rows with uuid suffix :1/:2; absent entities are dropped."""
    df = spark.createDataFrame(
        [("u1", "male", "female", "7"), ("u2", "male", "", "")],
        ["meta/instanceID", "pt1./gender", "pt2./gender", "pt1./age"],
    )
    out = split_multiple_rows(
        df,
        column_templates=["pt$./gender", "pt$./age"],
        max_index=2,
        keep_columns=[],
    )
    rows = {r["uuid"]: (r["pt./gender"], r["pt./age"]) for r in out.collect()}
    assert rows == {
        "u1:1": ("male", "7"),
        "u1:2": ("female", None),
        "u2:1": ("male", ""),
        # u2:2 dropped — all entity-2 values empty
    }


def test_point_in_polygon_basic(spark):
    square = [{"x": 0.0, "y": 0.0}, {"x": 10.0, "y": 0.0},
              {"x": 10.0, "y": 10.0}, {"x": 0.0, "y": 10.0}]
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, -1.0, -1.0)], ["id", "x", "y"]
    ).withColumn(
        "verts",
        F.lit(None).cast("string"),
    )
    polys = spark.createDataFrame(
        [("sq", 1, square)],
        "name string, priority int, vertices array<struct<x:double,y:double>>",
    )
    located = locate_points(
        df.select("id", "x", "y"), polys, point_id_col="id",
        poly_priority_col="priority",
    )
    got = {r["id"]: r["located_in"] for r in located.collect()}
    assert got == {1: "sq", 2: None, 3: None}


def test_point_in_polygon_priority_first_match(spark):
    inner = [{"x": 2.0, "y": 2.0}, {"x": 8.0, "y": 2.0},
             {"x": 8.0, "y": 8.0}, {"x": 2.0, "y": 8.0}]
    outer = [{"x": 0.0, "y": 0.0}, {"x": 10.0, "y": 0.0},
             {"x": 10.0, "y": 10.0}, {"x": 0.0, "y": 10.0}]
    polys = spark.createDataFrame(
        [("outer", 2, outer), ("inner", 1, inner)],
        "name string, priority int, vertices array<struct<x:double,y:double>>",
    )
    pts = spark.createDataFrame([(1, 5.0, 5.0), (2, 1.0, 1.0)], ["id", "x", "y"])
    located = locate_points(pts, polys, point_id_col="id",
                            poly_priority_col="priority")
    got = {r["id"]: r["located_in"] for r in located.collect()}
    assert got == {1: "inner", 2: "outer"}


def test_send_alerts_render_and_topics(spark):
    """FIXTURES.md §3: uuid 'abcdefghijk' → alert_id 'fghijk'; topic list is
    the (levels+country) × (reason, allDis) cartesian product."""
    df = spark.createDataFrame(
        [("abcdefghijk", True, 0, "cmd_1", 6, 4, 2, "2017-01-01")],
        ["uuid", "alert", "sub_alert", "alert_reason",
         "clinic", "district", "region", "date"],
    )
    rendered = render_alert_messages(df)
    row = rendered.collect()[0]
    assert row["alert_id"] == "fghijk"
    assert "fghijk" in row["message"] and "cmd_1" in row["message"]

    fanned = topic_fan_out(rendered, prefix="demo")
    topics = sorted(r["topic"] for r in fanned.collect())
    assert topics == sorted([
        "demo-6-cmd_1", "demo-6-allDis",
        "demo-4-cmd_1", "demo-4-allDis",
        "demo-2-cmd_1", "demo-2-allDis",
        "demo-1-cmd_1", "demo-1-allDis",
    ])
