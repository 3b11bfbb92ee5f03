"""J6 — point-in-polygon location resolution, UDF-free.

Reference: meerkat_abacus/codes/to_codes.py:154-180 — a record with an
``in_geometry$lat,lng`` location spec gets its clinic/district by a linear
scan of district polygons with Shapely ``contains``.

Here containment is the classic ray-casting (crossing-number) test expressed
as an ``aggregate`` over the polygon's vertex array — pure Catalyst
expressions, so it vectorizes and needs no Sedona/Shapely.  Polygons are a
broadcast dimension (a country has ~100 districts); the plan is
points × broadcast(polygons) with the containment predicate, i.e. exactly
the reference's linear scan but batched and codegen'd.  First match wins by
polygon priority (the reference takes the first containing district).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def point_in_polygon(x: Column, y: Column, vertices: Column) -> Column:
    """True iff (x, y) is inside the polygon given as ARRAY<STRUCT<x,y>>.

    Crossing-number/ray-casting: count edges (v[i], v[i mod n + 1]) whose
    y-interval straddles the point and whose x-intersection lies right of
    the point; odd count = inside.  ``vertices`` must be a materialized
    column (perf contract, datapipe/text.py).
    """
    n = F.size(vertices)

    def edge_crossing(acc: Column, i: Column) -> Column:
        vi = F.element_at(vertices, i)
        vj = F.element_at(
            vertices, (F.pmod(i, n) + 1).cast("int")
        )  # wraps last → first
        yi, yj = vi["y"], vj["y"]
        xi, xj = vi["x"], vj["x"]
        straddles = (yi > y) != (yj > y)
        x_at_y = (xj - xi) * (y - yi) / (yj - yi) + xi
        return acc + F.when(straddles & (x < x_at_y), F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), edge_crossing)
    return F.pmod(crossings, F.lit(2)) == 1


def locate_points(
    points: DataFrame,
    polygons: DataFrame,
    point_id_col: str,
    x_col: str = "x",
    y_col: str = "y",
    poly_vertices_col: str = "vertices",
    poly_name_col: str = "name",
    poly_priority_col: str | None = None,
) -> DataFrame:
    """Attach the first (by priority) containing polygon's name to each point
    row as ``located_in`` (NULL when no polygon contains it).

    ``point_id_col`` must uniquely identify point rows — the first-match
    window partitions on it alone (not on every point column).
    """
    order = (
        F.col(f"__p.{poly_priority_col}")
        if poly_priority_col
        else F.col(f"__p.{poly_name_col}")
    )
    polys = F.broadcast(
        polygons.select(
            F.struct(*[F.col(c) for c in polygons.columns]).alias("__p")
        )
    )
    inside = point_in_polygon(
        F.col(x_col).cast("double"),
        F.col(y_col).cast("double"),
        F.col(f"__p.{poly_vertices_col}"),
    )
    joined = points.join(polys, inside, "left")
    w = Window.partitionBy(F.col(point_id_col)).orderBy(order.asc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(c) for c in points.columns],
            F.col(f"__p.{poly_name_col}").alias("located_in"),
        )
    )
