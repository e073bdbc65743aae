"""Point-in-polygon predicates and the point↔polygon spatial join.

The north rule names "point-in-polygon" as a first-class capability next
to kNN and the cell index.  Verde itself only has the convex special case
(``convexhull_mask``, mask.py:116-219); general polygons are designed
fresh, Spark-first:

* The membership test is the even-odd ray-crossing rule expressed as a
  **pure Catalyst expression**: polygon vertices live in an
  ``array<struct<x,y>>`` column, edges come from ``arrays_zip`` with the
  rotated array, and the crossing count is ``F.aggregate`` over the edge
  array — whole-stage-codegen'd, no Python anywhere, works per-row
  against *different* polygons (unlike a broadcast closure).
* ``polygon_join`` pairs a huge point table with a polygon table.  Two
  physical strategies:
  - ``method="bbox"``: broadcast the polygons, join on the bounding-box
    range predicate, then the exact crossing test.  Right when polygons
    are few (BroadcastNestedLoopJoin over a tiny build side).
  - ``method="cells"``: cover each polygon's bbox with coarse square
    cells (integer floor-division ids, the same arithmetic family as the
    block/tile keys), explode the cover, equi-join on the point's cell
    id, then the exact test.  This is the 100 TB path: an
    AQE/skew-manageable shuffled **equi-join** whose candidate set is
    proportional to polygon area, never a cartesian.

Boundary semantics: even-odd with the half-open rule — a point exactly on
a horizontal-upper edge counts per the ``(y1>y) != (y2>y)`` strictness;
vertices are counted once.  This matches the classic PNPOLY contract.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def polygon_literal(vertices: Sequence[Tuple[float, float]]) -> Column:
    """A driver-side vertex list as an ``array<struct<x,y>>`` literal."""
    return F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in vertices
        ]
    )


def _edges(verts: Column) -> Column:
    """array of (a, b) vertex pairs for each polygon edge (closing wrap).

    Degenerate polygons (< 2 vertices — e.g. an empty vertex array from
    upstream geometry cleaning) yield an EMPTY edge list: the membership
    fold then evaluates to not-inside instead of ``slice`` crashing the
    whole join on a negative length."""
    n = F.size(verts)
    rotated = F.concat(F.slice(verts, 2, n - 1), F.slice(verts, 1, 1))
    empty = F.array().cast(
        "array<struct<a:struct<x:double,y:double>,b:struct<x:double,y:double>>>"
    )
    return F.when(
        n >= 2, F.arrays_zip(verts.alias("a"), rotated.alias("b"))
    ).otherwise(empty)


def point_in_polygon_expr(x: Column, y: Column, verts: Column) -> Column:
    """Even-odd ray-crossing membership as a boolean Column.

    ``aggregate`` accumulates, per edge (a→b), whether a rightward ray
    from (x, y) crosses it:
      (a.y > y) != (b.y > y)  AND  x < a.x + (b.x−a.x)·(y−a.y)/(b.y−a.y)
    Odd total ⇒ inside.
    """
    def cross(acc, e):
        ax, ay = e["a"]["x"], e["a"]["y"]
        bx, by = e["b"]["x"], e["b"]["y"]
        straddles = (ay > y) != (by > y)
        xcross = ax + (bx - ax) * (y - ay) / (by - ay)
        return acc + F.when(straddles & (x < xcross), 1).otherwise(0)

    return F.aggregate(_edges(verts), F.lit(0), cross) % 2 == 1


def point_in_polygon(
    df: DataFrame,
    vertices: Sequence[Tuple[float, float]],
    easting: str = "easting",
    northing: str = "northing",
    col_name: str = "inside",
) -> DataFrame:
    """Add a boolean membership column for one fixed polygon."""
    return df.withColumn(
        col_name,
        point_in_polygon_expr(F.col(easting), F.col(northing), polygon_literal(vertices)),
    )


def _poly_bbox(polys: DataFrame, verts_col: str) -> DataFrame:
    v = F.col(verts_col)
    return polys.withColumn("__xmin", F.array_min(v.getField("x"))) \
        .withColumn("__xmax", F.array_max(v.getField("x"))) \
        .withColumn("__ymin", F.array_min(v.getField("y"))) \
        .withColumn("__ymax", F.array_max(v.getField("y")))


def polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    verts_col: str = "vertices",
    easting: str = "easting",
    northing: str = "northing",
    method: str = "cells",
    cell_spacing: Optional[float] = None,
    how: str = "inner",
    point_id: Optional[str] = None,
) -> DataFrame:
    """Join points to the polygons that contain them.

    ``polygons`` must carry ``verts_col: array<struct<x,y>>`` plus any id
    columns.  ``how``:
      - ``"inner"`` (default): one row per (point, containing polygon);
      - ``"semi"``: the point rows inside at least one polygon;
      - ``"anti"``: the point rows outside every polygon.

    ``point_id``: a unique point id column used as the semi/anti
    dedup/join key.  When absent one is synthesized as ``xxhash64`` of
    the full row, so the shuffle key is a single long instead of every
    point column (with wide payload tables the full-width key was the
    plan's dominant cost — VERDICT r2); fully identical rows collapse to
    one in semi mode exactly as the previous all-column ``dropDuplicates``
    did, and a 64-bit collision (≈ birthday at ~2^32 distinct rows) can
    misclassify one point — pass a real id column where that matters.

    ``method="cells"`` covers each polygon bbox with square cells of
    ``cell_spacing`` (default: median bbox width/4 computed driver-side
    from the polygon table — cheap, it's the small side) and equi-joins
    on the point's cell id.  ``method="bbox"`` broadcasts the polygons
    and joins on the bbox range predicate.
    """
    x, y = F.col(easting), F.col(northing)
    polys = _poly_bbox(polygons, verts_col)
    exact = point_in_polygon_expr(x, y, F.col(verts_col))

    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"unknown how: {how!r}")
    pid = point_id
    if how != "inner" and pid is None:
        pid = "__pid"
        points = points.withColumn(pid, F.xxhash64(*points.columns))
    if method == "bbox":
        cond = (
            (x >= F.col("__xmin")) & (x <= F.col("__xmax"))
            & (y >= F.col("__ymin")) & (y <= F.col("__ymax"))
        )
        joined = points.join(F.broadcast(polys), cond, "inner")
    elif method == "cells":
        if cell_spacing is None:
            widths = polys.select(
                F.expr("percentile(__xmax - __xmin, 0.5)").alias("w")
            ).collect()[0]["w"]
            cell_spacing = max(float(widths) / 4.0, 1e-12)
        s = float(cell_spacing)
        # polygon side: explode the integer cell cover of the bbox
        cover = polys.withColumn(
            "__cx", F.explode(F.sequence(
                F.floor(F.col("__xmin") / s).cast("long"),
                F.floor(F.col("__xmax") / s).cast("long"),
            ))
        ).withColumn(
            "__cy", F.explode(F.sequence(
                F.floor(F.col("__ymin") / s).cast("long"),
                F.floor(F.col("__ymax") / s).cast("long"),
            ))
        )
        pts = points.withColumn("__cx", F.floor(x / s).cast("long")).withColumn(
            "__cy", F.floor(y / s).cast("long")
        )
        joined = pts.join(cover, ["__cx", "__cy"], "inner").drop("__cx", "__cy")
    else:
        raise ValueError(f"unknown method: {method!r}")

    pairs = joined.filter(exact).drop("__xmin", "__xmax", "__ymin", "__ymax")
    if how == "inner":
        return pairs
    # single-long dedup/anti key: the distinct-id table is narrow however
    # wide the point payload is, and the final join carries the payload
    # through untouched
    inside_ids = pairs.select(pid).dropDuplicates()
    if how == "semi":
        # dropDuplicates on the id alone keeps semi output row-distinct
        # (the previous all-column dropDuplicates contract) at a narrow key
        out = points.join(inside_ids, on=pid, how="left_semi").dropDuplicates([pid])
    else:
        out = points.join(inside_ids, on=pid, how="left_anti")
    return out.drop("__pid") if point_id is None else out


def zonal_stats(
    nodes: DataFrame,
    polygons: DataFrame,
    value_col: str,
    verts_col: str = "vertices",
    easting: str = "easting",
    northing: str = "northing",
    stats: Sequence[str] = ("count", "mean", "min", "max"),
    method: str = "cells",
) -> DataFrame:
    """Raster→vector zonal statistics: aggregate a grid-node (or point)
    table per containing polygon.

    Composition of ``polygon_join`` (cell-cover equi-join) with algebraic
    aggregates — map-side combinable, AQE-skew-splittable; the classic
    raster↔vector operator the north rule names.  ``stats`` ⊆
    {count, mean, min, max, sum, stddev}.
    """
    fns = {
        "count": lambda c: F.count(c),
        "mean": lambda c: F.avg(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "sum": lambda c: F.sum(c),
        "stddev": lambda c: F.stddev_samp(c),
    }
    unknown = set(stats) - set(fns)
    if unknown:
        raise ValueError(f"unknown stats: {sorted(unknown)}")
    keys = [c for c in polygons.columns if c != verts_col]
    if not keys:
        # groupBy() with zero keys would silently collapse every polygon
        # into one global aggregate row
        raise ValueError(
            "zonal_stats needs at least one polygon id column besides "
            f"{verts_col!r}; add one (e.g. monotonically_increasing_id) first"
        )
    pairs = polygon_join(
        nodes, polygons, verts_col=verts_col, easting=easting,
        northing=northing, method=method, how="inner",
    )
    aggs = [fns[s](F.col(value_col)).alias(f"{s}_{value_col}") for s in stats]
    return pairs.groupBy(*keys).agg(*aggs)


def rasterize(
    polygons: DataFrame,
    region: Sequence[float],
    shape=None,
    spacing=None,
    value_col: Optional[str] = None,
    fill: Optional[float] = None,
    agg: str = "max",
    verts_col: str = "vertices",
    method: str = "broadcast",
    cell_spacing: Optional[float] = None,
    value_name: str = "value",
    max_broadcast_polygons: int = 1024,
) -> DataFrame:
    """Vector→raster: burn polygon values onto a regular grid.

    The inverse of :func:`zonal_stats` and the remaining corner of the
    north rule's "raster↔vector" pair (raster→vector = ``grid_to_table``
    / ``zonal_stats``; vector→raster = this).  Returns the node table
    ``(iy, ix, northing, easting, <value_name>)`` where each node gets
    ``agg`` of ``value_col`` over every polygon containing it (``1`` per
    polygon when ``value_col`` is None) and ``fill`` (default null) when
    no polygon contains it.  ``agg`` ∈ {max, min, sum, count}; max/min —
    the usual burn-priority rules — are order-independent, so the output
    is deterministic under any physical plan.

    Two physical strategies, chosen like ``polygon_join``'s:

    - ``method="broadcast"`` (default; requires ≤ *max_broadcast_polygons*
      rows): collect the polygon table to the driver and evaluate
      membership as ONE Catalyst projection over a polygon-array literal —
      **zero joins, zero shuffles**; the whole raster materializes at
      scan speed however many nodes the grid has.  This is the plan you
      want at 100 TB node counts with a broadcastable polygon set.
    - ``method="cells"``: the many-polygons path — cover each polygon
      bbox with square cells (``cell_spacing``, default: median bbox
      width / 4), explode the cover, LEFT equi-join nodes on their cell
      id, exact-test, and aggregate per node.  One shuffled equi-join +
      one map-side-combined aggregation; candidate count tracks polygon
      area, never the cross product.
    """
    aggs_proj = {
        "max": lambda arr: F.array_max(arr),
        "min": lambda arr: F.array_min(arr),
        "sum": lambda arr: F.aggregate(
            F.filter(arr, lambda v: v.isNotNull()),
            F.lit(None).cast("double"),
            lambda acc, v: F.coalesce(acc + v, v),
        ),
        "count": lambda arr: F.when(
            F.size(F.filter(arr, lambda v: v.isNotNull())) > 0,
            F.size(F.filter(arr, lambda v: v.isNotNull())).cast("double"),
        ),
    }
    aggs_grp = {
        "max": F.max,
        "min": F.min,
        "sum": F.sum,
        "count": lambda c: F.when(F.count(c) > 0, F.count(c).cast("double")),
    }
    if agg not in aggs_proj:
        raise ValueError(f"agg must be one of {sorted(aggs_proj)}, got {agg!r}")

    spark = polygons.sparkSession
    from ..coordinates import grid_coordinates

    nodes = grid_coordinates(spark, region, shape=shape, spacing=spacing)
    x, y = F.col("easting"), F.col("northing")
    fill_lit = F.lit(None if fill is None else float(fill)).cast("double")
    vcol = F.col(value_col).cast("double") if value_col else F.lit(1.0)

    if method == "broadcast":
        rows = polygons.select(
            F.col(verts_col).alias("v"), vcol.alias("val")
        ).collect()
        # NULL burn values can't burn anything: drop those polygons, same
        # as the cells path where SQL aggregates ignore NULL __val (and a
        # None in the sort key / F.lit(float(...)) below would crash)
        rows = [r for r in rows if r["val"] is not None]
        if len(rows) > max_broadcast_polygons:
            raise ValueError(
                f"{len(rows)} polygons > max_broadcast_polygons="
                f"{max_broadcast_polygons}; use method='cells'"
            )
        # deterministic expression order (collect order is plan-dependent)
        rows = sorted(rows, key=lambda r: (r["val"], str(r["v"])))
        per_poly = [
            F.when(
                point_in_polygon_expr(
                    x, y, polygon_literal([(p["x"], p["y"]) for p in r["v"]])
                ),
                F.lit(float(r["val"])),
            )
            for r in rows
        ]
        arr = F.array(*per_poly) if per_poly else F.array().cast("array<double>")
        burned = F.coalesce(aggs_proj[agg](arr), fill_lit)
        return nodes.select(
            "iy", "ix", "northing", "easting", burned.alias(value_name)
        )

    if method != "cells":
        raise ValueError(f"unknown method: {method!r}")

    polys = _poly_bbox(polygons.select(F.col(verts_col), vcol.alias("__val")), verts_col)
    if cell_spacing is None:
        width = polys.select(
            F.expr("percentile(__xmax - __xmin, 0.5)").alias("w")
        ).collect()[0]["w"]
        cell_spacing = max(float(width) / 4.0, 1e-12)
    s = float(cell_spacing)
    cover = polys.withColumn(
        "__cx",
        F.explode(
            F.sequence(
                F.floor(F.col("__xmin") / s).cast("long"),
                F.floor(F.col("__xmax") / s).cast("long"),
            )
        ),
    ).withColumn(
        "__cy",
        F.explode(
            F.sequence(
                F.floor(F.col("__ymin") / s).cast("long"),
                F.floor(F.col("__ymax") / s).cast("long"),
            )
        ),
    )
    pts = nodes.withColumn("__cx", F.floor(x / s).cast("long")).withColumn(
        "__cy", F.floor(y / s).cast("long")
    )
    joined = pts.join(cover, ["__cx", "__cy"], "left")
    hit_val = F.when(
        point_in_polygon_expr(x, y, F.col(verts_col)), F.col("__val")
    )
    return joined.groupBy("iy", "ix", "northing", "easting").agg(
        F.coalesce(aggs_grp[agg](hit_val), fill_lit).alias(value_name)
    )


def polygon_area_expr(verts: Column | str) -> Column:
    """Signed shoelace area of an ``array<struct<x,y>>`` polygon — one
    ``aggregate`` over the closing edge list, no UDF.  Positive for
    counter-clockwise vertex order."""
    v = F.col(verts) if isinstance(verts, str) else verts
    cross = F.aggregate(
        _edges(v),
        F.lit(0.0),
        lambda acc, e: acc + (e["a"]["x"] * e["b"]["y"] - e["b"]["x"] * e["a"]["y"]),
    )
    return cross / F.lit(2.0)


def polygon_properties(
    polygons: DataFrame, verts_col: str = "vertices"
) -> DataFrame:
    """area / centroid / bbox per polygon — all Catalyst ``aggregate``
    expressions over the vertex array (raster↔vector support layer; the
    centroid is the area-weighted polygon centroid, not the vertex mean).

    One projection, zero shuffles, zero Python: at 10^9 polygons this is
    a single codegen'd map stage.
    """
    v = F.col(verts_col)
    area = polygon_area_expr(v)

    def _centroid(which: str) -> Column:
        # Cx = 1/(6A) Σ (x_a + x_b)(x_a·y_b − x_b·y_a)  (same for y);
        # degenerate polygons (area 0: <3 verts or collinear) fall back to
        # the vertex mean instead of dividing by zero
        weighted = (
            F.aggregate(
                _edges(v),
                F.lit(0.0),
                lambda acc, e: acc
                + (e["a"][which] + e["b"][which])
                * (e["a"]["x"] * e["b"]["y"] - e["b"]["x"] * e["a"]["y"]),
            )
            / (F.lit(6.0) * area)
        )
        vertex_mean = F.aggregate(
            F.transform(v, lambda p: p[which]), F.lit(0.0), lambda a, x: a + x
        ) / F.size(v)
        return F.when(area != 0, weighted).otherwise(vertex_mean)

    xs = F.transform(v, lambda p: p["x"])
    ys = F.transform(v, lambda p: p["y"])
    return polygons.withColumns(
        {
            "area": F.abs(area),
            "signed_area": area,
            "centroid_x": _centroid("x"),
            "centroid_y": _centroid("y"),
            "bbox_w": F.array_min(xs),
            "bbox_e": F.array_max(xs),
            "bbox_s": F.array_min(ys),
            "bbox_n": F.array_max(ys),
        }
    )
