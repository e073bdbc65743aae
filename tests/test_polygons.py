"""Point-in-polygon predicate + join — north-rule capability with no verde
counterpart (verde only has the convex hull special case).  Checked
against an independent NumPy PNPOLY implementation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.polygons import (
    point_in_polygon,
    point_in_polygon_expr,
    polygon_join,
    polygon_literal,
)

# concave "arrow" polygon, no horizontal edges
ARROW = [(0.0, 0.1), (4.0, 1.1), (2.0, 3.2), (5.0, 5.3), (1.0, 6.4), (-1.0, 3.3)]


def pnpoly(x, y, verts):
    """Classic even-odd ray crossing (independent reference)."""
    inside = np.zeros_like(x, dtype=bool)
    n = len(verts)
    for i in range(n):
        ax, ay = verts[i]
        bx, by = verts[(i + 1) % n]
        straddles = (ay > y) != (by > y)
        xcross = ax + (bx - ax) * (y - ay) / np.where(by == ay, np.inf, by - ay)
        inside ^= straddles & (x < xcross)
    return inside


def test_point_in_polygon_matches_reference(spark):
    rng = np.random.RandomState(0)
    x = rng.uniform(-2, 6, 500)
    y = rng.uniform(-1, 7, 500)
    want = pnpoly(x, y, ARROW)
    assert 50 < want.sum() < 450  # the fixture actually discriminates
    df = spark.createDataFrame(pd.DataFrame({"easting": x, "northing": y}))
    got = (
        point_in_polygon(df, ARROW)
        .orderBy("easting")
        .select("inside")
        .toPandas()["inside"]
        .to_numpy()
    )
    order = np.argsort(x)
    np.testing.assert_array_equal(got, want[order])


def test_polygon_join_methods_agree(spark):
    rng = np.random.RandomState(1)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": np.arange(400),
                "easting": rng.uniform(-2, 12, 400),
                "northing": rng.uniform(-2, 12, 400),
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["arrow", "diamond"],
                "vertices": [
                    [{"x": float(x), "y": float(y)} for x, y in ARROW],
                    [
                        {"x": 8.0, "y": 5.1},
                        {"x": 11.0, "y": 8.2},
                        {"x": 8.0, "y": 11.3},
                        {"x": 5.0, "y": 8.4},
                    ],
                ],
            }
        ),
        schema="poly_id string, vertices array<struct<x:double,y:double>>",
    )
    a = (
        polygon_join(pts, polys, method="bbox")
        .select("pid", "poly_id")
        .toPandas()
        .sort_values(["pid", "poly_id"])
        .reset_index(drop=True)
    )
    b = (
        polygon_join(pts, polys, method="cells")
        .select("pid", "poly_id")
        .toPandas()
        .sort_values(["pid", "poly_id"])
        .reset_index(drop=True)
    )
    assert len(a) > 10
    pd.testing.assert_frame_equal(a, b)


def test_polygon_join_semi_anti_partition(spark):
    rng = np.random.RandomState(2)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": np.arange(300),
                "easting": rng.uniform(-2, 6, 300),
                "northing": rng.uniform(-1, 7, 300),
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["arrow"],
                "vertices": [[{"x": float(x), "y": float(y)} for x, y in ARROW]],
            }
        ),
        schema="poly_id string, vertices array<struct<x:double,y:double>>",
    )
    semi = polygon_join(pts, polys, how="semi").select("pid").toPandas()["pid"]
    anti = polygon_join(pts, polys, how="anti").select("pid").toPandas()["pid"]
    assert len(semi) + len(anti) == 300
    assert set(semi) & set(anti) == set()
    assert len(semi) > 30


def test_zonal_stats(spark):
    from verde_spark.operators.polygons import zonal_stats

    rng = np.random.RandomState(3)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "easting": rng.uniform(-2, 6, 800),
                "northing": rng.uniform(-1, 7, 800),
                "value": rng.uniform(0, 10, 800),
            }
        )
    )
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": ["arrow"],
                "vertices": [[{"x": float(x), "y": float(y)} for x, y in ARROW]],
            }
        ),
        schema="poly_id string, vertices array<struct<x:double,y:double>>",
    )
    got = zonal_stats(pts, polys, "value", stats=("count", "mean", "sum")).toPandas()
    # reference via pnpoly
    pdf = pts.toPandas()
    mask = pnpoly(pdf["easting"].to_numpy(), pdf["northing"].to_numpy(), ARROW)
    assert got.loc[0, "count_value"] == mask.sum()
    np.testing.assert_allclose(got.loc[0, "mean_value"], pdf["value"][mask].mean())
    np.testing.assert_allclose(got.loc[0, "sum_value"], pdf["value"][mask].sum())


def test_point_in_polygon_random_star_polygons(spark):
    # randomized robustness: 20 random star-shaped (simple) polygons with
    # 5-12 vertices, all tested against the independent PNPOLY reference in
    # ONE Spark job (rows = polygon x point pairs)
    rng = np.random.RandomState(11)
    polys = []
    for pid in range(20):
        nv = rng.randint(5, 13)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 3.0, nv)
        cx, cy = rng.uniform(-5, 5, 2)
        verts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a, r in zip(ang, rad)]
        polys.append((pid, verts))
    pts = rng.uniform(-8, 8, (200, 2))

    rows = []
    for pid, verts in polys:
        for i, (x, y) in enumerate(pts):
            rows.append((pid, i, float(x), float(y)))
    pair_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "qid", "easting", "northing"])
    )
    poly_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [pid for pid, _ in polys],
                "vertices": [
                    [{"x": float(x), "y": float(y)} for x, y in verts]
                    for _, verts in polys
                ],
            }
        ),
        schema="pid bigint, vertices array<struct<x:double,y:double>>",
    )
    got = (
        pair_df.join(poly_df, "pid")
        .withColumn(
            "inside",
            point_in_polygon_expr(
                F.col("easting"), F.col("northing"), F.col("vertices")
            ),
        )
        .select("pid", "qid", "inside")
        .toPandas()
        .sort_values(["pid", "qid"])
        .reset_index(drop=True)
    )
    want = np.concatenate(
        [pnpoly(pts[:, 0], pts[:, 1], verts) for _, verts in polys]
    )
    np.testing.assert_array_equal(got["inside"].to_numpy(), want)


def test_zonal_stats_requires_polygon_id_column(spark):
    import pandas as pd
    import pytest as _pytest

    from verde_spark.operators.polygons import zonal_stats

    pts = spark.createDataFrame(
        pd.DataFrame({"easting": [0.5], "northing": [0.5], "v": [1.0]})
    )
    polys = spark.createDataFrame(
        [([{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0}, {"x": 0.0, "y": 1.0}],)],
        schema="vertices array<struct<x:double,y:double>>",
    )
    with _pytest.raises(ValueError, match="id column"):
        zonal_stats(pts, polys, "v")


def test_polygon_properties(spark):
    from verde_spark.operators.polygons import polygon_literal, polygon_properties

    # CCW unit square offset to (2,3) + a CW triangle
    square = [(2.0, 3.0), (3.0, 3.0), (3.0, 4.0), (2.0, 4.0)]
    tri = [(0.0, 0.0), (0.0, 2.0), (4.0, 0.0)]  # CW → negative signed area
    df = spark.range(2).withColumn(
        "vertices",
        F.when(F.col("id") == 0, polygon_literal(square)).otherwise(
            polygon_literal(tri)
        ),
    )
    got = polygon_properties(df).orderBy("id").toPandas()
    assert got["area"].tolist() == [1.0, 4.0]
    assert got["signed_area"].tolist() == [1.0, -4.0]
    assert got["centroid_x"].tolist() == [2.5, pytest.approx(4 / 3)]
    assert got["centroid_y"].tolist() == [3.5, pytest.approx(2 / 3)]
    assert got[["bbox_w", "bbox_e", "bbox_s", "bbox_n"]].values.tolist() == [
        [2.0, 3.0, 3.0, 4.0],
        [0.0, 4.0, 0.0, 2.0],
    ]
    # zero Python, zero shuffle: pure projection plan
    plan = polygon_properties(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_polygon_properties_degenerate(spark):
    from verde_spark.operators.polygons import polygon_literal, polygon_properties

    seg = [(0.0, 0.0), (4.0, 2.0)]  # 2 vertices: zero area
    df = spark.range(1).withColumn("vertices", polygon_literal(seg))
    got = polygon_properties(df).toPandas()
    assert got["area"][0] == 0.0
    assert got["centroid_x"][0] == 2.0 and got["centroid_y"][0] == 1.0


# ---------------------------------------------------------------------------
# rasterize (vector→raster)
# ---------------------------------------------------------------------------

TRI = [(1.0, 0.2), (6.0, 2.3), (2.0, 5.6)]


def _poly_df(spark, polys):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "val": [v for v, _ in polys],
                "vertices": [
                    [{"x": float(x), "y": float(y)} for x, y in verts]
                    for _, verts in polys
                ],
            }
        ),
        schema="val double, vertices array<struct<x:double,y:double>>",
    )


def _raster_reference(region, shape, polys, agg, fill):
    w, e, s, n = region
    xs = np.linspace(w, e, shape[1])
    ys = np.linspace(s, n, shape[0])
    xx, yy = np.meshgrid(xs, ys)
    out = np.full(shape, np.nan)
    hits = np.zeros(shape)
    for val, verts in polys:
        m = pnpoly(xx, yy, verts)
        if agg == "max":
            out[m] = np.fmax(out[m], val)
        elif agg == "sum":
            out[m] = np.where(np.isnan(out[m]), val, out[m] + val)
        elif agg == "count":
            hits[m] += 1
    if agg == "count":
        out = np.where(hits > 0, hits, np.nan)
    if fill is not None:
        out = np.where(np.isnan(out), fill, out)
    return out


@pytest.mark.parametrize("method", ["broadcast", "cells"])
@pytest.mark.parametrize("agg", ["max", "sum", "count"])
def test_rasterize_matches_reference(spark, method, agg):
    from verde_spark.operators.polygons import rasterize

    region = (-2.0, 7.0, -1.0, 7.0)
    shape = (19, 19)
    polys = [(2.0, ARROW), (5.0, TRI)]
    want = _raster_reference(region, shape, polys, agg, fill=0.0)
    got = (
        rasterize(
            _poly_df(spark, polys), region, shape=shape,
            value_col="val", fill=0.0, agg=agg, method=method,
        )
        .orderBy("iy", "ix")
        .toPandas()["value"]
        .to_numpy()
        .reshape(shape)
    )
    assert (want > 0).any() and (want == 0).any()  # non-vacuous
    np.testing.assert_array_equal(got, want)
    if agg == "max":  # overlap region must show the larger burn value
        assert (want == 5.0).any() and (want == 2.0).any()


def test_rasterize_no_value_col_and_null_fill(spark):
    from verde_spark.operators.polygons import rasterize

    region = (-2.0, 7.0, -1.0, 7.0)
    got = rasterize(
        _poly_df(spark, [(1.0, TRI)]).drop("val"), region, shape=(9, 9)
    ).toPandas()
    inside = got["value"].notna()
    assert inside.any() and (~inside).any()
    assert (got.loc[inside, "value"] == 1.0).all()


def test_rasterize_empty_polygon_table(spark):
    from verde_spark.operators.polygons import rasterize

    empty = _poly_df(spark, []).limit(0)
    got = rasterize(empty, (0.0, 1.0, 0.0, 1.0), shape=(4, 4), fill=-1.0)
    vals = got.toPandas()["value"]
    assert len(vals) == 16 and (vals == -1.0).all()


def test_rasterize_broadcast_is_zero_shuffle(spark):
    from verde_spark.operators.polygons import rasterize

    plan = (
        rasterize(_poly_df(spark, [(1.0, TRI)]), (0.0, 6.0, 0.0, 6.0), shape=(50, 50), value_col="val")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "Python" not in plan


def test_rasterize_broadcast_null_burn_value(spark):
    # ADVICE r3: a NULL in value_col crashed the broadcast path (None in
    # the sort key); spec'd behavior: null-valued polygons burn nothing,
    # matching the cells path where SQL aggregates ignore NULL values
    import pandas as pd

    from verde_spark.operators.polygons import rasterize

    region = (-2.0, 7.0, -1.0, 7.0)
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "val": [3.0, None],
                "vertices": [
                    [{"x": float(x), "y": float(y)} for x, y in TRI],
                    [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0}, {"x": 0.5, "y": 1.0}],
                ],
            }
        )
    )
    got = rasterize(polys, region, shape=(9, 9), value_col="val").toPandas()
    inside = got["value"].notna()
    assert inside.any()
    assert (got.loc[inside, "value"] == 3.0).all()  # only the non-null burns


def test_degenerate_empty_polygon_contains_nothing(spark):
    """An empty vertex array (upstream geometry-cleaning artifact) is
    not-inside for every point — not a negative-length slice crash that
    fails the whole join (review r5)."""
    from verde_spark.operators.polygons import point_in_polygon_expr

    polys = spark.createDataFrame(
        [
            (1, [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]),
            (2, []),
        ],
        "poly_id long, vertices array<struct<x double, y double>>",
    )
    pts = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    got = (
        pts.crossJoin(polys)
        .select(
            "poly_id",
            point_in_polygon_expr(
                F.col("x"), F.col("y"), F.col("vertices")
            ).alias("inside"),
        )
        .collect()
    )
    by_id = {r["poly_id"]: r["inside"] for r in got}
    assert by_id[1] is True and by_id[2] is False
