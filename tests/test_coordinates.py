"""Coordinate generation + block split — golden values from verde's
doctests/tests (verde coordinates.py doctests, tests/test_coordinates.py)."""

import numpy as np
import numpy.testing as npt
import pytest
from pyspark.sql import functions as F

from verde_spark import (
    BlockGrid,
    check_region,
    grid_coordinates,
    inside,
    line_coordinates,
    longitude_continuity,
    pad_region,
    profile_coordinates,
    scatter_points,
    spacing_to_size,
    shape_to_spacing,
)


def test_line_coordinates_goldens():
    # verde coordinates.py:236-272 doctests
    npt.assert_allclose(line_coordinates(0, 5, spacing=2.5), [0.0, 2.5, 5.0])
    npt.assert_allclose(line_coordinates(0, 10, size=5), [0.0, 2.5, 5.0, 7.5, 10.0])
    npt.assert_allclose(line_coordinates(0, 10, spacing=2.5), [0.0, 2.5, 5.0, 7.5, 10.0])
    npt.assert_allclose(line_coordinates(0, 10, spacing=2.4), [0.0, 2.5, 5.0, 7.5, 10.0])
    npt.assert_allclose(
        line_coordinates(0, 10, spacing=2.4, adjust="region"), [0.0, 2.4, 4.8, 7.2, 9.6]
    )
    npt.assert_allclose(line_coordinates(0, 10, spacing=2.6), [0.0, 2.5, 5.0, 7.5, 10.0])
    npt.assert_allclose(
        line_coordinates(0, 10, spacing=2.6, adjust="region"), [0.0, 2.6, 5.2, 7.8, 10.4]
    )
    npt.assert_allclose(
        line_coordinates(0, 10, spacing=2.5, pixel_register=True), [1.25, 3.75, 6.25, 8.75]
    )
    npt.assert_allclose(
        line_coordinates(0, 10, size=5, pixel_register=True), [1.0, 3.0, 5.0, 7.0, 9.0]
    )


def test_spacing_to_size():
    assert spacing_to_size(0, 10, 2.5, "spacing") == (5, 10)
    assert spacing_to_size(0, 10, 2.6, "region") == (5, 10.4)
    # single point bumps to 2 (verde coordinates.py:633-634)
    assert spacing_to_size(0, 1, 10, "spacing")[0] == 2


def test_shape_to_spacing():
    assert shape_to_spacing([0, 10, -5, 1], (7, 11)) == (1.0, 1.0)
    # verde's doctest prints "0.5, 1.0" via {:.1f} formatting — the exact
    # value is (1-(-5))/13 = 6/13.
    npt.assert_allclose(shape_to_spacing([0, 10, -5, 1], (14, 11)), (6 / 13, 1.0))
    spacing = shape_to_spacing([-0.5, 10.5, -5.5, 1.5], (7, 11), pixel_register=True)
    npt.assert_allclose(spacing, (1.0, 1.0))


def test_check_and_pad_region():
    with pytest.raises(ValueError):
        check_region((1, 2, 3))
    with pytest.raises(ValueError):
        check_region((2, 1, 3, 4))
    assert pad_region((0, 1, -1, 0), 1) == (-1, 2, -2, 1)
    assert pad_region((0, 1, -1, 0), (2, 1)) == (-1, 2, -3, 2)


def test_grid_coordinates_df(spark):
    # 6x6 grid-line registered grid of (-5, 0, 5, 10) spacing 1
    nodes = grid_coordinates(spark, (-5, 0, 5, 10), spacing=1).orderBy("iy", "ix").toPandas()
    assert len(nodes) == 36
    npt.assert_allclose(sorted(nodes["easting"].unique()), np.linspace(-5, 0, 6))
    npt.assert_allclose(sorted(nodes["northing"].unique()), np.linspace(5, 10, 6))
    # pixel registration: centers, one fewer per dim
    px = grid_coordinates(spark, (-5, 0, 5, 10), spacing=1, pixel_register=True).toPandas()
    assert len(px) == 25
    npt.assert_allclose(sorted(px["easting"].unique()), np.linspace(-4.5, -0.5, 5))
    npt.assert_allclose(sorted(px["northing"].unique()), np.linspace(5.5, 9.5, 5))


def test_block_split_doctest_labels(spark):
    # verde coordinates.py:906-931 doctest: 6x6 grid, block spacing 2.5
    import pandas as pd

    e, n = np.meshgrid(np.linspace(-5, 0, 6), np.linspace(5, 10, 6))
    df = spark.createDataFrame(pd.DataFrame({"easting": e.ravel(), "northing": n.ravel()}))
    grid = BlockGrid.from_region((-5, 0, 5, 10), spacing=2.5)
    ce, cn = grid.centers()
    npt.assert_allclose(ce, [-3.75, -1.25, -3.75, -1.25])
    npt.assert_allclose(cn, [6.25, 6.25, 8.75, 8.75])
    labels = (
        df.withColumn("block", grid.label_expr())
        .orderBy("northing", "easting")
        .select("block")
        .toPandas()["block"]
        .to_numpy()
    )
    expected = np.array(
        [[0, 0, 0, 1, 1, 1]] * 3 + [[2, 2, 2, 3, 3, 3]] * 3
    ).ravel()
    npt.assert_array_equal(labels, expected)
    # shape variant: (4, 2) blocks
    grid2 = BlockGrid.from_region((-5, 0, 5, 10), shape=(4, 2))
    ce2, cn2 = grid2.centers()
    npt.assert_allclose(ce2, [-3.75, -1.25] * 4)
    npt.assert_allclose(cn2, np.repeat([5.625, 6.875, 8.125, 9.375], 2))
    labels2 = (
        df.withColumn("block", grid2.label_expr())
        .orderBy("northing", "easting")
        .select("block")
        .toPandas()["block"]
        .to_numpy()
    )
    expected2 = np.array(
        [[0, 0, 0, 1, 1, 1]] * 2
        + [[2, 2, 2, 3, 3, 3]]
        + [[4, 4, 4, 5, 5, 5]]
        + [[6, 6, 6, 7, 7, 7]] * 2
    ).ravel()
    npt.assert_array_equal(labels2, expected2)


def test_inside(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"easting": [-1.0, 0.0, 1.0, 2.0], "northing": [5.0, 6.0, 11.0, 7.0]})
    )
    got = df.filter(inside((-5, 0, 5, 10))).toPandas()
    npt.assert_allclose(sorted(got["easting"]), [-1.0, 0.0])


def test_scatter_points_seeded():
    east, north = scatter_points((-5, 0, 5, 10), 100, random_state=0)
    rng = np.random.RandomState(0)
    npt.assert_allclose(east, rng.uniform(-5, 0, 100))
    npt.assert_allclose(north, rng.uniform(5, 10, 100))


def test_profile_coordinates():
    (east, north), dist = profile_coordinates((1, 10), (1, 20), size=11)
    npt.assert_allclose(east, np.ones(11))
    npt.assert_allclose(north, np.linspace(10, 20, 11))
    npt.assert_allclose(dist, np.linspace(0, 10, 11))


def test_longitude_continuity(spark):
    import pandas as pd

    region, _ = longitude_continuity([350, 10, -10, 10])
    assert region[:2] == (-10, 10)
    # coordinate shift applied via the returned expression
    df = spark.createDataFrame(pd.DataFrame({"longitude": [355.0, 5.0, 180.0]}))
    new_region, lon_expr = longitude_continuity([350, 10, -10, 10], "longitude")
    got = df.select(lon_expr.alias("lon")).toPandas()["lon"].to_numpy()
    npt.assert_allclose(got, [-5.0, 5.0, -180.0])
