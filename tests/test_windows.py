"""rolling_window / expanding_window goldens (verde coordinates.py doctests)."""

import numpy as np
import numpy.testing as npt
import pandas as pd
from pyspark.sql import functions as F

from verde_spark.coordinates import grid_coordinates
from verde_spark.operators.windows import expanding_window, rolling_window


def _grid_df(spark):
    return grid_coordinates(spark, (-5, -1, 6, 10), spacing=1).cache()


def test_rolling_window_doctest(spark):
    # verde coordinates.py:1006-1066: 5x5 grid, size=2, spacing=2 →
    # 2x2 windows centered at easting [-4,-2] x northing [7,9], 9 points each
    df = _grid_df(spark)
    out, grid = rolling_window(df, size=2, spacing=2)
    pdf = out.toPandas()
    centers = (
        pdf.groupby("window")[["center_easting", "center_northing"]].first().sort_index()
    )
    npt.assert_allclose(centers["center_easting"], [-4.0, -2.0, -4.0, -2.0])
    npt.assert_allclose(centers["center_northing"], [7.0, 7.0, 9.0, 9.0])
    sizes = pdf.groupby("window").size()
    assert sizes.tolist() == [9, 9, 9, 9]
    w0 = pdf[pdf["window"] == 0].sort_values(["northing", "easting"])
    npt.assert_allclose(w0["easting"], [-5, -4, -3] * 3)
    npt.assert_allclose(w0["northing"], np.repeat([6.0, 7.0, 8.0], 3))


def test_rolling_window_explicit_region(spark):
    # windows limited to a sub-region of a larger grid stay in place
    big = grid_coordinates(spark, (-10, 5, 0, 20), spacing=1)
    out, _ = rolling_window(big, size=2, spacing=2, region=(-5, -1, 6, 10))
    centers = (
        out.select("window", "center_easting", "center_northing")
        .distinct()
        .orderBy("window")
        .toPandas()
    )
    npt.assert_allclose(centers["center_easting"], [-4.0, -2.0, -4.0, -2.0])
    npt.assert_allclose(centers["center_northing"], [7.0, 7.0, 9.0, 9.0])


def test_expanding_window(spark):
    df = _grid_df(spark)
    out = expanding_window(df, center=(-3.0, 8.0), sizes=[2, 4]).toPandas()
    n_size0 = (out["min_size_idx"] <= 0).sum()
    n_size1 = (out["min_size_idx"] <= 1).sum()
    assert n_size0 == 9  # cheb <= 1
    assert n_size1 == 25  # cheb <= 2: whole grid
    assert out["min_size_idx"].notna().sum() == 25
