"""Piecewise-linear (Delaunay) gridder — scipy-LinearNDInterpolator
semantics (verde scipygridder.py:115-149) without scipy."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from verde_spark.operators.linear import Linear, delaunay, linear_interpolate


def test_delaunay_square():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    tris = delaunay(pts)
    assert len(tris) == 2
    # triangles cover the square: area sums to 1
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    areas = 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1])
    )
    assert areas.sum() == pytest.approx(1.0)


def test_linear_interpolation_exact_on_plane():
    # a linear function is reproduced exactly inside the hull, NaN outside
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 10, (200, 2))
    vals = 3.0 + 2.0 * pts[:, 0] - 0.5 * pts[:, 1]
    queries = np.array([[5.0, 5.0], [2.0, 7.0], [8.0, 3.0], [50.0, 50.0]])
    got = linear_interpolate(pts, vals, queries)
    expected = 3.0 + 2.0 * queries[:, 0] - 0.5 * queries[:, 1]
    npt.assert_allclose(got[:3], expected[:3], rtol=1e-10)
    assert np.isnan(got[3])


def test_linear_gridder_distributed(spark):
    # tiled Delaunay with halo approximates the single-tile result
    rng = np.random.RandomState(1)
    e = rng.uniform(0, 10, 2000)
    n = rng.uniform(0, 10, 2000)
    vals = 3.0 + 2.0 * e - 0.5 * n
    df = spark.createDataFrame(pd.DataFrame({"easting": e, "northing": n, "scalars": vals})).cache()
    gridder = Linear(tile_spacing=5.0, halo=1.0).fit(df, region=(0, 10, 0, 10))
    out = gridder.grid(spark, region=(1, 9, 1, 9), shape=(15, 15), output_col="pred").toPandas()
    expected = 3.0 + 2.0 * out["easting"] - 0.5 * out["northing"]
    npt.assert_allclose(out["pred"], expected, rtol=1e-8)


def test_scipygridder_umbrella(spark):
    import warnings

    import pandas as pd
    from pyspark.sql import functions as F

    from verde_spark import Cubic, KNeighbors, Linear, ScipyGridder

    with pytest.raises(ValueError, match="Invalid interpolation method"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ScipyGridder(method="bogus")
    with pytest.warns(FutureWarning):
        g = ScipyGridder(method="nearest")
    assert isinstance(g.interpolator_, KNeighbors)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        assert isinstance(ScipyGridder("linear").interpolator_, Linear)
        assert isinstance(ScipyGridder("cubic").interpolator_, Cubic)

        rng = np.random.RandomState(5)
        pdf = pd.DataFrame(
            {
                "easting": rng.uniform(0, 10, 200),
                "northing": rng.uniform(0, 10, 200),
                "scalars": rng.normal(size=200),
            }
        )
        df = spark.createDataFrame(pdf)
        # nearest dispatch = KNeighbors(k=1) bit-for-bit
        a = (
            ScipyGridder("nearest")
            .fit(df)
            .grid(spark, region=(2, 8, 2, 8), shape=(6, 6), output_col="p")
            .toPandas()
            .sort_values(["iy", "ix"])
        )
        b = (
            KNeighbors(k=1)
            .fit(df)
            .grid(spark, region=(2, 8, 2, 8), shape=(6, 6), output_col="p")
            .toPandas()
            .sort_values(["iy", "ix"])
        )
        npt.assert_array_equal(a["p"].to_numpy(), b["p"].to_numpy())
