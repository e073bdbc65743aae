"""Block reduction goldens ported from verde tests/test_blockreduce.py."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from verde_spark import block_mean, block_reduce, scatter_points
from verde_spark.coordinates import grid_coordinates as grid_df


def _constant_grid_df(spark, region=(-5, 0, 5, 10), spacing=0.1, value=20.0):
    nodes = grid_df(spark, region, spacing=spacing, pixel_register=True)
    from pyspark.sql import functions as F

    return nodes.withColumn("scalars", F.lit(value))


def test_block_reduce_constant_grid(spark):
    # verde tests/test_blockreduce.py:19-31
    df = _constant_grid_df(spark)
    out, grid = block_reduce(df, "mean", spacing=1, region=(-5, 0, 5, 10))
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["scalars"], 20.0)
    npt.assert_allclose(pdf["easting"][:5], np.linspace(-4.5, -0.5, 5))
    npt.assert_allclose(pdf["northing"][::5], np.linspace(5.5, 9.5, 5))


def test_block_reduce_shape(spark):
    # verde tests/test_blockreduce.py:34-46
    df = _constant_grid_df(spark)
    out, _ = block_reduce(df, "mean", shape=(5, 5), region=(-5, 0, 5, 10))
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["scalars"], 20.0)
    npt.assert_allclose(pdf["easting"][:5], np.linspace(-4.5, -0.5, 5))


def test_block_reduce_scatter_center_coordinates(spark):
    # verde tests/test_blockreduce.py:49-62
    region = (-5, 0, 5, 10)
    east, north = scatter_points(region, 10000, random_state=0)
    df = spark.createDataFrame(
        pd.DataFrame({"easting": east, "northing": north, "scalars": 20.0})
    )
    out, _ = block_reduce(df, "mean", spacing=1, region=region, center_coordinates=True)
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["scalars"], 20.0)
    npt.assert_allclose(pdf["easting"][:5], np.linspace(-4.5, -0.5, 5))
    npt.assert_allclose(pdf["northing"][::5], np.linspace(5.5, 9.5, 5))


def test_block_reduce_weights_outlier(spark):
    # verde tests/test_blockreduce.py:65-81: zero-weight outlier is ignored
    region = (-5, 0, 5, 10)
    size = 10000
    east, north = scatter_points(region, size, random_state=0)
    data = np.full(size, 20.0)
    weights = np.ones(size)
    data[1000] = 10000.0
    weights[1000] = 0.0
    df = spark.createDataFrame(
        pd.DataFrame({"easting": east, "northing": north, "scalars": data, "weight": weights})
    )
    out, _ = block_reduce(df, "mean", spacing=1, region=region, weight_cols=["weight"])
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["scalars"], 20.0)


def test_block_reduce_extra_coords_drop_and_keep(spark):
    # verde tests/test_blockreduce.py:84-120
    df = _constant_grid_df(spark)
    from pyspark.sql import functions as F

    df = df.withColumn("down", F.lit(70.0)).withColumn("time", F.lit(1.0))
    out, _ = block_reduce(
        df, "mean", spacing=1, region=(-5, 0, 5, 10), extra_coord_cols=["down", "time"]
    )
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["down"], 70.0)
    npt.assert_allclose(pdf["time"], 1.0)


def test_block_reduce_median(spark):
    df = _constant_grid_df(spark)
    out, _ = block_reduce(df, "median", spacing=1, region=(-5, 0, 5, 10))
    pdf = out.toPandas()
    npt.assert_allclose(pdf["scalars"], 20.0)


def test_blockmean_noweights(spark):
    # verde tests/test_blockreduce.py:188-210 (mean + variance weights); on
    # constant data all variances are 0 → all weights 1
    df = _constant_grid_df(spark)
    out, _ = block_mean(df, spacing=1, region=(-5, 0, 5, 10))
    pdf = out.toPandas()
    assert len(pdf) == 25
    npt.assert_allclose(pdf["scalars"], 20.0)
    npt.assert_allclose(pdf["weight_scalars"], 1.0)


def test_blockmean_uncertainty_mode(spark):
    # verde tests/test_blockreduce.py:238-260: 4x4 grid on (-2,0,6,8)
    # spacing=0.5 pixel-registered; uncertainty=2 in the first 2x2 block.
    nodes = grid_df(spark, (-2, 0, 6, 8), spacing=0.5, pixel_register=True).toPandas()
    uncertainty = np.ones(len(nodes))
    first_block = (nodes["easting"] < -1) & (nodes["northing"] < 7)
    uncertainty[first_block.to_numpy()] = 2.0
    pdf = pd.DataFrame(
        {
            "easting": nodes["easting"],
            "northing": nodes["northing"],
            "scalars": 102.4,
            "weight": 1.0 / uncertainty**2,
        }
    )
    df = spark.createDataFrame(pdf)
    out, _ = block_mean(
        df, spacing=1, region=(-2, 0, 6, 8), weight_cols=["weight"], uncertainty=True
    )
    got = out.toPandas()
    assert len(got) == 4
    npt.assert_allclose(got["scalars"], 102.4)
    npt.assert_allclose(sorted(got["weight_scalars"]), [0.25, 1.0, 1.0, 1.0])


def test_blockmean_weighted_variance_mode(spark):
    # verde tests/test_blockreduce.py:263-284: same fixture, uncertainty=False
    # → weighted variance is exactly 0 (constant data) → all weights 1
    nodes = grid_df(spark, (-2, 0, 6, 8), spacing=0.5, pixel_register=True).toPandas()
    uncertainty = np.ones(len(nodes))
    first_block = (nodes["easting"] < -1) & (nodes["northing"] < 7)
    uncertainty[first_block.to_numpy()] = 2.0
    pdf = pd.DataFrame(
        {
            "easting": nodes["easting"],
            "northing": nodes["northing"],
            "scalars": 102.4,
            "weight": 1.0 / uncertainty**2,
        }
    )
    df = spark.createDataFrame(pdf)
    out, _ = block_mean(
        df, spacing=1, region=(-2, 0, 6, 8), weight_cols=["weight"], uncertainty=False
    )
    got = out.toPandas()
    assert len(got) == 4
    npt.assert_allclose(got["scalars"], 102.4)
    npt.assert_allclose(got["weight_scalars"], 1.0)


def test_blockmean_requires_weights_for_uncertainty(spark):
    df = _constant_grid_df(spark)
    with pytest.raises(ValueError):
        block_mean(df, spacing=1, uncertainty=True)


def test_block_median_approx_close_to_exact(spark):
    """median_approx (percentile_approx sketch, map-side mergeable) tracks
    the exact median on every block."""
    import numpy as np

    rng = np.random.RandomState(3)
    n = 4000
    pdf = pd.DataFrame(
        {
            "easting": rng.uniform(0, 10, n),
            "northing": rng.uniform(0, 10, n),
            "scalars": rng.normal(size=n) * 50,
        }
    )
    df = spark.createDataFrame(pdf)
    exact, _ = block_reduce(df, "median", spacing=2.5, region=(0, 10, 0, 10))
    approx, _ = block_reduce(df, "median_approx", spacing=2.5, region=(0, 10, 0, 10))
    e = exact.orderBy("block").toPandas()["scalars"].to_numpy()
    a = approx.orderBy("block").toPandas()["scalars"].to_numpy()
    # percentile_approx returns an actual sample; the exact even-count
    # median interpolates between the two middle samples — the gap is
    # bounded by the local sample spacing (~N(0,50)/250 per block ≈ 1-2)
    np.testing.assert_allclose(a, e, atol=2.5)
    # and the plan keeps the map-side partial before the exchange
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile_approx" in plan


def test_block_reduce_numpy_callable_normalizes(spark):
    """Reference API form BlockReduce(np.median, ...): known numpy
    callables route to the native JVM aggregate — identical output to the
    string form (blockreduce.py:100-117 takes any callable)."""
    e, n = scatter_points((-5, 0, 5, 10), 400, random_state=7)
    pdf = pd.DataFrame({"easting": e, "northing": n,
                        "scalars": np.sin(e) + np.cos(n)})
    df = spark.createDataFrame(pdf)
    by_str, _ = block_reduce(df, "median", spacing=1.0)
    by_np, _ = block_reduce(df, np.median, spacing=1.0)
    pd.testing.assert_frame_equal(by_np.toPandas(), by_str.toPandas())


def test_block_reduce_custom_callable_fallback(spark):
    """Arbitrary callables run through the grouped-Arrow fallback and
    match a pandas groupby oracle; weighted form passes weights= like the
    reference's attach_weights (blockreduce.py:19-31)."""

    def trimmed_range(values, weights=None):
        if weights is not None:
            return float(np.average(values, weights=weights))
        return float(np.max(values) - np.min(values))

    e, n = scatter_points((-5, 0, 5, 10), 300, random_state=3)
    rng = np.random.RandomState(0)
    pdf = pd.DataFrame({"easting": e, "northing": n,
                        "scalars": np.sin(e) * n, "w": rng.uniform(1, 2, e.size)})
    df = spark.createDataFrame(pdf)

    out, grid = block_reduce(df, trimmed_range, spacing=2.5)
    got = out.toPandas().set_index("block")
    ix = np.clip(np.floor((e - (grid.east.start - grid.east.step / 2))
                          / grid.east.step).astype(int), 0, grid.n_east - 1)
    iy = np.clip(np.floor((n - (grid.north.start - grid.north.step / 2))
                          / grid.north.step).astype(int), 0, grid.n_north - 1)
    lab = iy * grid.n_east + ix
    for b in np.unique(lab):
        m = lab == b
        npt.assert_allclose(got.loc[b, "scalars"],
                            pdf["scalars"][m].max() - pdf["scalars"][m].min())
        npt.assert_allclose(got.loc[b, "easting"],
                            pdf["easting"][m].max() - pdf["easting"][m].min())

    wout, _ = block_reduce(df, trimmed_range, spacing=2.5, weight_cols=("w",))
    wgot = wout.toPandas().set_index("block")
    for b in np.unique(lab):
        m = lab == b
        npt.assert_allclose(
            wgot.loc[b, "scalars"],
            np.average(pdf["scalars"][m], weights=pdf["w"][m]),
        )
