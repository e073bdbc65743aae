"""Direct parity against the REFERENCE implementation.

``verde_ref.load_reference()`` imports the actual reference package from
/root/reference (with minimal dependency stand-ins — see verde_ref.py),
runs its own NumPy/pandas code on shared fixtures, and these tests assert
our Spark operators produce the same outputs.  This is the strongest form
of SURVEY §5's "Spark output vs verde oracle on the same fixture".
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_ref import load_reference

import verde_spark as vs
from verde_spark.coordinates import block_split, grid_coordinates

vd = load_reference()


def _scatter_df(spark, e, n, d, w=None):
    cols = {"easting": e, "northing": n, "scalars": d}
    if w is not None:
        cols["weight"] = w
    return spark.createDataFrame(pd.DataFrame(cols))


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.RandomState(42)
    e = rng.uniform(0, 10, 300)
    n = rng.uniform(-10, 0, 300)
    d = np.sin(e) * np.cos(n) * 100.0
    w = rng.uniform(0.1, 2.0, 300)
    return e, n, d, w


def test_ref_spacing_to_size_and_grid_coordinates(spark):
    from verde.coordinates import spacing_to_size

    for args in [(0, 10, 2.3, "spacing"), (0, 10, 2.3, "region"),
                 (-7, 3.3, 1.7, "spacing"), (0, 1, 2.0, "spacing")]:
        ours = vs.spacing_to_size(*args)
        theirs = spacing_to_size(*args)
        assert ours == tuple(np.atleast_1d(theirs)) or ours == theirs

    for kwargs in [dict(spacing=2.5), dict(shape=(4, 7)),
                   dict(spacing=(1.5, 2.5)), dict(spacing=2.5, pixel_register=True)]:
        ge, gn = vd.grid_coordinates((0, 10, -10, 0), **kwargs)
        ours = (
            grid_coordinates(spark, (0, 10, -10, 0), **kwargs)
            .orderBy("iy", "ix")
            .toPandas()
        )
        npt.assert_allclose(ours["easting"], ge.ravel(), rtol=0, atol=0)
        npt.assert_allclose(ours["northing"], gn.ravel(), rtol=0, atol=0)


def test_ref_block_split_labels(spark, fixture):
    e, n, d, _ = fixture
    region = (0, 10, -10, 0)
    _, labels = vd.block_split((e, n), spacing=2.5, region=region)
    out, _ = block_split(_scatter_df(spark, e, n, d), spacing=2.5, region=region)
    got = out.orderBy("easting").select("block").toPandas()["block"].to_numpy()
    order = np.argsort(e, kind="stable")
    npt.assert_array_equal(got, labels[order])


def test_ref_block_reduce_mean_median(spark, fixture):
    e, n, d, _ = fixture
    region = (0, 10, -10, 0)
    for red_np, red_str in [(np.mean, "mean"), (np.median, "median")]:
        (ce, cn), dd = vd.BlockReduce(red_np, spacing=2.5, region=region).filter((e, n), d)
        ours, _ = vs.block_reduce(
            _scatter_df(spark, e, n, d), red_str, spacing=2.5, region=region
        )
        pdf = ours.toPandas()  # ordered by block label like pandas groupby
        npt.assert_allclose(pdf["easting"], ce, rtol=1e-12)
        npt.assert_allclose(pdf["northing"], cn, rtol=1e-12)
        npt.assert_allclose(pdf["scalars"], dd, rtol=1e-12)


def test_ref_block_mean_three_modes(spark, fixture):
    e, n, d, w = fixture
    region = (0, 10, -10, 0)
    # (a) unweighted: mean + sample-variance weights
    (ce, cn), dd, ww = vd.BlockMean(spacing=2.5, region=region).filter((e, n), d)
    ours, _ = vs.block_mean(_scatter_df(spark, e, n, d), spacing=2.5, region=region)
    pdf = ours.toPandas()
    npt.assert_allclose(pdf["scalars"], dd, rtol=1e-12)
    npt.assert_allclose(pdf["weight_scalars"], ww, rtol=1e-10)
    # (b) weighted + uncertainty propagation
    (_, _), dd, ww = vd.BlockMean(spacing=2.5, region=region, uncertainty=True).filter(
        (e, n), d, w
    )
    ours, _ = vs.block_mean(
        _scatter_df(spark, e, n, d, w), spacing=2.5, region=region,
        uncertainty=True, weight_cols=("weight",),
    )
    pdf = ours.toPandas()
    npt.assert_allclose(pdf["scalars"], dd, rtol=1e-12)
    npt.assert_allclose(pdf["weight_scalars"], ww, rtol=1e-10)
    # (c) weighted variance
    (_, _), dd, ww = vd.BlockMean(spacing=2.5, region=region, uncertainty=False).filter(
        (e, n), d, w
    )
    ours, _ = vs.block_mean(
        _scatter_df(spark, e, n, d, w), spacing=2.5, region=region,
        uncertainty=False, weight_cols=("weight",),
    )
    pdf = ours.toPandas()
    npt.assert_allclose(pdf["scalars"], dd, rtol=1e-12)
    npt.assert_allclose(pdf["weight_scalars"], ww, rtol=1e-10)


def test_ref_checkerboard(spark, fixture):
    e, n, _, _ = fixture
    cb_ref = vd.synthetic.CheckerBoard()
    want = cb_ref.predict((e * 500, n * -500))
    ours = vs.CheckerBoard()
    df = spark.createDataFrame(pd.DataFrame({"easting": e * 500, "northing": n * -500}))
    got = (
        df.withColumn("pred", ours.predict_expr())
        .orderBy("easting")
        .toPandas()["pred"]
        .to_numpy()
    )
    order = np.argsort(e * 500, kind="stable")
    npt.assert_allclose(got, want[order], rtol=1e-12)


def test_ref_trend(spark, fixture):
    e, n, _, w = fixture
    d = 5.0 + 2.0 * e - 3.0 * n + 0.5 * e * n
    ref = vd.Trend(degree=2).fit((e, n), d)
    ours = vs.Trend(degree=2).fit(_scatter_df(spark, e, n, d))
    npt.assert_allclose(ours.coef_, ref.coef_, rtol=1e-8, atol=1e-10)
    # weighted fit
    ref = vd.Trend(degree=1).fit((e, n), d, weights=w)
    ours = vs.Trend(degree=1).fit(_scatter_df(spark, e, n, d, w), weight_col="weight")
    npt.assert_allclose(ours.coef_, ref.coef_, rtol=1e-8, atol=1e-10)


def test_ref_spline(spark, fixture):
    e, n, d, w = fixture
    qe = np.linspace(1, 9, 25)
    qn = np.linspace(-9, -1, 25)
    qdf = None
    for damping, weights in [(None, None), (1e-8, None), (1e-6, w)]:
        ref = vd.Spline(damping=damping).fit((e, n), d, weights=weights)
        want = ref.predict((qe, qn))
        ours = vs.Spline(damping=damping).fit(
            _scatter_df(spark, e, n, d, weights),
            weight_col="weight" if weights is not None else None,
        )
        qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
        got = (
            ours.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
        )
        npt.assert_allclose(got, want, rtol=1e-6, atol=1e-8 * np.abs(want).max())


def test_ref_kneighbors(spark, fixture):
    e, n, d, _ = fixture
    qe = np.linspace(0.5, 9.5, 40)
    qn = np.linspace(-9.5, -0.5, 40)
    for reduction_np, reduction_str in [(np.mean, "mean"), (np.median, "median")]:
        ref = vd.KNeighbors(k=4, reduction=reduction_np).fit((e, n), d)
        want = ref.predict((qe, qn))
        ours = vs.KNeighbors(k=4, reduction=reduction_str).fit(_scatter_df(spark, e, n, d))
        qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
        got = (
            ours.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
        )
        npt.assert_allclose(got, want, rtol=1e-12)


def test_ref_distance_mask(spark, fixture):
    e, n, d, _ = fixture
    qe = np.linspace(-1, 11, 30)
    qn = np.linspace(-11, 1, 30)
    want = vd.distance_mask((e, n), maxdist=1.5, coordinates=(qe, qn))
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = (
        vs.distance_mask(_scatter_df(spark, e, n, d), qdf, maxdist=1.5)
        .orderBy("easting")
        .toPandas()["in_range"]
        .to_numpy()
    )
    npt.assert_array_equal(got, want)


def test_ref_median_distance(spark, fixture):
    from verde_spark.operators.neighbors import median_distance

    e, n, d, _ = fixture
    e, n = e[:60], n[:60]
    want = vd.median_distance((e, n), k_nearest=3)
    got = (
        median_distance(_scatter_df(spark, e, n, d[:60]), k=3)
        .orderBy("easting")
        .toPandas()["median_distance"]
        .to_numpy()
    )
    order = np.argsort(e, kind="stable")
    npt.assert_allclose(got, want[order], rtol=1e-12)


def test_ref_variance_to_weights(spark):
    from verde.utils import variance_to_weights as ref_v2w

    var = np.array([0.0, 4.0, 1.0, 16.0, 1e-20, 2.5])
    want = ref_v2w(var)
    df = spark.createDataFrame(pd.DataFrame({"idx": range(len(var)), "variance": var}))
    got = (
        vs.variance_to_weights(df)
        .orderBy("idx")
        .toPandas()["weight"]
        .to_numpy()
    )
    npt.assert_allclose(got, want, rtol=1e-12)


def test_ref_rolling_window_membership(spark, fixture):
    from verde_spark.operators.windows import rolling_window

    e, n, d, _ = fixture
    region = (0, 10, -10, 0)
    coords, indices = vd.rolling_window((e, n), size=4.0, spacing=2.0, region=region)
    # reference: per-window flat index lists (row-major over window centers)
    want = {
        wi: set(idx[0])
        for wi, idx in enumerate(indices.ravel())
    }
    out, _ = rolling_window(
        _scatter_df(spark, e, n, d), size=4.0, spacing=2.0, region=region
    )
    pdf = out.select("window", "easting").toPandas()
    pos = {v: i for i, v in enumerate(e)}  # easting values are unique
    got = {}
    for wi, ee in zip(pdf["window"], pdf["easting"]):
        got.setdefault(int(wi), set()).add(pos[ee])
    assert got == {k: v for k, v in want.items() if v}
