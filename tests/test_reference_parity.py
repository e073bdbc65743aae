"""Direct parity against the REFERENCE implementation.

``verde_ref.load_reference()`` imports the actual reference package from
/root/reference (with minimal dependency stand-ins — see verde_ref.py),
runs its own NumPy/pandas code on shared fixtures, and these tests assert
our Spark operators produce the same outputs.  This is the strongest form
of SURVEY §5's "Spark output vs verde oracle on the same fixture".
"""

import math

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
    # deprecated mindist fudge path (reference spline.py:414-424)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = vd.Spline(damping=1e-8, mindist=0.5).fit((e, n), d)
    want = ref.predict((qe, qn))
    ours = vs.Spline(damping=1e-8, mindist=0.5).fit(_scatter_df(spark, e, n, d))
    got = ours.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
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


def test_ref_profile_line_scatter_coordinates():
    from verde_spark.coordinates import line_coordinates, profile_coordinates, scatter_points

    (pe, pn), dist = vd.profile_coordinates((1.0, -2.0), (8.0, -9.0), size=31)
    (oe, on), odist = profile_coordinates((1.0, -2.0), (8.0, -9.0), size=31)
    npt.assert_allclose(oe, pe, rtol=0, atol=0)
    npt.assert_allclose(on, pn, rtol=0, atol=0)
    npt.assert_allclose(odist, dist, rtol=0, atol=0)

    for kwargs in [dict(size=11), dict(spacing=1.3), dict(spacing=1.3, adjust="region"),
                   dict(size=7, pixel_register=True)]:
        want = vd.line_coordinates(0, 10, **kwargs)
        got = line_coordinates(0, 10, **kwargs)
        npt.assert_allclose(got, want, rtol=0, atol=0)

    we, wn = vd.scatter_points((0, 10, -10, 0), 100, random_state=7)
    ge, gn = scatter_points((0, 10, -10, 0), 100, random_state=7)
    npt.assert_allclose(ge, we, rtol=0, atol=0)
    npt.assert_allclose(gn, wn, rtol=0, atol=0)


def test_ref_inside_and_longitude_continuity(spark, fixture):
    e, n, d, _ = fixture
    want = vd.inside((e, n), (2.0, 8.0, -8.0, -2.0))
    out = (
        _scatter_df(spark, e, n, d)
        .filter(vs.inside((2.0, 8.0, -8.0, -2.0)))
        .select("easting")
        .toPandas()["easting"]
        .to_numpy()
    )
    npt.assert_allclose(np.sort(out), np.sort(e[want]), rtol=0, atol=0)

    lon = np.array([0.0, 80.0, 180.0, 270.0, 359.0, 200.0])
    lat = np.zeros_like(lon)
    (ref_lon, _), ref_region = vd.longitude_continuity([lon, lat], region=(-20, 20, -10, 10))
    from verde_spark.coordinates import longitude_continuity

    region2, expr = longitude_continuity((-20, 20, -10, 10), "lon")
    npt.assert_allclose(tuple(region2), tuple(ref_region), rtol=0, atol=0)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon}))
    got = df.select(expr.alias("out")).toPandas()["out"].to_numpy()
    npt.assert_allclose(np.sort(got), np.sort(ref_lon), rtol=0, atol=1e-12)


def test_ref_expanding_window_membership(spark, fixture):
    from verde_spark.operators.windows import expanding_window

    e, n, d, _ = fixture
    center = (5.0, -5.0)
    sizes = [2.0, 4.0, 6.0]
    indices = vd.expanding_window((e, n), center=center, sizes=sizes)
    want = [set(ix[0]) for ix in indices]
    out = expanding_window(_scatter_df(spark, e, n, d), center=center, sizes=sizes)
    pdf = out.filter(F.col("min_size_idx").isNotNull()).select("min_size_idx", "easting").toPandas()
    pos = {v: i for i, v in enumerate(e)}
    got = [set() for _ in sizes]
    for szi, ee in zip(pdf["min_size_idx"], pdf["easting"]):
        for j in range(int(szi), len(sizes)):
            got[j].add(pos[ee])
    assert got == want


def test_ref_vector_spline2d(spark):
    rng = np.random.RandomState(3)
    e = rng.uniform(0, 5000, 150)
    n = rng.uniform(-5000, 0, 150)
    de = np.sin(e / 1000) * np.cos(n / 1000) * 10
    dn = np.cos(e / 1000) * np.sin(n / 1000) * 5
    ref = vd.VectorSpline2D(damping=1e-8).fit((e, n), (de, dn))
    qe = np.linspace(500, 4500, 20)
    qn = np.linspace(-4500, -500, 20)
    we, wn = ref.predict((qe, qn))

    from verde_spark.operators.vector import VectorSpline2D

    df = spark.createDataFrame(
        pd.DataFrame({"easting": e, "northing": n, "east_component": de, "north_component": dn})
    )
    ours = VectorSpline2D(damping=1e-8).fit(df)
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = ours.predict(qdf).orderBy("easting").toPandas()
    npt.assert_allclose(got["east_component_pred"], we, rtol=1e-6, atol=1e-8 * np.abs(we).max())
    npt.assert_allclose(got["north_component_pred"], wn, rtol=1e-6, atol=1e-8 * np.abs(wn).max())


def test_ref_chain_end_to_end(spark):
    # the EP2 pipeline through the REFERENCE vs through our engine: a verde
    # user switching engines gets the same grid values
    rng = np.random.RandomState(11)
    e = rng.uniform(0, 5000, 800)
    n = rng.uniform(-5000, 0, 800)
    cb = vd.synthetic.CheckerBoard()
    d = cb.predict((e, n)) + 20.0 + 0.003 * e - 0.002 * n
    ref_chain = vd.Chain(
        [
            ("mean", vd.BlockMean(spacing=250.0, region=(0, 5000, -5000, 0))),
            ("trend", vd.Trend(degree=1)),
            ("spline", vd.Spline(damping=1e-8)),
        ]
    ).fit((e, n), d)
    qe = np.linspace(250, 4750, 15)
    qn = np.linspace(-4750, -250, 15)
    want = ref_chain.predict((qe, qn))

    df = spark.createDataFrame(pd.DataFrame({"easting": e, "northing": n, "scalars": d}))
    ours = vs.Chain(
        [
            ("mean", vs.BlockMean(spacing=250.0, region=(0, 5000, -5000, 0))),
            ("trend", vs.Trend(degree=1)),
            ("spline", vs.Spline(damping=1e-8)),
        ]
    ).fit(df)
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = ours.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
    # the lightly-damped dense solve is ill-conditioned: 1e-10 differences in
    # the BlockMean weights amplify to ~1e-4 relative in the grid values —
    # same behavior the reference shows across BLAS builds
    npt.assert_allclose(got, want, rtol=2e-3, atol=1e-5 * np.abs(want).max())


def test_ref_block_shuffle_split(spark, fixture):
    e, n, d, _ = fixture
    X = np.column_stack([e, n])
    kwargs = dict(spacing=2.5, n_splits=3, test_size=0.2, random_state=5, balancing=5)
    ref_splits = [(set(tr), set(te)) for tr, te in vd.BlockShuffleSplit(**kwargs).split(X)]

    df = _scatter_df(spark, e, n, d)
    labeled, _ = block_split(df, spacing=2.5)
    pdf = labeled.toPandas()
    pos = {v: i for i, v in enumerate(e)}
    pt_block = {pos[ee]: b for ee, b in zip(pdf["easting"], pdf["block"])}
    for (rtr, rte), (btr, bte) in zip(
        ref_splits, vs.BlockShuffleSplit(**kwargs).split_blocks(df)
    ):
        te_blocks = set(int(b) for b in bte)
        got_te = {i for i, b in pt_block.items() if b in te_blocks}
        got_tr = {i for i, b in pt_block.items() if b not in te_blocks}
        assert got_te == rte and got_tr == rtr


def test_ref_block_kfold(spark, fixture):
    e, n, d, _ = fixture
    X = np.column_stack([e, n])
    df = _scatter_df(spark, e, n, d)
    labeled, _ = block_split(df, spacing=2.5)
    pdf = labeled.toPandas()
    pos = {v: i for i, v in enumerate(e)}
    pt_block = {pos[ee]: b for ee, b in zip(pdf["easting"], pdf["block"])}
    for kwargs in [
        dict(spacing=2.5, n_splits=4, shuffle=True, random_state=0, balance=True),
        dict(spacing=2.5, n_splits=4, shuffle=True, random_state=3, balance=False),
        dict(spacing=2.5, n_splits=3, shuffle=False, balance=False),
    ]:
        ref_folds = [set(te) for _, te in vd.BlockKFold(**kwargs).split(X)]
        our_folds = vs.BlockKFold(**kwargs).fold_blocks(df)
        got = [
            {i for i, b in pt_block.items() if b in set(int(x) for x in fold)}
            for fold in our_folds
        ]
        assert got == ref_folds


def test_ref_train_test_split_blocked(spark, fixture):
    e, n, d, _ = fixture
    train_ref, test_ref = vd.train_test_split(
        (e, n), d, spacing=2.5, random_state=1, test_size=0.25
    )
    train_df, test_df = vs.train_test_split(
        _scatter_df(spark, e, n, d), spacing=2.5, random_state=1, test_size=0.25
    )
    got_tr = set(train_df.toPandas()["easting"])
    got_te = set(test_df.toPandas()["easting"])
    assert got_tr == set(train_ref[0][0])
    assert got_te == set(test_ref[0][0])


def test_ref_partition_by_sum_and_project_region():
    from verde.utils import partition_by_sum as ref_pbs

    from verde_spark.model_selection import partition_by_sum

    rng = np.random.RandomState(8)
    arr = rng.randint(1, 50, 60)
    npt.assert_array_equal(partition_by_sum(arr, 4), ref_pbs(arr, 4))

    proj = lambda e, n: (e * 2 + n, n - e / 2)
    want = vd.project_region((0, 10, -5, 5), proj)
    got = vs.project_region((0, 10, -5, 5), proj)
    npt.assert_allclose(got, want, rtol=0, atol=0)


def test_ref_score_and_cross_val_score(spark, fixture):
    e, n, d, w = fixture
    # R² score parity: fitted estimator scored on held-out points
    ref_est = vd.Trend(degree=1).fit((e[:200], n[:200]), d[:200])
    want = ref_est.score((e[200:], n[200:]), d[200:], weights=w[200:])
    ours = vs.Trend(degree=1).fit(_scatter_df(spark, e[:200], n[:200], d[:200]))
    pred = ours.predict(
        _scatter_df(spark, e[200:], n[200:], d[200:], w[200:]), "__p"
    )
    got = vs.r2_score(pred, "scalars", "__p", "weight")
    npt.assert_allclose(got, want, rtol=1e-10)

    # cross_val_score with identical blocked folds through both engines
    X = np.column_stack([e, n])
    cv_kwargs = dict(spacing=2.5, n_splits=3, shuffle=True, random_state=0, balance=False)
    ref_scores = vd.cross_val_score(
        vd.Trend(degree=2), (e, n), d, cv=vd.BlockKFold(**cv_kwargs)
    )
    our_scores = vs.cross_val_score(
        lambda: vs.Trend(degree=2),
        _scatter_df(spark, e, n, d),
        cv=vs.BlockKFold(**cv_kwargs),
    )
    npt.assert_allclose(our_scores, ref_scores, rtol=1e-8)


def test_ref_cross_val_score_default_cv(spark, fixture):
    # verde's DEFAULT cv is row-wise KFold(5, shuffle=True, random_state=0)
    # (reference model_selection.py:759-760), NOT a blocked split; our
    # KFoldRows replicates the exact sklearn fold membership at fixture
    # sizes, so default-cv scores match through both engines (VERDICT r2 #8)
    e, n, d, _ = fixture
    ref_scores = vd.cross_val_score(vd.Trend(degree=2), (e, n), d)
    our_scores = vs.cross_val_score(
        lambda: vs.Trend(degree=2), _scatter_df(spark, e, n, d)
    )
    npt.assert_allclose(our_scores, np.asarray(ref_scores), rtol=1e-8)


def test_ref_splinecv(spark, fixture):
    e, n, d, _ = fixture
    from verde_spark.operators.splinecv import SplineCV

    dampings = (1e-8, 1e-4, 1e-1)
    cv_kwargs = dict(spacing=2.5, n_splits=3, shuffle=True, random_state=0, balance=False)
    ref = vd.SplineCV(
        dampings=dampings, cv=vd.BlockKFold(**cv_kwargs), delayed=False
    ).fit((e, n), d)
    ours = SplineCV(
        dampings=dampings, cv=vs.BlockKFold(**cv_kwargs)
    ).fit(_scatter_df(spark, e, n, d))
    npt.assert_allclose(sorted(ours.scores_), sorted(np.asarray(ref.scores_).ravel()), rtol=1e-6)
    assert ours.damping_ == ref.damping_


def test_ref_load_surfer(tmp_path):
    from verde.io import load_surfer as ref_load

    from verde_spark.sources.grid_io import load_surfer

    rng = np.random.RandomState(6)
    vals = rng.uniform(-5, 5, (4, 6))
    vals[1, 2] = 1.70141e38  # NaN sentinel
    finite = vals[vals < 1e38]
    path = tmp_path / "test.grd"
    lines = ["DSAA", "4 6", "-3 3", "0 10", f"{finite.min()} {finite.max()}"]
    lines += [" ".join(f"{v!r}" for v in row) for row in vals]
    path.write_text("\n".join(lines) + "\n")

    ref = ref_load(str(path))
    ours_vals, region = load_surfer(str(path))
    npt.assert_allclose(ours_vals, ref.values, rtol=0, atol=0, equal_nan=True)
    npt.assert_allclose(region[:2], (ref.coords["easting"][0], ref.coords["easting"][-1]))
    npt.assert_allclose(region[2:], (ref.coords["northing"][0], ref.coords["northing"][-1]))


def test_ref_kneighbors_queries_outside_data_region(spark, fixture):
    # queries far outside the data bbox force the cell join to escalate
    # rings / fall back — the k-set must still match the reference exactly
    e, n, d, _ = fixture
    qe = np.array([-30.0, 40.0, 5.0, -15.0, 25.0])
    qn = np.array([30.0, -40.0, 20.0, -25.0, 5.0])
    ref = vd.KNeighbors(k=3).fit((e, n), d)
    want = ref.predict((qe, qn))
    ours = vs.KNeighbors(k=3).fit(_scatter_df(spark, e, n, d))
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = ours.predict(qdf, "pred").orderBy("easting").toPandas()
    order = np.argsort(qe, kind="stable")
    npt.assert_allclose(got["pred"].to_numpy(), want[order], rtol=1e-12)


def test_ref_vector_independent_components(spark, fixture):
    e, n, d, _ = fixture
    d2 = 0.5 * d - 3.0
    ref = vd.Vector([vd.Trend(degree=1), vd.Trend(degree=2)]).fit((e, n), (d, d2))
    qe = np.linspace(1, 9, 10)
    qn = np.linspace(-9, -1, 10)
    we, wn = ref.predict((qe, qn))

    from verde_spark.operators.vector import Vector

    df = spark.createDataFrame(
        pd.DataFrame({"easting": e, "northing": n, "east_component": d, "north_component": d2})
    )
    ours = Vector(
        [
            ("east_component", lambda: vs.Trend(degree=1)),
            ("north_component", lambda: vs.Trend(degree=2)),
        ]
    ).fit(df)
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = ours.predict(qdf).orderBy("easting").toPandas()
    npt.assert_allclose(got["east_component_pred"], we, rtol=1e-6)
    npt.assert_allclose(got["north_component_pred"], wn, rtol=1e-6)


def test_ref_vector_score_scatter_profile(spark, fixture):
    # the reference's Vector inherits scatter/profile/score from
    # BaseGridder; score averages per-component R² (base/utils.py:15-66).
    # Noise keeps R² non-trivially below 1 so the average is load-bearing.
    e, n, d, _ = fixture
    rng = np.random.RandomState(1)
    c1 = d + rng.normal(0, 25, d.size)
    c2 = 0.5 * d - 3.0 + rng.normal(0, 10, d.size)
    ref = vd.Vector([vd.Trend(degree=1), vd.Trend(degree=2)]).fit((e, n), (c1, c2))
    want = ref.score((e, n), (c1, c2))

    from verde_spark.operators.vector import Vector

    df = spark.createDataFrame(
        pd.DataFrame({"easting": e, "northing": n, "east_component": c1, "north_component": c2})
    )
    ours = Vector(
        [
            ("east_component", lambda: vs.Trend(degree=1)),
            ("north_component", lambda: vs.Trend(degree=2)),
        ]
    ).fit(df)
    npt.assert_allclose(ours.score(df), want, rtol=1e-8)

    sc = ours.scatter(spark, region=(0, 10, -10, 0), size=40, random_state=0).toPandas()
    assert len(sc) == 40
    assert {"east_component_pred", "north_component_pred"} <= set(sc.columns)
    pr = ours.profile(spark, (0, -5), (10, -5), size=30).orderBy("distance").toPandas()
    assert len(pr) == 30 and pr["distance"].iloc[-1] == 10.0


def test_ref_vector_spline2d_score(spark):
    # VectorSpline2D.score: component-averaged R², parity vs the reference
    # on the same (global, untiled) solve
    rng = np.random.RandomState(3)
    e = rng.uniform(0, 5000, 120)
    n = rng.uniform(-5000, 0, 120)
    de = np.sin(e / 1000) * np.cos(n / 1000) * 10
    dn = np.cos(e / 1000) * np.sin(n / 1000) * 5
    ref = vd.VectorSpline2D(damping=1e-4).fit((e, n), (de, dn))
    want = ref.score((e, n), (de, dn))

    from verde_spark.operators.vector import VectorSpline2D

    df = spark.createDataFrame(
        pd.DataFrame({"easting": e, "northing": n, "east_component": de, "north_component": dn})
    )
    ours = VectorSpline2D(damping=1e-4).fit(df)
    npt.assert_allclose(ours.score(df), want, rtol=1e-6)
    sc = ours.scatter(spark, region=(0, 5000, -5000, 0), size=25, random_state=1)
    assert sc.count() == 25


def test_ref_distance_mask_projection(spark, fixture):
    # verde mask.py:57-66: projection applied to data AND query coordinates
    # before the distance test — linear map through both engines
    e, n, d, _ = fixture
    proj = lambda east, north: (2.0 * east + 1.0, 0.5 * north - 3.0)
    qe = np.linspace(-1, 11, 25)
    qn = np.linspace(-11, 1, 25)
    want = vd.distance_mask(
        (e, n), maxdist=2.0, coordinates=(qe, qn), projection=proj
    )
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = (
        vs.distance_mask(
            _scatter_df(spark, e, n, d), qdf, maxdist=2.0, projection=proj
        )
        .orderBy("easting")
        .toPandas()["in_range"]
        .to_numpy()
    )
    npt.assert_array_equal(got, want)


def test_ref_spline_force_coords(spark, fixture):
    """Custom force locations (verde spline.py:369-377, 458-462): fewer
    forces than data → rectangular least-squares. Single tile = exact
    reference parity; tiled path checked for finiteness + approximation."""
    e, n, d, _ = fixture
    rng = np.random.RandomState(42)
    fe = rng.uniform(e.min(), e.max(), 40)
    fn = rng.uniform(n.min(), n.max(), 40)
    qe = np.linspace(1, 9, 25)
    qn = np.linspace(-9, -1, 25)
    ref = vd.Spline(damping=1e-8, force_coords=(fe, fn)).fit((e, n), d)
    want = ref.predict((qe, qn))
    ours = vs.Spline(damping=1e-8, force_coords=(fe, fn)).fit(
        _scatter_df(spark, e, n, d)
    )
    qdf = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn}))
    got = ours.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
    npt.assert_allclose(got, want, rtol=1e-6, atol=1e-8 * np.abs(want).max())
    # tiled, halo covering the whole region: every tile sees all data and
    # all forces, so the cogrouped rectangular solve must equal the global
    # one — this checks the tiled force plumbing exactly
    full = vs.Spline(
        damping=1e-8, force_coords=(fe, fn), tile_spacing=5.0, halo=20.0
    ).fit(_scatter_df(spark, e, n, d))
    got_f = full.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
    npt.assert_allclose(got_f, want, rtol=1e-6, atol=1e-8 * np.abs(want).max())
    # moderate halo: per-tile force subsets approximate the global solve
    # (r²·log r grows with distance, so truncating far-field forces is a
    # real approximation) — require R² > 0.9 against the reference
    tiled = vs.Spline(
        damping=1e-8, force_coords=(fe, fn), tile_spacing=5.0, halo=4.0
    ).fit(_scatter_df(spark, e, n, d))
    got_t = tiled.predict(qdf, "pred").orderBy("easting").toPandas()["pred"].to_numpy()
    assert np.isfinite(got_t).all()
    r2 = 1 - np.sum((got_t - want) ** 2) / np.sum((want - want.mean()) ** 2)
    assert r2 > 0.9


def test_ref_public_api_surface():
    """Every public name exported by the reference package exists at our
    top level — a verde user can switch import lines and resolve
    everything (reference verde/__init__.py:8-40)."""
    ref_names = [
        "BlockMean", "BlockReduce", "Chain", "block_split",
        "expanding_window", "get_region", "grid_coordinates", "inside",
        "line_coordinates", "longitude_continuity", "pad_region",
        "profile_coordinates", "rolling_window", "scatter_points",
        "median_distance", "load_surfer", "convexhull_mask",
        "distance_mask", "BlockKFold", "BlockShuffleSplit",
        "cross_val_score", "train_test_split", "KNeighbors",
        "project_grid", "project_region", "Cubic", "Linear",
        "ScipyGridder", "Spline", "SplineCV", "Trend", "grid_to_table",
        "make_xarray_grid", "maxabs", "minmax", "variance_to_weights",
        "Vector", "VectorSpline2D", "CheckerBoard",
    ]
    missing = [n for n in ref_names if not hasattr(vs, n)]
    assert missing == []


def test_ref_maxabs_minmax(spark):
    """maxabs/minmax parity: NumPy path against the actual reference
    functions, Spark path against the NumPy path on the same values."""
    rng = np.random.RandomState(0)
    a = rng.normal(size=100) * 10
    b = rng.normal(size=50) - 5
    b[7] = np.nan
    for pct in (100, 90, 50):
        want = vd.maxabs(a, b, percentile=pct)
        assert vs.maxabs((a, b), percentile=pct) == pytest.approx(want, rel=1e-12)
    want_mm = vd.minmax(a, b, min_percentile=5, max_percentile=95)
    got_mm = vs.minmax((a, b), min_percentile=5, max_percentile=95)
    npt.assert_allclose(got_mm, want_mm, rtol=1e-12)
    # Spark path: same data as two columns of one DataFrame
    n = min(len(a), len(b))
    df = spark.createDataFrame(pd.DataFrame({"x": a[:n], "y": b[:n]}))
    want_df = vd.maxabs(a[:n], b[:n], percentile=90)
    assert vs.maxabs(df, percentile=90) == pytest.approx(want_df, rel=1e-9)
    want_mm2 = vd.minmax(a[:n], b[:n], min_percentile=10, max_percentile=90)
    npt.assert_allclose(
        vs.minmax(df, min_percentile=10, max_percentile=90), want_mm2, rtol=1e-9
    )
    # nan=False propagates — pandas NaN becomes Spark NULL on conversion
    # (ignored on both paths), so plant a true Spark-side NaN double
    dfn = df.unionByName(
        spark.createDataFrame([(0.0, float("nan"))], "x double, y double")
    )
    assert math.isnan(vs.maxabs(dfn, nan=False))
    # nan=True skips it (the extra x=0.0 row joins the value pool)
    want_nan_true = vd.maxabs(a[:n], b[:n], np.array([0.0]))
    assert vs.maxabs(dfn, nan=True) == pytest.approx(want_nan_true, rel=1e-9)
