"""kNN interpolation + mask goldens from verde tests/test_neighbors.py and
tests/test_mask.py."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark import CheckerBoard, KNeighbors, convexhull_mask, distance_mask
from verde_spark.coordinates import grid_coordinates
from verde_spark.operators.neighbors import knn_join


def test_neighbors_same_points(spark):
    # verde tests/test_neighbors.py:21-32: exact recovery at the data points
    region = (1000, 5000, -8000, -7000)
    synth = CheckerBoard(region=region)
    data = synth.scatter(spark, size=1000, random_state=0).cache()
    gridder = KNeighbors().fit(data)
    pred = gridder.predict(data, "pred").toPandas()
    npt.assert_allclose(pred["pred"], pred["scalars"])


def test_neighbors_grid_tolerance(spark):
    # verde tests/test_neighbors.py:35-62: 100x100 data grid → 95x95 queries,
    # atol=100 for k in {1, 2, 10} and median
    region = (1000, 5000, -8000, -6000)
    synth = CheckerBoard(region=region)
    data = synth.grid(spark, shape=(100, 100)).drop("ix", "iy").cache()
    queries = grid_coordinates(spark, region, shape=(95, 95)).cache()
    for k, reduction in [(1, "mean"), (2, "mean"), (10, "mean"), (1, "median")]:
        gridder = KNeighbors(k=k, reduction=reduction).fit(data)
        got = gridder.predict(queries, "pred").toPandas()
        truth = synth.predict_numpy(got["easting"].to_numpy(), got["northing"].to_numpy())
        npt.assert_allclose(got["pred"], truth, rtol=0, atol=100)


def test_knn_join_exact_small(spark):
    # brute-force cross-check of the cell join on a small scatter
    rng = np.random.RandomState(42)
    de, dn = rng.uniform(0, 10, 200), rng.uniform(0, 10, 200)
    qe, qn = rng.uniform(0, 10, 50), rng.uniform(0, 10, 50)
    data = spark.createDataFrame(pd.DataFrame({"easting": de, "northing": dn}))
    queries = spark.createDataFrame(pd.DataFrame({"easting": qe, "northing": qn, "qid": range(50)}))
    got = knn_join(data, queries, k=3, query_id="qid").toPandas()
    for qid in range(50):
        d2 = (de - qe[qid]) ** 2 + (dn - qn[qid]) ** 2
        expected = np.sort(np.sqrt(d2))[:3]
        mine = np.sort(got[got["qid"] == qid]["distance"].to_numpy())
        npt.assert_allclose(mine, expected)


def _mask_grid(spark):
    return grid_coordinates(spark, (0, 5, -10, -4), spacing=1).cache()


def test_distance_mask_golden(spark):
    # verde tests/test_mask.py:61-75 / mask.py doctest
    coords = _mask_grid(spark)
    got = (
        distance_mask(((2.5,), (-7.5,)), coords, maxdist=2)
        .orderBy("northing", "easting")
        .toPandas()
    )
    true = [
        [False, False, False, False, False, False],
        [False, False, True, True, False, False],
        [False, True, True, True, True, False],
        [False, True, True, True, True, False],
        [False, False, True, True, False, False],
        [False, False, False, False, False, False],
        [False, False, False, False, False, False],
    ]
    # row 0 = southmost northing, matching verde meshgrid row order
    got_mat = got["in_range"].to_numpy().reshape(7, 6)
    npt.assert_array_equal(got_mat, np.array(true))


def test_convexhull_mask_golden(spark):
    # verde tests/test_mask.py:19-34
    coords = _mask_grid(spark)
    data = spark.createDataFrame(
        pd.DataFrame({"easting": [2.0, 3.0, 2.0, 3.0], "northing": [-9.0, -9.0, -6.0, -6.0]})
    )
    got = (
        convexhull_mask(data, coords)
        .orderBy("northing", "easting")
        .toPandas()
    )
    true = [
        [False, False, False, False, False, False],
        [False, False, True, True, False, False],
        [False, False, True, True, False, False],
        [False, False, True, True, False, False],
        [False, False, True, True, False, False],
        [False, False, False, False, False, False],
        [False, False, False, False, False, False],
    ]
    got_mat = got["in_hull"].to_numpy().reshape(7, 6)
    npt.assert_array_equal(got_mat, np.array(true))


def test_convexhull_mask_projection(spark):
    # verde mask.py:120,146-152: projection applied to the data AND target
    # coordinates before the hull test (same F5 hook as distance_mask).
    # |easting| folds negative targets onto the data's hull, so membership
    # provably differs from the unprojected mask.
    proj = lambda e, n: (np.abs(e), n)
    data = spark.createDataFrame(
        pd.DataFrame({"easting": [1.0, 3.0, 1.0, 3.0], "northing": [0.0, 0.0, 2.0, 2.0]})
    )
    targets = spark.createDataFrame(
        pd.DataFrame(
            {
                "easting": [-2.0, 2.0, 4.0, -0.5],
                "northing": [1.0, 1.0, 1.0, 1.0],
                "tag": [0, 1, 2, 3],
            }
        )
    )
    got = convexhull_mask(data, targets, projection=proj).orderBy("tag").toPandas()
    # (-2,1) folds to (2,1) ∈ hull; (-0.5,1) folds to (0.5,1) ∉ hull
    assert got["in_hull"].tolist() == [True, True, False, False]
    # passthrough contract: temp projected columns are dropped
    assert list(got.columns) == ["easting", "northing", "tag", "in_hull"]
    plain = convexhull_mask(data, targets).orderBy("tag").toPandas()
    assert plain["in_hull"].tolist() == [False, True, False, False]


def test_median_distance_golden(spark):
    # verde distances.py:16-111 — per-point median of k nearest distances,
    # self excluded; cross-checked against a NumPy brute force
    import numpy as np
    import pandas as pd

    from verde_spark.operators.neighbors import median_distance

    rng = np.random.RandomState(7)
    e = rng.uniform(0, 10, 60)
    n = rng.uniform(0, 10, 60)
    df = spark.createDataFrame(pd.DataFrame({"easting": e, "northing": n}))
    got = (
        median_distance(df, k=3)
        .orderBy("easting")
        .toPandas()
    )
    d = np.hypot(e[:, None] - e[None, :], n[:, None] - n[None, :])
    np.fill_diagonal(d, np.inf)
    want = np.median(np.sort(d, axis=1)[:, :3], axis=1)
    order = np.argsort(e)
    np.testing.assert_allclose(got["median_distance"], want[order], rtol=1e-12)


def test_knn_tie_break_deterministic_across_partitioning(spark):
    # planted equidistant neighbors: the content-derived tie-break id must
    # pick the same winner whatever the data partitioning (task retries /
    # repartition change monotonically_increasing_id, not xxhash64)
    data_pdf = pd.DataFrame(
        {
            "easting": [1.0, -1.0, 0.0, 0.0, 3.0, -3.0],
            "northing": [0.0, 0.0, 1.0, -1.0, 3.0, -3.0],
            "val": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )
    queries = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "easting": [0.0], "northing": [0.0]})
    )
    picks = []
    for nparts in (1, 3, 7):
        data = spark.createDataFrame(data_pdf).repartition(nparts)
        out = knn_join(
            data, queries, k=2, query_id="qid", cell_size=2.0
        ).orderBy("rank")
        picks.append([r["nb_val"] for r in out.collect()])
    assert picks[0] == picks[1] == picks[2]
    # all four candidates are at distance exactly 1 — the chosen 2 must be
    # a deterministic subset
    assert len(picks[0]) == 2


def test_kneighbors_warns_on_weights(spark):
    import pytest as _pytest

    region = (0, 10, 0, 10)
    data = CheckerBoard(region=region).scatter(spark, size=50, random_state=1)
    data = data.withColumn("w", F.lit(1.0))
    with _pytest.warns(UserWarning, match="ignored"):
        KNeighbors(k=1).fit(data, weight_col="w")


def test_distance_mask_projection_scaling_identity(spark):
    # projecting with a uniform 2x scale doubles every distance: the mask at
    # maxdist=2d under projection equals the unprojected mask at maxdist=d
    region = (0, 10, 0, 10)
    data = CheckerBoard(region=region).scatter(spark, size=40, random_state=3).cache()
    targets = grid_coordinates(spark, region, spacing=1.0).cache()
    plain = distance_mask(data, targets, maxdist=1.2).orderBy("iy", "ix").toPandas()
    proj = (
        distance_mask(
            data, targets, maxdist=2.4, projection=lambda e, n: (2 * e, 2 * n)
        )
        .orderBy("iy", "ix")
        .toPandas()
    )
    assert (plain["in_range"] == proj["in_range"]).all()
    assert plain["in_range"].any() and not plain["in_range"].all()


def test_basegridder_scatter_profile_score(spark):
    """grid/scatter/profile/score inherited from verde_spark.base.BaseGridder
    (reference base/base_classes.py:318-660) by every gridder."""
    import pandas as pd

    from verde_spark import Cubic, KNeighbors, Linear, Spline
    from verde_spark.base import BaseGridder
    from verde_spark.coordinates import scatter_points

    for cls in (Spline, Linear, Cubic, KNeighbors):
        assert issubclass(cls, BaseGridder)

    rng = np.random.RandomState(9)
    e = rng.uniform(0, 10, 150)
    n = rng.uniform(0, 10, 150)
    d = 3.0 + 0.5 * e - 0.25 * n  # plane: kNN mean approximates, spline exact
    df = spark.createDataFrame(pd.DataFrame({"easting": e, "northing": n, "scalars": d}))
    g = KNeighbors(k=3).fit(df)
    # scatter: seeded points inside the fitted region
    sc = g.scatter(spark, size=40, random_state=7, output_col="p").toPandas()
    se, sn = scatter_points(g.region_, 40, random_state=7)
    assert len(sc) == 40
    npt.assert_allclose(np.sort(sc["easting"]), np.sort(se), rtol=1e-12)
    # profile: distances column + predictions along the segment
    pr = g.profile(spark, (1.0, 1.0), (9.0, 9.0), size=20, output_col="p").toPandas()
    assert len(pr) == 20
    assert pr["distance"].max() == pytest.approx(np.hypot(8, 8))
    assert pr["p"].notna().all()
    # score: R² of a k=3 mean on a plane is high but < 1
    s = g.score(df)
    assert 0.9 < s <= 1.0
    # spline reproduces the plane → R² ≈ 1
    sp = Spline(damping=None).fit(df, region=(0, 10, 0, 10))
    assert sp.score(df) == pytest.approx(1.0, abs=1e-6)


def test_kneighbors_numpy_callable_reduction(spark):
    """Reference API: KNeighbors(reduction=np.median) — numpy callables
    normalize to the native aggregate (reference neighbors.py:65 defaults
    to np.mean)."""
    import numpy as np
    import pandas as pd

    from verde_spark import KNeighbors

    rng = np.random.RandomState(4)
    pdf = pd.DataFrame({
        "easting": rng.uniform(0, 10, 200),
        "northing": rng.uniform(0, 10, 200),
        "scalars": rng.uniform(-1, 1, 200),
    })
    df = spark.createDataFrame(pdf)
    by_str = KNeighbors(k=3, reduction="median").fit(df).grid(spark, spacing=2.5).toPandas()
    by_np = KNeighbors(k=3, reduction=np.median).fit(df).grid(spark, spacing=2.5).toPandas()
    pd.testing.assert_frame_equal(by_np, by_str)
    with pytest.raises(ValueError, match="not a recognized"):
        KNeighbors(k=3, reduction=lambda v: v[0]).fit(df).grid(spark, spacing=5.0).count()


def test_basegridder_default_filter_residuals(spark):
    """Every gridder inherits filter = fit + residuals (reference
    base_classes.py:273-316); KNeighbors(k=1) interpolates its own data
    exactly, so residuals at the data points are 0."""
    import numpy as np
    import pandas as pd

    from verde_spark import KNeighbors

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "easting": rng.uniform(0, 10, 120),
        "northing": rng.uniform(0, 10, 120),
        "scalars": rng.uniform(-5, 5, 120),
    })
    df = spark.createDataFrame(pdf)
    resid = KNeighbors(k=1).filter(df).toPandas()
    assert set(resid.columns) == {"easting", "northing", "scalars"}
    npt.assert_allclose(resid["scalars"], 0.0, atol=1e-12)


def test_knn_join_refuses_reserved_query_columns(spark):
    """A query frame already carrying distance/rank would be silently
    overwritten mid-join (review r5) — knn_join must refuse loudly."""
    import pytest

    from verde_spark.operators.neighbors import knn_join

    data = spark.createDataFrame(
        [(0.0, 0.0)], "easting double, northing double"
    )
    q = spark.createDataFrame(
        [(1.0, 1.0, 99.0)], "easting double, northing double, distance double"
    )
    with pytest.raises(ValueError, match="reserved output column"):
        knn_join(data, q)


def test_median_distance_and_mask_preserve_caller_distance_column(spark):
    """median_distance / distance_mask namespace their query side, so a
    caller frame with its own 'distance' column (BaseGridder.profile
    output) passes through byte-identical (review r5: it was replaced by
    neighbor distances)."""
    import pandas as pd

    from verde_spark.operators.neighbors import median_distance

    pdf = pd.DataFrame(
        {
            "easting": [0.0, 1.0, 2.0, 5.0],
            "northing": [0.0, 0.0, 0.0, 0.0],
            "distance": [111.0, 222.0, 333.0, 444.0],  # caller's own
        }
    )
    df = spark.createDataFrame(pdf)
    got = median_distance(df, k=1).toPandas().sort_values("easting")
    assert got["distance"].tolist() == [111.0, 222.0, 333.0, 444.0]
    assert got["median_distance"].tolist() == [1.0, 1.0, 1.0, 3.0]

    big = spark.createDataFrame(
        pd.DataFrame(
            {
                "easting": [float(i) for i in range(200)],
                "northing": [0.0] * 200,
            }
        )
    )
    targets = df
    out = (
        distance_mask(big, targets, maxdist=0.5, broadcast_threshold=10)
        .toPandas()
        .sort_values("easting")
    )
    assert out["distance"].tolist() == [111.0, 222.0, 333.0, 444.0]
    assert out["in_range"].tolist() == [True, True, True, True]
