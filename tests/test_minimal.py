"""The canonical verde workflow end-to-end (tests/test_minimal.py:31-65):
blocked train/test split → Chain(BlockMean → Trend → Spline) → score on
held-out blocks → grid → distance_mask.  Verde runs this on the
California GPS sample; here the same shape runs on a deterministic
CheckerBoard + linear trend (no network data in this environment)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark import (
    BlockMean,
    BlockReduce,
    CheckerBoard,
    Chain,
    Spline,
    Trend,
    distance_mask,
    train_test_split,
)


def test_minimal_integration(spark):
    region = (0.0, 5000.0, -5000.0, 0.0)
    synth = CheckerBoard(region=region)
    east, north, val = synth.scatter_numpy(size=3000, random_state=0)
    data = val + 50.0 + 0.04 * east - 0.03 * north
    df = spark.createDataFrame(
        pd.DataFrame({"easting": east, "northing": north, "scalars": data})
    ).cache()

    train, test = train_test_split(df, spacing=500.0, random_state=0)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 3000 and n_test > 0

    chain = Chain(
        [
            ("mean", BlockReduce("mean", spacing=250.0)),
            ("trend", Trend(degree=1)),
            ("spline", Spline(damping=1e-10)),
        ]
    ).fit(train)

    # held-out blocks score ≈ 1 (verde asserts 0.99 on real GPS data; the
    # blocked split extrapolates into whole held-out blocks, harder than
    # verde's row split, hence 0.94)
    score = chain.score(test)
    assert score > 0.94

    # BlockMean variant: variance-derived weights downweight high-gradient
    # blocks, which costs accuracy on noiseless fields — still fits
    weighted = Chain(
        [
            ("mean", BlockMean(spacing=250.0)),
            ("trend", Trend(degree=1)),
            ("spline", Spline(damping=1e-10)),
        ]
    ).fit(train)
    assert weighted.score(test) > 0.8

    grid = chain.predict(
        synth_grid_nodes(spark, region, spacing=250.0)
    )
    masked = distance_mask(
        train.select("easting", "northing"), grid, maxdist=500.0
    )
    out = masked.withColumn(
        "prediction", F.when(F.col("in_range"), F.col("prediction"))
    ).toPandas()
    # interior nodes survive the mask and carry finite predictions
    kept = out["prediction"].notna()
    assert 0 < kept.sum() <= len(out)
    assert np.isfinite(out.loc[kept, "prediction"]).all()


def synth_grid_nodes(spark, region, spacing):
    from verde_spark.coordinates import grid_coordinates

    return grid_coordinates(spark, region, spacing=spacing)


def test_check_fit_input_validates_sizes():
    """A plain n>1 data array is ONE component (reference check_data); the
    r2 formulation iterated its elements and rejected every valid call
    (ADVICE r2)."""
    from verde_spark.base import check_fit_input

    coords = (np.linspace(0, 1, 5), np.linspace(2, 3, 5))
    data = np.arange(5.0)
    assert check_fit_input(coords, data, None)[1] is data
    check_fit_input(coords, (data, data), (np.ones(5), np.ones(5)))
    with pytest.raises(ValueError):
        check_fit_input(coords, np.arange(4.0), None)
    with pytest.raises(ValueError):
        check_fit_input(coords, data, np.ones(3))
    with pytest.raises(ValueError):
        check_fit_input(coords, (data, np.arange(6.0)), None)
