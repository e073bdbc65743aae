"""Property test: the clamped floor-division block label equals verde's
nearest-pixel-center semantics (brute-force argmin oracle) everywhere off
the exact boundary lattice — including points outside the region."""

import numpy as np
import numpy.testing as npt
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from verde_spark.coordinates import BlockGrid


def _brute_labels(grid: BlockGrid, east, north):
    ce, cn = grid.centers()
    d2 = (east[:, None] - ce) ** 2 + (north[:, None] - cn) ** 2
    return d2.argmin(axis=1)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    spacing=st.sampled_from([0.5, 1.0, 2.5, 3.0]),
    pad=st.sampled_from([0.0, 3.0]),  # 3.0 → points outside the region clamp
)
def test_label_matches_nearest_center(seed, spacing, pad):
    region = (-5.0, 0.0, 5.0, 10.0)
    grid = BlockGrid.from_region(region, spacing=spacing)
    rng = np.random.RandomState(seed)
    east = rng.uniform(region[0] - pad, region[1] + pad, 300)
    north = rng.uniform(region[2] - pad, region[3] + pad, 300)
    expected = _brute_labels(grid, east, north)

    # evaluate the label expression arithmetic in NumPy (same formula the
    # Column expression emits; the Spark evaluation itself is covered by
    # the doctest-golden test)
    def idx(coord, axis):
        edge = axis.start - axis.step / 2
        raw = np.floor((coord - edge) / axis.step).astype("int64")
        return np.clip(raw, 0, axis.size - 1)

    got = idx(north, grid.north) * grid.n_east + idx(east, grid.east)
    # random uniforms never hit the exact boundary lattice, where the
    # tie-break is documented as implementation-defined
    npt.assert_array_equal(got, expected)


def test_label_spark_equals_numpy_formula(spark):
    # one Spark evaluation cross-check of the same arithmetic
    region = (-5.0, 0.0, 5.0, 10.0)
    grid = BlockGrid.from_region(region, spacing=1.3)
    rng = np.random.RandomState(99)
    east = rng.uniform(-7, 2, 500)
    north = rng.uniform(3, 12, 500)
    df = spark.createDataFrame(pd.DataFrame({"easting": east, "northing": north}))
    got = (
        df.withColumn("block", grid.label_expr())
        .orderBy("easting")
        .select("block")
        .toPandas()["block"]
        .to_numpy()
    )
    order = np.argsort(east)
    expected = _brute_labels(grid, east[order], north[order])
    npt.assert_array_equal(got, expected)
