"""Synthetic data sources — the golden-data generators for all tests.

CheckerBoard (verde synthetic.py:16-197):
``f(e, n) = amplitude * sin((2π/w_east) e) * cos((2π/w_north) n)`` with
defaults amplitude=1000, region=(0, 5000, -5000, 0) and wavelengths equal
to half the region extent (synthetic.py:65-92, formula :112-118). The
predict side is a single Catalyst column expression (whole-stage codegen,
no UDF); scatter/grid generation reuses the coordinates module.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseGridder
from .coordinates import grid_coordinates, scatter_points
from .geometry import check_region


def checkerboard_expr(
    easting: Column | str,
    northing: Column | str,
    amplitude: float,
    w_east: float,
    w_north: float,
) -> Column:
    """The CheckerBoard field as a pure column expression (synthetic.py:112-118)."""
    e = F.col(easting) if isinstance(easting, str) else easting
    n = F.col(northing) if isinstance(northing, str) else northing
    return (
        F.lit(float(amplitude))
        * F.sin((F.lit(2 * np.pi) / F.lit(float(w_east))) * e)
        * F.cos((F.lit(2 * np.pi) / F.lit(float(w_north))) * n)
    )


class CheckerBoard(BaseGridder):
    """Verde's CheckerBoard synthetic gridder (synthetic.py:16-197).

    ``predict_expr`` evaluates on any DataFrame; ``scatter``/``grid``
    produce verde-identical fixtures (NumPy for values so floats match the
    reference's np.sin/np.cos bit-for-bit — Spark's JVM sin/cos may differ
    in the last ulp, which matters for value-hash comparisons; that is why
    ``scatter``/``grid`` intentionally OVERRIDE the BaseGridder versions).
    ``predict``/``profile``/``score`` come from
    :class:`verde_spark.base.BaseGridder`.
    """

    def __init__(
        self,
        amplitude: float = 1000.0,
        region: Sequence[float] = (0.0, 5000.0, -5000.0, 0.0),
        w_east: Optional[float] = None,
        w_north: Optional[float] = None,
    ):
        self.region = check_region(region)
        self.amplitude = float(amplitude)
        w, e, s, n = self.region
        self.w_east = float(w_east) if w_east is not None else (e - w) / 2
        self.w_north = float(w_north) if w_north is not None else (n - s) / 2
        self.region_ = self.region  # fitted-region contract (synthetic: fixed)

    def predict(self, df, output_col: str = "prediction",
                easting: str = "easting", northing: str = "northing"):
        return df.withColumn(output_col, self.predict_expr(easting, northing))

    def predict_expr(self, easting="easting", northing="northing") -> Column:
        return checkerboard_expr(easting, northing, self.amplitude, self.w_east, self.w_north)

    def predict_numpy(self, easting: np.ndarray, northing: np.ndarray) -> np.ndarray:
        return (
            self.amplitude
            * np.sin((2 * np.pi / self.w_east) * easting)
            * np.cos((2 * np.pi / self.w_north) * northing)
        )

    def scatter_numpy(self, size: int = 300, random_state=0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(easting, northing, scalars) arrays, verde-identical (seeded)."""
        east, north = scatter_points(self.region, size, random_state)
        return east, north, self.predict_numpy(east, north)

    def scatter(self, spark: SparkSession, size: int = 300, random_state=0) -> DataFrame:
        import pandas as pd

        east, north, data = self.scatter_numpy(size, random_state)
        return spark.createDataFrame(
            pd.DataFrame({"easting": east, "northing": north, "scalars": data})
        )

    def grid(self, spark: SparkSession, shape=None, spacing=None, region=None) -> DataFrame:
        nodes = grid_coordinates(spark, region or self.region, shape=shape, spacing=spacing)
        return nodes.withColumn("scalars", self.predict_expr())
