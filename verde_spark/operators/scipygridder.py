"""Deprecated ``ScipyGridder`` umbrella (reference parity).

The reference's ``ScipyGridder(method=...)`` (verde/scipygridder.py:188-256,
deprecated, removal slated for v2.0.0) is a thin dispatcher over scipy's
``LinearNDInterpolator`` / ``NearestNDInterpolator`` /
``CloughTocher2DInterpolator``.  Users migrating old scripts still call it,
so this module keeps the name and contract — method validation message,
``FutureWarning``, fitted ``region_`` — and dispatches to the Spark-native
gridders that replace each scipy class:

* ``linear``  → :class:`verde_spark.Linear` (tiled Bowyer-Watson Delaunay)
* ``cubic``   → :class:`verde_spark.Cubic` (Clough-Tocher C1)
* ``nearest`` → :class:`verde_spark.KNeighbors` (k=1), the same equivalence
  the reference's own deprecation note prescribes.
"""

from __future__ import annotations

from typing import Optional
from warnings import warn

from pyspark.sql import DataFrame

from .cubic import Cubic
from .linear import Linear
from .neighbors import KNeighbors


class ScipyGridder:
    """Dispatcher over Linear / Cubic / KNeighbors(k=1), matching the
    reference's deprecated ``ScipyGridder`` surface.

    ``extra_args`` accepts the Spark-native constructor options of the
    dispatched gridder (e.g. ``{"tile_spacing": 2.5, "halo": 1.5}``);
    scipy-specific knobs like ``rescale`` have no Spark counterpart and
    raise ``TypeError`` from the underlying constructor.
    """

    def __init__(self, method: str = "cubic", extra_args: Optional[dict] = None):
        methods = ("linear", "nearest", "cubic")
        if method not in methods:
            # same message shape as the reference (scipygridder.py:246-250)
            raise ValueError(
                f"Invalid interpolation method '{method}'. "
                f"Must be one of {methods}."
            )
        warn(
            "ScipyGridder is deprecated (mirrors the reference's removal in "
            "v2.0.0). Use KNeighbors, Linear, or Cubic directly.",
            FutureWarning,
        )
        self.method = method
        self.extra_args = extra_args
        kwargs = dict(extra_args or {})
        if method == "linear":
            self._g = Linear(**kwargs)
        elif method == "cubic":
            self._g = Cubic(**kwargs)
        else:
            self._g = KNeighbors(k=1, **kwargs)

    def fit(self, df: DataFrame, **kwargs) -> "ScipyGridder":
        self._g.fit(df, **kwargs)
        return self

    @property
    def region_(self):
        return self._g.region_

    @property
    def interpolator_(self):
        """The dispatched Spark-native gridder (the reference exposes the
        scipy instance under this name)."""
        return self._g

    def predict(self, df: DataFrame, *args, **kwargs) -> DataFrame:
        return self._g.predict(df, *args, **kwargs)

    # The reference's ScipyGridder inherits the full BaseGridder surface
    # (filter/score/scatter/profile); delegate so e.g. Chain([...,
    # ("nearest", ScipyGridder("nearest"))]) works here too.
    def filter(self, df: DataFrame, **kwargs) -> DataFrame:
        out = self._g.filter(df, **kwargs)
        return out

    def score(self, df: DataFrame, **kwargs) -> float:
        return self._g.score(df, **kwargs)

    def scatter(self, spark, *args, **kwargs) -> DataFrame:
        return self._g.scatter(spark, *args, **kwargs)

    def profile(self, spark, *args, **kwargs) -> DataFrame:
        return self._g.profile(spark, *args, **kwargs)

    def grid(self, spark, region=None, shape=None, spacing=None, output_col="scalars"):
        return self._g.grid(
            spark, region=region, shape=shape, spacing=spacing, output_col=output_col
        )
