"""Extension scaffolding (reference ``verde/base``).

Downstream projects subclass the reference's ``BaseGridder``
(base/base_classes.py:368-660) to get ``grid``/``scatter``/``profile``/
``score`` for free from a ``fit``/``predict`` pair.  The Spark analogue
here gives the same contract over DataFrames: implement

* ``fit(df, ...)`` setting ``self.region_``, and
* ``predict(df, output_col, easting=..., northing=...) -> DataFrame``

and inherit evaluation on regular grids, seeded random scatters, and
profiles, plus R² scoring — each a lazy plan ending in one ``predict``.
``least_squares``, ``check_fit_input`` and ``n_1d_arrays`` equivalents
round out the ``verde.base`` import surface (lstsq solves run inside
executors; the two array helpers are driver-side parity utilities).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame

from .lstsq import least_squares  # noqa: F401  (re-export, verde.base parity)


def n_1d_arrays(arrays: Sequence, n: int) -> Tuple[np.ndarray, ...]:
    """First *n* elements as raveled float64 arrays (reference
    base/utils.py)."""
    return tuple(np.ravel(np.asarray(a, dtype="float64")) for a in arrays[:n])


def check_fit_input(coordinates, data, weights):
    """Validate sizes like the reference's check_fit_input (base/utils.py):
    all coordinate/data/weight arrays must share one size."""
    sizes = {np.asarray(c).size for c in coordinates}
    if isinstance(data, tuple):
        sizes |= {np.asarray(d).size for d in data}
    else:
        # a non-tuple array is ONE data component (reference check_data):
        # iterating its elements would register each scalar as size 1
        sizes |= {np.asarray(data).size}
    if weights is not None:
        ws = weights if isinstance(weights, tuple) else (weights,)
        sizes |= {np.asarray(w).size for w in ws}
    if len(sizes) > 1:
        raise ValueError(f"Coordinate/data/weight arrays must have the same size; got sizes {sorted(sizes)}.")
    return coordinates, data, weights


def get_params(estimator) -> dict:
    """Constructor params of an estimator, sklearn-style (reference
    estimators inherit ``sklearn.base.BaseEstimator.get_params``): every
    named ``__init__`` argument read back from the attribute of the same
    name — the convention all estimators here follow."""
    import inspect

    sig = inspect.signature(type(estimator).__init__)
    params = {}
    for name, p in sig.parameters.items():
        if name == "self" or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if not hasattr(estimator, name):
            raise AttributeError(
                f"{type(estimator).__name__} does not store init param {name!r}; "
                "cannot introspect params for clone()"
            )
        params[name] = getattr(estimator, name)
    return params


def clone(estimator):
    """Unfitted copy of an estimator, sklearn ``clone`` semantics
    (reference cross_val_score clones per fold,
    /root/reference/verde/model_selection.py:771): reconstruct from
    constructor params, recursing into nested estimators so fitted state
    is never shared between folds. Non-estimator values (including the
    zero-arg factories used by :class:`~verde_spark.operators.vector.Vector`
    components and ``Chain`` steps) pass through untouched."""
    if isinstance(estimator, (list, tuple)):
        return type(estimator)(clone(e) for e in estimator)
    if hasattr(estimator, "fit") and (
        hasattr(estimator, "predict") or hasattr(estimator, "filter")
    ):
        params = {k: clone(v) for k, v in get_params(estimator).items()}
        return type(estimator)(**params)
    return estimator


class BaseGridder:
    """fit/predict → grid/scatter/profile/score, the Spark way.

    Subclasses set ``self.region_`` in ``fit`` and implement ``predict``;
    everything below composes coordinate generation with that predict, so
    the result is a single lazy plan (the node table never materializes
    driver-side).
    """

    region_: Optional[Tuple[float, float, float, float]] = None

    def predict(self, df: DataFrame, output_col: str = "prediction",
                easting: str = "easting", northing: str = "northing") -> DataFrame:
        raise NotImplementedError

    def grid(self, spark, region=None, shape=None, spacing=None,
             output_col: str = "scalars") -> DataFrame:
        """Evaluate on a regular grid (reference BaseGridder.grid)."""
        from .coordinates import grid_coordinates

        nodes = grid_coordinates(spark, region or self.region_, shape=shape,
                                 spacing=spacing)
        return self.predict(nodes, output_col)

    def scatter(self, spark, region=None, size: int = 300, random_state=0,
                output_col: str = "scalars") -> DataFrame:
        """Evaluate on seeded uniform random points (reference
        BaseGridder.scatter, base/base_classes.py:502-560)."""
        from .coordinates import scatter_points_df

        pts = scatter_points_df(spark, region or self.region_, size, random_state)
        return self.predict(pts, output_col)

    def profile(self, spark, point1, point2, size: int,
                output_col: str = "scalars") -> DataFrame:
        """Evaluate along a straight segment, with distances (reference
        BaseGridder.profile, base/base_classes.py:594-660)."""
        import pandas as pd

        from .coordinates import profile_coordinates

        (e, n), dist = profile_coordinates(point1, point2, size)
        pts = spark.createDataFrame(
            pd.DataFrame({"easting": e, "northing": n, "distance": dist})
        )
        return self.predict(pts, output_col)

    def filter(self, df: DataFrame, data_col: str = "scalars",
               weight_col: Optional[str] = None, easting: str = "easting",
               northing: str = "northing") -> DataFrame:
        """fit + replace data with residuals — the default every gridder
        inherits in the reference (base_classes.py:273-316), which is what
        lets any gridder serve as a Chain step."""
        from pyspark.sql import functions as F

        self.fit(df, data_col=data_col, weight_col=weight_col,
                 easting=easting, northing=northing)
        pred = self.predict(df, "__filter_pred", easting=easting, northing=northing)
        return pred.withColumn(
            data_col, F.col(data_col) - F.col("__filter_pred")
        ).drop("__filter_pred")

    def score(self, df: DataFrame, data_col: str = "scalars",
              weight_col: Optional[str] = None, easting: str = "easting",
              northing: str = "northing") -> float:
        """R² of predictions against *data_col* (reference
        BaseGridder.score, base/base_classes.py:318-366) — one predict plus
        one aggregate."""
        from .model_selection import r2_score

        pred = self.predict(df, "__pred", easting=easting, northing=northing)
        return r2_score(pred, data_col, "__pred", weight_col)


class BaseBlockCrossValidator:
    """Marker base for blocked CV splitters (reference
    base/base_classes.py:31-140): subclasses implement ``split(df)``
    yielding (train_df, test_df) pairs keyed by spatial block."""

    def split(self, df: DataFrame):
        raise NotImplementedError

    def get_n_splits(self) -> int:
        raise NotImplementedError
