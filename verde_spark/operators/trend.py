"""2D polynomial trend — fully distributed exact fit via normal equations.

verde trend.py:17-255: Jacobian columns are ``easting**i * northing**j``
for (i, j) with ``i+j <= degree`` sorted by total degree
(polynomial_power_combinations, trend.py:221-255); fit is unscaled-column
least squares (base/least_squares.py) and predict a polynomial evaluation.

Spark story: the Jacobian is never materialized as a distributed matrix.
For k = (d+1)(d+2)/2 coefficients we aggregate the k×k normal-equations
matrix ``JᵀWJ`` and vector ``JᵀWd`` as k(k+3)/2 native ``sum`` aggregates
(map-side partial → one tiny row at the driver), apply the reference's
column scaling, solve the k×k system driver-side, and predict with a pure
column expression. Exact (same math, associativity-of-sum differences
only), one shuffle of a single row, scales to any number of input rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..base import BaseGridder


def polynomial_power_combinations(degree: int) -> Tuple[Tuple[int, int], ...]:
    """(i, j) pairs for ``x**i * y**j`` (verde trend.py:221-255)."""
    if degree < 0:
        raise ValueError(f"Invalid polynomial degree '{degree}'. Must be >= 0.")
    combinations = ((i, j) for j in range(degree + 1) for i in range(degree + 1 - j))
    return tuple(sorted(combinations, key=sum))


def _feature_exprs(degree: int, easting: str, northing: str) -> List[Column]:
    e, n = F.col(easting), F.col(northing)
    feats = []
    for i, j in polynomial_power_combinations(degree):
        expr = F.lit(1.0)
        if i:
            expr = expr * F.pow(e, F.lit(float(i)))
        if j:
            expr = expr * F.pow(n, F.lit(float(j)))
        feats.append(expr)
    return feats


def trend_fit(
    df: DataFrame,
    degree: int,
    easting: str = "easting",
    northing: str = "northing",
    data_col: str = "scalars",
    weight_col: Optional[str] = None,
) -> np.ndarray:
    """Fit the polynomial; returns the coefficient vector (driver-side, size k).

    Normal-equation aggregation with the reference's column scaling
    (base/least_squares.py:57-71): scaling by the population column std is
    itself two passes of sums, folded into the same aggregate set
    (E[x²]−E[x]² per feature — adequate for the conditioning role scaling
    plays; the solve is done at full double precision on the k×k system).
    """
    combos = polynomial_power_combinations(degree)
    k = len(combos)
    feats = _feature_exprs(degree, easting, northing)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    d = F.col(data_col)

    aggs = [F.sum(w).alias("sw"), F.count(F.lit(1)).alias("n")]
    for a in range(k):
        aggs.append(F.sum(feats[a]).alias(f"s1_{a}"))  # unweighted, for scaling
        aggs.append(F.sum(feats[a] * feats[a]).alias(f"s2_{a}"))
        aggs.append(F.sum(w * feats[a] * d).alias(f"jd_{a}"))
        for b in range(a, k):
            aggs.append(F.sum(w * feats[a] * feats[b]).alias(f"jj_{a}_{b}"))
    row = df.agg(*aggs).first()

    n = row["n"]
    scale = np.empty(k)
    for a in range(k):
        var = row[f"s2_{a}"] / n - (row[f"s1_{a}"] / n) ** 2
        scale[a] = np.sqrt(var) if var > 1e-24 else 1.0
    jtj = np.empty((k, k))
    jtd = np.empty(k)
    for a in range(k):
        jtd[a] = row[f"jd_{a}"] / scale[a]
        for b in range(a, k):
            jtj[a, b] = jtj[b, a] = row[f"jj_{a}_{b}"] / (scale[a] * scale[b])
    coefs, *_ = np.linalg.lstsq(jtj, jtd, rcond=None)
    return coefs / scale


def trend_predict_expr(
    coefs: Sequence[float],
    degree: int,
    easting: str = "easting",
    northing: str = "northing",
) -> Column:
    """Polynomial evaluation as one column expression (verde trend.py:138-165)."""
    feats = _feature_exprs(degree, easting, northing)
    expr = F.lit(0.0)
    for c, f in zip(coefs, feats):
        expr = expr + F.lit(float(c)) * f
    return expr


class Trend(BaseGridder):
    """Estimator-style wrapper (verde trend.py:17-218). Inherits
    grid/scatter/profile/score from BaseGridder like the reference, and
    records ``region_`` at fit (reference trend.py:133)."""

    def __init__(self, degree: int):
        self.degree = degree
        self.coef_: Optional[np.ndarray] = None

    def fit(self, df: DataFrame, data_col: str = "scalars", weight_col: Optional[str] = None,
            easting: str = "easting", northing: str = "northing") -> "Trend":
        from ..geometry import get_region

        self.coef_ = trend_fit(df, self.degree, easting, northing, data_col, weight_col)
        self.region_ = get_region(df, easting, northing)
        return self

    def predict_expr(self, easting: str = "easting", northing: str = "northing") -> Column:
        if self.coef_ is None:
            raise RuntimeError("Trend is not fitted.")
        return trend_predict_expr(self.coef_, self.degree, easting, northing)

    def predict(self, df: DataFrame, output_col: str = "trend",
                easting: str = "easting", northing: str = "northing") -> DataFrame:
        return df.withColumn(output_col, self.predict_expr(easting, northing))

    def filter(self, df: DataFrame, data_col: str = "scalars", weight_col: Optional[str] = None,
               easting: str = "easting", northing: str = "northing") -> DataFrame:
        """fit + replace data with residuals (BaseGridder.filter,
        base/base_classes.py:273-316)."""
        self.fit(df, data_col, weight_col, easting, northing)
        return df.withColumn(data_col, F.col(data_col) - self.predict_expr(easting, northing))
