"""Array-limit utilities (reference ``verde/utils.py`` ``maxabs``/``minmax``).

The reference computes colorbar limits from in-memory arrays; here the
same statistics run as ONE Spark aggregation over any number of columns
(stacked via ``explode(array(...))`` so a single percentile spans all of
them, matching the reference's "single maximum across all arrays"
contract).  NumPy inputs take a driver-side fast path with identical
semantics (both engines use linear-interpolation percentiles).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stacked(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """All values of *cols* as one double column ``v`` (one scan, no shuffle
    below the final single-row aggregate)."""
    return df.select(
        F.explode(F.array(*[F.col(c).cast("double") for c in cols])).alias("v")
    )


def _resolve(df: DataFrame, cols: Optional[Sequence[str]]) -> Sequence[str]:
    if cols:
        return list(cols)
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float", "integer", "long", "short")
    ]
    if not numeric:
        raise ValueError("no numeric columns to aggregate; pass cols=")
    return numeric


def maxabs(data, cols: Optional[Sequence[str]] = None, nan: bool = True,
           percentile: float = 100):
    """Maximum (or percentile) absolute value across columns/arrays
    (reference utils.py ``maxabs``: nanpercentile of \\|values\\|).

    ``data`` is a DataFrame (aggregated in one Spark job over *cols*,
    default = all numeric columns) or one/more array-likes (NumPy path).
    ``nan=False`` propagates NaN like ``np.percentile`` does.
    """
    if isinstance(data, DataFrame):
        v = _stacked(data, _resolve(data, cols))
        clean = v.filter(~F.isnan("v") & F.col("v").isNotNull())
        row = clean.agg(
            F.percentile(F.abs(F.col("v")), F.lit(percentile / 100.0)).alias("p")
        ).first()
        if not nan:
            if v.filter(F.isnan("v")).limit(1).count():
                return float("nan")
        return float(row["p"]) if row["p"] is not None else float("nan")
    arrays = data if isinstance(data, (tuple, list)) else (data,)
    values = np.abs(np.concatenate([np.ravel(np.asarray(a, dtype="float64")) for a in arrays]))
    func = np.nanpercentile if nan else np.percentile
    return float(func(values, percentile))


def minmax(data, cols: Optional[Sequence[str]] = None, nan: bool = True,
           min_percentile: float = 0, max_percentile: float = 100):
    """(min, max) — or the given percentiles — across columns/arrays
    (reference utils.py ``minmax``)."""
    if isinstance(data, DataFrame):
        v = _stacked(data, _resolve(data, cols))
        clean = v.filter(~F.isnan("v") & F.col("v").isNotNull())
        row = clean.agg(
            F.percentile(F.col("v"), F.lit(min_percentile / 100.0)).alias("lo"),
            F.percentile(F.col("v"), F.lit(max_percentile / 100.0)).alias("hi"),
        ).first()
        if not nan and v.filter(F.isnan("v")).limit(1).count():
            return (float("nan"), float("nan"))
        lo = float(row["lo"]) if row["lo"] is not None else float("nan")
        hi = float(row["hi"]) if row["hi"] is not None else float("nan")
        return (lo, hi)
    arrays = data if isinstance(data, (tuple, list)) else (data,)
    values = np.concatenate([np.ravel(np.asarray(a, dtype="float64")) for a in arrays])
    func = np.nanpercentile if nan else np.percentile
    return (float(func(values, min_percentile)), float(func(values, max_percentile)))
