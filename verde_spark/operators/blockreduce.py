"""Blocked aggregation — BlockReduce / BlockMean as distributed groupBy-agg.

Re-expresses verde blockreduce.py (BlockReduce :36-243, BlockMean
:246-506) on Spark: the block label is the pure-arithmetic shuffle key
from :class:`~verde_spark.coordinates.BlockGrid`, every named reduction
compiles to a native JVM aggregate (map-side partial + final, AQE-coalesced
shuffle), and the weighted modes are aggregate algebra instead of pandas
``groupby.apply``. Empty blocks are omitted for free; output is ordered by
block label to match the pandas-groupby ordering contract
(blockreduce.py:179).

Scale notes (10^12 rows): mean/sum/min/max/count/var are algebraic →
map-side combine shrinks the shuffle to ~n_blocks rows per task before the
exchange; no salting needed for the agg itself since partials bound any
per-key skew. ``median`` is the one non-algebraic reduction: Spark's exact
``median`` buffers per-key values — for skewed web-scale cells prefer
``approx_median`` (percentile_approx) or pre-salted two-level medians.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..coordinates import BlockGrid
from ..geometry import get_region

#: Named reductions → (unweighted Spark agg, numpy equivalent doc).
#: np.std/np.var are population (ddof=0) → stddev_pop/var_pop.
_REDUCTIONS = {
    "mean": F.avg,
    "median": F.median,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
    "std": F.stddev_pop,
    "var": F.var_pop,
    "first": F.first,
    # the 100 TB median: a bounded t-digest-style sketch with map-side
    # partial merge (exact `median` buffers every value of a block on one
    # task — fine at decimation scale, a skew hazard for raw-scale blocks)
    "median_approx": lambda c: F.percentile_approx(c, 0.5, 10_000),
}


def _normalize_reduction(reduction):
    """Map the reference's callable-reduction API onto the registry.

    Verde's ``BlockReduce(np.median, ...)`` takes any callable
    (blockreduce.py:100-117). Known numpy/builtin reductions normalize to
    their native JVM aggregate (the fast path — map-side combine, no
    Python); anything else is returned as-is for the grouped-Arrow
    fallback in :func:`block_reduce`.
    """
    if isinstance(reduction, str):
        return reduction
    import builtins

    import numpy as np

    known = {
        np.mean: "mean", np.nanmean: "mean", np.average: "mean",
        np.median: "median", np.nanmedian: "median",
        np.sum: "sum", np.nansum: "sum", builtins.sum: "sum",
        np.min: "min", np.amin: "min", np.nanmin: "min", builtins.min: "min",
        np.max: "max", np.amax: "max", np.nanmax: "max", builtins.max: "max",
        np.std: "std", np.nanstd: "std",
        np.var: "var", np.nanvar: "var",
        builtins.len: "count",
    }
    try:
        return known.get(reduction, reduction)
    except TypeError:  # unhashable callable
        return reduction


def _block_reduce_callable(
    labeled: DataFrame,
    grid: BlockGrid,
    reduction,
    center_coordinates: bool,
    easting: str,
    northing: str,
    extra_coord_cols: Sequence[str],
    data_cols: Sequence[str],
    weight_cols: Optional[Sequence[str]],
    sort: bool,
) -> DataFrame:
    """Grouped-Arrow fallback for arbitrary callable reductions.

    One ``applyInPandas`` per block — each block's values arrive as one
    Arrow batch and the callable sees plain NumPy arrays, exactly the
    reference's pandas-groupby contract (weights passed via the
    ``weights`` kwarg, blockreduce.py:19-31; coordinates always reduced
    unweighted). This is the documented slow path: per-block Python, no
    map-side combine — use the named reductions where one exists.
    """
    import pandas as pd

    coord_cols = [] if center_coordinates else [easting, northing]
    out_cols = [*coord_cols, *extra_coord_cols, *data_cols]
    schema = "block bigint, " + ", ".join(f"`{c}` double" for c in out_cols)
    wcols = list(weight_cols) if weight_cols is not None else None
    dcols = list(data_cols)
    ucols = [*coord_cols, *extra_coord_cols]

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {"block": pdf["block"].iloc[0]}
        for c in ucols:
            row[c] = float(reduction(pdf[c].to_numpy()))
        for i, c in enumerate(dcols):
            v = pdf[c].to_numpy()
            if wcols is not None:
                row[c] = float(reduction(v, weights=pdf[wcols[i]].to_numpy()))
            else:
                row[c] = float(reduction(v))
        return pd.DataFrame([row])

    out = labeled.groupBy("block").applyInPandas(agg, schema)
    if center_coordinates:
        ce, cn = grid.center_exprs("block")
        out = out.withColumn(easting, ce).withColumn(northing, cn)
    out = out.select("block", easting, northing, *extra_coord_cols, *data_cols)
    return out.orderBy("block") if sort else out


def _weighted_agg(reduction: str, value: Column, weight: Column) -> Column:
    """Weighted version of a reduction, as aggregate algebra.

    Verde attaches weights via ``np.average`` closures
    (blockreduce.py:19-33); the only weighted reduction its tests exercise
    is the weighted mean = sum(w*x)/sum(w).
    """
    if reduction in ("mean", "average"):
        return F.sum(weight * value) / F.sum(weight)
    raise NotImplementedError(
        f"Weighted reduction '{reduction}' is not expressible as native aggregate "
        "algebra; use BlockReduce with reduction='mean' or the applyInPandas escape hatch."
    )


def _resolve_grid(
    df: DataFrame,
    spacing,
    shape,
    adjust: str,
    region,
    easting: str,
    northing: str,
) -> BlockGrid:
    if region is None:
        region = get_region(df, easting, northing)
    return BlockGrid.from_region(region, spacing=spacing, shape=shape, adjust=adjust)


def block_reduce(
    df: DataFrame,
    reduction: str = "mean",
    spacing=None,
    shape=None,
    region: Optional[Sequence[float]] = None,
    adjust: str = "spacing",
    center_coordinates: bool = False,
    easting: str = "easting",
    northing: str = "northing",
    data_cols: Sequence[str] = ("scalars",),
    weight_cols: Optional[Sequence[str]] = None,
    extra_coord_cols: Sequence[str] = (),
    grid: Optional[BlockGrid] = None,
    sort: bool = True,
) -> Tuple[DataFrame, BlockGrid]:
    """verde ``BlockReduce.filter`` (blockreduce.py:117-243) as one groupBy.

    Coordinates are reduced with the *unweighted* reduction (or replaced by
    block centers when ``center_coordinates=True``, reconstructed from the
    label by inverting the index arithmetic — blockreduce.py:237-240); data
    columns use the weighted form when ``weight_cols`` is given.

    Returns ``(result, grid)`` with result columns
    ``block, <easting>, <northing>, *extra, *data`` ordered by block label.
    """
    if grid is None:
        grid = _resolve_grid(df, spacing, shape, adjust, region, easting, northing)
    reduction = _normalize_reduction(reduction)
    labeled = df.withColumn("block", grid.label_expr(easting, northing))
    if callable(reduction):
        return (
            _block_reduce_callable(
                labeled, grid, reduction, center_coordinates, easting,
                northing, extra_coord_cols, data_cols, weight_cols, sort,
            ),
            grid,
        )
    if reduction not in _REDUCTIONS:
        raise ValueError(f"Unknown reduction '{reduction}'. One of {sorted(_REDUCTIONS)}.")
    agg_fn = _REDUCTIONS[reduction]

    aggs = []
    if center_coordinates:
        # centers are derived from the label after the agg — no coord agg.
        pass
    else:
        aggs.append(agg_fn(F.col(easting)).alias(easting))
        aggs.append(agg_fn(F.col(northing)).alias(northing))
    for col in extra_coord_cols:
        aggs.append(agg_fn(F.col(col)).alias(col))
    for i, col in enumerate(data_cols):
        if weight_cols is not None:
            aggs.append(_weighted_agg(reduction, F.col(col), F.col(weight_cols[i])).alias(col))
        else:
            aggs.append(agg_fn(F.col(col)).alias(col))
    out = labeled.groupBy("block").agg(*aggs)
    if center_coordinates:
        ce, cn = grid.center_exprs("block")
        out = out.withColumn(easting, ce).withColumn(northing, cn)
    cols = ["block", easting, northing, *extra_coord_cols, *data_cols]
    out = out.select(*cols)
    # ordering by label is verde's output contract (pandas groupby sorts
    # keys); sort=False skips the range-partition exchange when the caller
    # doesn't need it (pipelines keyed on block downstream)
    return (out.orderBy("block") if sort else out), grid


def variance_to_weights(
    df: DataFrame,
    variance_col: str = "variance",
    weight_col: str = "weight",
    tol: float = 1e-15,
    min_strategy: str = "window",
) -> DataFrame:
    """verde ``variance_to_weights`` (utils.py:122-180) as a DataFrame op.

    ``w = min(var[var>tol]) / var``, w=1 where ``var<=tol`` (NaN/null → 0 →
    1). The global min is a genuine barrier; two strategies:

    * ``"window"`` (default): ``min() over ()`` on *df* itself — df here is
      a per-block aggregate (≪ input rows), and keeping the min downstream
      of the same subtree means **one scan of the raw input**. A separate
      broadcast branch looks cheaper but Catalyst's column pruning makes
      the two agg subtrees differ, defeating exchange reuse → the raw
      table gets scanned twice (observed on the 16M-row bench plan).
    * ``"broadcast"``: 1-row aggregate broadcast-cross-joined back — no
      single-partition exchange of the block table; use when the block
      table itself is huge **and** persisted (so the branch doesn't
      recompute the input scan).
    """
    from pyspark.sql import Window

    var = F.coalesce(F.nanvl(F.col(variance_col), F.lit(0.0)), F.lit(0.0))
    clean = df.withColumn("__var", var)
    nonzero_min = F.min(F.when(F.col("__var") > tol, F.col("__var")))
    if min_strategy == "window":
        out = clean.withColumn("__minvar", nonzero_min.over(Window.partitionBy()))
    elif min_strategy == "broadcast":
        minvar = clean.agg(nonzero_min.alias("__minvar"))
        out = clean.crossJoin(F.broadcast(minvar))
    else:
        raise ValueError(f"Unknown min_strategy '{min_strategy}'")
    w = (
        F.when((F.col("__var") > tol) & F.col("__minvar").isNotNull(), F.col("__minvar") / F.col("__var"))
        .otherwise(F.lit(1.0))
    )
    return out.withColumn(weight_col, w).drop("__var", "__minvar")


def block_mean(
    df: DataFrame,
    spacing=None,
    shape=None,
    region: Optional[Sequence[float]] = None,
    adjust: str = "spacing",
    center_coordinates: bool = False,
    uncertainty: bool = False,
    easting: str = "easting",
    northing: str = "northing",
    data_cols: Sequence[str] = ("scalars",),
    weight_cols: Optional[Sequence[str]] = None,
    grid: Optional[BlockGrid] = None,
    sort: bool = True,
) -> Tuple[DataFrame, BlockGrid]:
    """verde ``BlockMean.filter`` (blockreduce.py:246-506): blocked mean +
    output weights, three modes.

    (a) no weights → mean + **sample** variance (pandas ``var`` ddof=1,
        blockreduce.py:465-471; single-point blocks → null → 0 → weight 1);
    (b) ``uncertainty=True`` → weighted mean + propagated variance
        ``1/sum(w)`` (blockreduce.py:437-458);
    (c) weights, ``uncertainty=False`` → weighted mean + weighted variance
        ``sum(w*(x-μ_w)²)/sum(w)`` (blockreduce.py:474-506). Computed in two
        passes (means, then residual agg via broadcast join of the per-block
        means) so constant data gives *exactly* zero variance like the
        reference — the one-pass E[x²]−μ² identity leaves ~1e-12 cancellation
        noise that breaks the weight=1 clip at tol=1e-15.

    Output weights are :func:`variance_to_weights` of the per-block variance
    (global-min barrier). Output columns: ``block, easting, northing,
    *data, *weights`` (weight col name = ``weight_<data>``).
    """
    if grid is None:
        grid = _resolve_grid(df, spacing, shape, adjust, region, easting, northing)
    if uncertainty and weight_cols is None:
        raise ValueError(
            "Weights are required for uncertainty propagation. Either provide "
            "weights (as 1/uncertainty**2) or use uncertainty=False."
        )
    labeled = df.withColumn("block", grid.label_expr(easting, northing))

    aggs = []
    if not center_coordinates:
        aggs += [F.avg(easting).alias(easting), F.avg(northing).alias(northing)]
    var_names: Dict[str, str] = {}
    if weight_cols is None:
        for col in data_cols:
            aggs.append(F.avg(col).alias(col))
            var_names[col] = f"__var_{col}"
            aggs.append(F.var_samp(col).alias(var_names[col]))
        out = labeled.groupBy("block").agg(*aggs)
    elif uncertainty:
        for col, wcol in zip(data_cols, weight_cols):
            aggs.append((F.sum(F.col(wcol) * F.col(col)) / F.sum(wcol)).alias(col))
            var_names[col] = f"__var_{col}"
            aggs.append((F.lit(1.0) / F.sum(wcol)).alias(var_names[col]))
        out = labeled.groupBy("block").agg(*aggs)
    else:
        # two-pass weighted variance: exact zero for constant blocks.
        mean_aggs = []
        for col, wcol in zip(data_cols, weight_cols):
            mean_aggs.append((F.sum(F.col(wcol) * F.col(col)) / F.sum(wcol)).alias(f"__mean_{col}"))
        means = labeled.groupBy("block").agg(*mean_aggs)
        # no broadcast HINT: the means table is one row per non-empty
        # block, which at fine spacings over a 10^12-row region exceeds
        # the broadcast hard limit — AQE converts the join to broadcast
        # at runtime whenever the side actually is small
        joined = labeled.join(means, "block")
        for col, wcol in zip(data_cols, weight_cols):
            mu = F.col(f"__mean_{col}")
            aggs.append(F.first(mu).alias(col))
            var_names[col] = f"__var_{col}"
            aggs.append(
                (F.sum(F.col(wcol) * (F.col(col) - mu) * (F.col(col) - mu)) / F.sum(wcol)).alias(
                    var_names[col]
                )
            )
        out = joined.groupBy("block").agg(*aggs)

    if center_coordinates:
        ce, cn = grid.center_exprs("block")
        out = out.withColumn(easting, ce).withColumn(northing, cn)

    weight_names = []
    for col in data_cols:
        wname = f"weight_{col}"
        out = variance_to_weights(out, variance_col=var_names[col], weight_col=wname)
        weight_names.append(wname)
    cols = ["block", easting, northing, *data_cols, *weight_names]
    out = out.select(*cols)
    return (out.orderBy("block") if sort else out), grid


class BlockReduce:
    """Thin estimator-style wrapper mirroring verde's class API
    (blockreduce.py:36-243) over :func:`block_reduce`."""

    def __init__(
        self,
        reduction: str = "mean",
        spacing=None,
        region=None,
        adjust: str = "spacing",
        center_coordinates: bool = False,
        shape=None,
    ):
        self.reduction = reduction
        self.spacing = spacing
        self.region = region
        self.adjust = adjust
        self.center_coordinates = center_coordinates
        self.shape = shape

    def filter(self, df: DataFrame, data_col: Optional[str] = None,
               weight_col: Optional[str] = None, **kwargs) -> DataFrame:
        # Chain's step protocol passes SINGULAR data_col/weight_col; map to
        # the plural block_reduce params (round-1 behavior raised TypeError
        # here and Chain's no-kwargs fallback silently dropped custom
        # easting/northing column names)
        if data_col is not None and "data_cols" not in kwargs:
            kwargs["data_cols"] = (data_col,)
        if weight_col is not None and "weight_cols" not in kwargs:
            kwargs["weight_cols"] = (weight_col,)
        out, _ = block_reduce(
            df,
            reduction=self.reduction,
            spacing=self.spacing,
            shape=self.shape,
            region=self.region,
            adjust=self.adjust,
            center_coordinates=self.center_coordinates,
            **kwargs,
        )
        return out


class BlockMean:
    """Estimator-style wrapper mirroring verde's ``BlockMean`` class API
    (blockreduce.py:246-506) over :func:`block_mean` — blocked mean with
    output weights in all three weight modes.

    ``filter`` emits ``weight_<col>`` columns (variance_to_weights of the
    per-block variance) that downstream Chain steps consume.
    """

    def __init__(
        self,
        spacing=None,
        region=None,
        adjust: str = "spacing",
        center_coordinates: bool = False,
        uncertainty: bool = False,
        shape=None,
    ):
        self.spacing = spacing
        self.region = region
        self.adjust = adjust
        self.center_coordinates = center_coordinates
        self.uncertainty = uncertainty
        self.shape = shape

    def filter(self, df: DataFrame, data_col: Optional[str] = None,
               weight_col: Optional[str] = None, **kwargs) -> DataFrame:
        # singular Chain-protocol kwargs → plural block_mean params (same
        # mapping as BlockReduce.filter)
        if data_col is not None and "data_cols" not in kwargs:
            kwargs["data_cols"] = (data_col,)
        if weight_col is not None and "weight_cols" not in kwargs:
            kwargs["weight_cols"] = (weight_col,)
        out, _ = block_mean(
            df,
            spacing=self.spacing,
            shape=self.shape,
            region=self.region,
            adjust=self.adjust,
            center_coordinates=self.center_coordinates,
            uncertainty=self.uncertainty,
            **kwargs,
        )
        return out
