"""Rolling and expanding spatial windows (verde coordinates.py:947-1378).

``rolling_window``: overlapping square windows of a given size, centers on
a regular grid over the region shrunk by size/2 (coordinates.py:1171-1177);
a point belongs to every window whose Chebyshev distance to the center is
≤ size/2 (``query_ball_point(p=inf)``, :1183-1185). Distributed form: the
candidate window indices of a point are a small integer range → ``explode``
+ filter — the halo-exchange primitive, never a cartesian join. Returns a
point↔window assignment table; downstream ``groupBy("window")`` runs any
per-window computation.

``expanding_window``: concentric windows around one center
(coordinates.py:1225-1378) — one Chebyshev-distance column + a filter per
size (all sizes in one pass via the smallest-containing-size rank).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..coordinates import BlockGrid, _resolve_axes
from ..geometry import check_region, get_region


def rolling_window(
    df: DataFrame,
    size: float,
    spacing=None,
    shape=None,
    region: Optional[Sequence[float]] = None,
    adjust: str = "spacing",
    easting: str = "easting",
    northing: str = "northing",
) -> Tuple[DataFrame, "BlockGrid"]:
    """Point↔window assignment table.

    Output columns: input columns + ``window`` (row-major center index,
    northing-major like verde), ``center_easting``, ``center_northing``.
    Points can appear in several windows (overlap is the point); windows
    without points simply don't appear.
    """
    if region is None:
        region = get_region(df, easting, northing)
    w, e, s, n = check_region(region)
    half = float(size) / 2
    # centers live on a grid-line registered grid of the shrunk region
    # (verde coordinates.py:1171-1177)
    center_region = (w + half, e - half, s + half, n - half)
    east_ax, north_ax = _resolve_axes(
        center_region, shape=shape, spacing=spacing, adjust=adjust, pixel_register=False
    )

    def rng(coord, axis):
        # candidate center indices with |coord - center| <= half:
        # ceil((coord - half - start)/step) .. floor((coord + half - start)/step)
        # — widened by ONE index each side because this arithmetic uses
        # start + i*step while the axis pins its last center to the
        # exact region edge (forced_stop, line_coordinates semantics);
        # the 1-ulp disagreement is settled by the EXACT membership
        # filter below against the centers actually emitted
        lo = F.ceil((coord - F.lit(half) - F.lit(axis.start)) / F.lit(axis.step)).cast("long") - F.lit(1)
        hi = F.floor((coord + F.lit(half) - F.lit(axis.start)) / F.lit(axis.step)).cast("long") + F.lit(1)
        return (
            F.greatest(F.lit(0), lo),
            F.least(F.lit(axis.size - 1), hi),
        )

    e_col, n_col = F.col(easting), F.col(northing)
    ix_lo, ix_hi = rng(e_col, east_ax)
    iy_lo, iy_hi = rng(n_col, north_ax)
    out = (
        df.withColumn("__wix", F.explode(F.when(ix_lo <= ix_hi, F.sequence(ix_lo, ix_hi)).otherwise(F.array().cast("array<bigint>"))))
        .withColumn("__wiy", F.explode(F.when(iy_lo <= iy_hi, F.sequence(iy_lo, iy_hi)).otherwise(F.array().cast("array<bigint>"))))
        .withColumn("window", F.col("__wiy") * F.lit(east_ax.size) + F.col("__wix"))
        .withColumn("center_easting", east_ax.expr(F.col("__wix")))
        .withColumn("center_northing", north_ax.expr(F.col("__wiy")))
        # membership decided against the EMITTED centers (incl. the
        # forced-stop last one) — the index range is only a candidate
        # superset, so assignments always agree with the returned
        # center_easting/center_northing columns (verde query_ball_point
        # over the actual centers)
        .filter(
            (F.abs(e_col - F.col("center_easting")) <= F.lit(half))
            & (F.abs(n_col - F.col("center_northing")) <= F.lit(half))
        )
        .drop("__wix", "__wiy")
    )
    grid = BlockGrid(region=(w, e, s, n), east=east_ax, north=north_ax)
    return out, grid


def expanding_window(
    df: DataFrame,
    center: Tuple[float, float],
    sizes: Sequence[float],
    easting: str = "easting",
    northing: str = "northing",
) -> DataFrame:
    """Points labeled with the smallest window size containing them.

    Output: input columns + ``chebyshev`` + ``min_size_idx`` (index of the
    smallest size whose window contains the point; null when outside all).
    ``df.filter(col("min_size_idx") <= i)`` reproduces verde's per-size
    index lists (coordinates.py:1370-1377) in one pass.
    """
    cx, cy = (float(c) for c in center)
    cheb = F.greatest(
        F.abs(F.col(easting) - F.lit(cx)), F.abs(F.col(northing) - F.lit(cy))
    )
    out = df.withColumn("chebyshev", cheb)
    idx_expr = F.lit(None).cast("int")
    for i in reversed(range(len(sizes))):
        idx_expr = F.when(F.col("chebyshev") <= float(sizes[i]) / 2, F.lit(i)).otherwise(idx_expr)
    return out.withColumn("min_size_idx", idx_expr)
