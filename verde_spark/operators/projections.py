"""Projections: the pluggable CRS hook + full raster reprojection.

* ``project_udf`` — wrap any vectorized ``projection(east, north) ->
  (east', north')`` callable (pyproj-style) as an Arrow pandas UDF
  (verde base/base_classes.py:785-818 F5). The callable must be
  array-in/array-out; per-row Python never happens.
* ``project_points`` — apply it to a DataFrame's coordinate columns.
* ``project_grid`` — the 5-stage pipeline of verde projections.py:56-176:
  grid(table) → project points → optional BlockReduce(mean) anti-alias →
  re-interpolate with any gridder (KNeighbors/Spline) onto a regular grid
  in projected coordinates → convex-hull mask of extrapolated nodes.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry import get_region


def project_udf(projection: Callable):
    """Arrow-vectorized (east, north) → struct(easting, northing) UDF."""
    from pyspark.sql.functions import pandas_udf

    schema = T.StructType(
        [T.StructField("easting", T.DoubleType()), T.StructField("northing", T.DoubleType())]
    )

    @pandas_udf(schema)
    def proj(east: pd.Series, north: pd.Series) -> pd.DataFrame:
        pe, pn = projection(east.to_numpy("float64"), north.to_numpy("float64"))
        return pd.DataFrame({"easting": pe, "northing": pn})

    return proj


def project_points(
    df: DataFrame,
    projection: Callable,
    easting: str = "easting",
    northing: str = "northing",
    out_easting: Optional[str] = None,
    out_northing: Optional[str] = None,
) -> DataFrame:
    """Project the first two coordinates, pass everything else through
    (verde base_classes.py:785-818)."""
    out_e = out_easting or easting
    out_n = out_northing or northing
    proj = project_udf(projection)
    out = df.withColumn("__proj", proj(F.col(easting), F.col(northing)))
    return (
        out.withColumn(out_e, F.col("__proj.easting"))
        .withColumn(out_n, F.col("__proj.northing"))
        .drop("__proj")
    )


def project_grid(
    grid_table: DataFrame,
    projection: Callable,
    gridder,
    spacing: Optional[float] = None,
    shape: Optional[Tuple[int, int]] = None,
    antialias: bool = True,
    mask_extrapolated: bool = True,
    data_col: str = "scalars",
) -> DataFrame:
    """Reproject a raster (as node table) — verde projections.py:56-176.

    Stages: project nodes (F5) → optional BlockReduce-mean anti-alias at
    the target spacing (projections.py:161-164) → fit *gridder* on the
    projected points → evaluate on a regular grid over the projected
    bounding region → hull-mask nodes outside the projected data footprint
    (projections.py:175). Returns the masked node table.
    """
    from ..operators.blockreduce import block_reduce
    from ..operators.masks import convex_hull, inside_hull_expr
    from ..coordinates import grid_coordinates

    spark = grid_table.sparkSession
    pts = project_points(
        grid_table.select("easting", "northing", data_col).filter(F.col(data_col).isNotNull()),
        projection,
    ).persist()
    region = get_region(pts)
    if spacing is None and shape is None:
        raise ValueError("Either spacing or shape must be provided.")
    if antialias:
        dec, _ = block_reduce(
            pts, "mean", spacing=spacing, shape=shape, region=region, data_cols=(data_col,)
        )
    else:
        dec = pts
    gridder.fit(dec, data_col=data_col)
    nodes = grid_coordinates(spark, region, spacing=spacing, shape=shape)
    out = gridder.predict(nodes, data_col)
    if mask_extrapolated:
        hull = convex_hull(pts)
        out = out.withColumn(
            data_col,
            F.when(inside_hull_expr(hull), F.col(data_col)).otherwise(F.lit(None).cast("double")),
        )
    pts.unpersist()
    return out
