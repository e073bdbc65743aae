"""Raster ↔ vector conversion and Surfer grid IO.

* ``grid_to_table`` (verde utils.py:691-813): a raster (2D array / node
  expressions) → row-per-node DataFrame. In this engine grids already
  *are* node tables (coordinates.grid_coordinates); this module adds the
  inverse and the file format.
* ``table_to_grid`` (verde utils.py:373-522 make_xarray_grid): node table
  → driver-side 2D NumPy arrays (and optionally an xarray.Dataset when
  xarray is installed) for parity testing / plotting at the edge. The
  distributed form of a raster stays the node table — pivoting 10^12
  nodes into one array is the anti-pattern.
* ``load_surfer`` (verde io.py:14-134): Surfer ASCII .grd reader with the
  header-integrity checks and the >=1.70141e38 NaN sentinel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grid_to_table(
    grid_values: np.ndarray,
    region,
    spark: SparkSession,
    data_name: str = "scalars",
) -> DataFrame:
    """2D row-major grid array + region → node DataFrame
    (iy, ix, northing, easting, value). Row 0 is the southmost row, like
    verde's meshgrid convention."""
    import pandas as pd

    n_north, n_east = grid_values.shape
    east = np.linspace(region[0], region[1], n_east)
    north = np.linspace(region[2], region[3], n_north)
    ee, nn = np.meshgrid(east, north)
    iy, ix = np.meshgrid(np.arange(n_north), np.arange(n_east), indexing="ij")
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "iy": iy.ravel(),
                "ix": ix.ravel(),
                "northing": nn.ravel(),
                "easting": ee.ravel(),
                data_name: np.asarray(grid_values, dtype="float64").ravel(),
            }
        )
    )


def table_to_grid(
    df: DataFrame,
    data_col: str = "scalars",
    easting: str = "easting",
    northing: str = "northing",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Node table → (east_1d, north_1d, values_2d) at the driver edge.

    Sorts by (northing, easting); requires a complete regular grid (every
    (northing, easting) combination present exactly once).
    """
    pdf = df.select(easting, northing, data_col).orderBy(northing, easting).toPandas()
    east = np.unique(pdf[easting].to_numpy())
    north = np.unique(pdf[northing].to_numpy())
    values = pdf[data_col].to_numpy()
    if values.size != east.size * north.size:
        raise ValueError(
            f"Node table is not a complete regular grid: {values.size} rows vs "
            f"{east.size}x{north.size} axis values."
        )
    return east, north, values.reshape(north.size, east.size)


NAN_SENTINEL = 1.70141e38  # verde io.py:58


def load_surfer(fname: str, spark: Optional[SparkSession] = None):
    """Read a Surfer ASCII .grd file (verde io.py:14-134).

    Returns ``(values_2d, region)``; with *spark* given, also a node-table
    DataFrame.  Header semantics follow the REFERENCE exactly
    (io.py:79-114 — its x axis points north): DSAA / "n_northing
    n_easting" / "south north" / "west east" / "zmin zmax" / data rows;
    values ≥ 1.70141e38 are NaN.  Integrity checks (shape + data range vs
    header, io.py:117-134) raise on mismatch.
    """
    with open(fname) as f:
        code = f.readline().strip()
        if code != "DSAA":
            raise ValueError(f"Invalid Surfer grid file id '{code}' (expected DSAA): {fname}")
        n_north, n_east = (int(v) for v in f.readline().split())
        s, n = (float(v) for v in f.readline().split())
        w, e = (float(v) for v in f.readline().split())
        zmin, zmax = (float(v) for v in f.readline().split())
        values = np.array(f.read().split(), dtype="float64")
    if values.size != n_east * n_north:
        raise ValueError(
            f"Grid size mismatch in {fname}: header says {n_north}x{n_east}, "
            f"got {values.size} values."
        )
    values = values.reshape(n_north, n_east)
    values[values >= NAN_SENTINEL] = np.nan
    vmin, vmax = np.nanmin(values), np.nanmax(values)
    if not (np.isclose(vmin, zmin) and np.isclose(vmax, zmax)):
        raise ValueError(
            f"Data range mismatch in {fname}: header [{zmin}, {zmax}] vs data [{vmin}, {vmax}]."
        )
    region = (w, e, s, n)
    if spark is not None:
        return values, region, grid_to_table(values, region, spark)
    return values, region


def mask_to_runs(
    df,
    flag_col: str = "inside",
    row_col: str = "iy",
    col_col: str = "ix",
):
    """Raster→vector: run-length encode a boolean grid mask.

    Each grid row's contiguous True cells collapse to one (row, start,
    end, length) run — the primitive under mask vectorization, polygon
    tracing, and sparse-mask storage (a 100k×100k mask with a compact
    region becomes thousands of runs instead of 10^10 cells).

    Pure Catalyst gaps-and-islands: within a grid row ordered by column,
    ``ix − row_number()`` is constant exactly on each contiguous run, so
    one window + one groupBy (both keyed by the grid row — a single
    shuffle) produce the runs. No UDF, no driver-side pass.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    win = Window.partitionBy(row_col).orderBy(col_col)
    runs = (
        df.filter(F.col(flag_col))
        .withColumn("__grp", F.col(col_col) - F.row_number().over(win))
        .groupBy(row_col, "__grp")
        .agg(
            F.min(col_col).alias("start_ix"),
            F.max(col_col).alias("end_ix"),
            F.count(F.lit(1)).alias("run_length"),
        )
        .drop("__grp")
    )
    return runs


def runs_to_mask(runs, row_col: str = "iy", n_cols: int = None):
    """Vector→raster inverse of :func:`mask_to_runs`: expand (row, start,
    end) runs back to per-cell (iy, ix, inside=True) rows via one
    ``explode(sequence(start, end))`` — pure Catalyst, the row count is
    exactly the mask's True-cell count (dense False cells are implied, as
    in any sparse raster encoding).  ``mask_to_runs ∘ runs_to_mask`` is
    the identity on run tables."""
    from pyspark.sql import functions as F

    return runs.select(
        F.col(row_col),
        F.explode(F.sequence(F.col("start_ix"), F.col("end_ix"))).alias("ix"),
        F.lit(True).alias("inside"),
    )
