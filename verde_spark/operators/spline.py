"""Biharmonic spline gridding (Sandwell 1987) — per-tile distributed solve.

The reference (verde spline.py:315-650) materializes one dense
n_data × n_forces Green's matrix and solves it with LAPACK — a single
process, ~10^4-point ceiling. Here the plane is partitioned into square
tiles; each tile solves its own damped least-squares system over the
points of the tile **plus a halo** of neighboring points (so predictions
are seamless across tile boundaries), inside an Arrow-batched
``applyInPandas``. Prediction cogroups grid nodes with their tile's force
table and evaluates the Green's sum with NumPy broadcasting (the exact
``jacobian_numpy``/``predict_numpy`` formulas, spline.py:608-626).

Scale story: tile size caps every dense solve at a configured force
budget; the only shuffles are (1) groupBy(tile) of halo-exploded points
and (2) cogroup of nodes with forces — both keyed by the same tile label,
and the halo explode is a bounded ≤4× row multiplier (pad < tile size).
With block-reduced inputs (one point per cell) a 10^12-row table becomes
~n_cells forces spread over tiles that each fit comfortably in executor
memory. Single-tile mode (``tile_spacing=None``) reproduces the reference
exactly and is the parity-test regime.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..coordinates import BlockGrid
from ..base import BaseGridder
from ..geometry import get_region
from ..lstsq import least_squares


def greens_function(east: np.ndarray, north: np.ndarray, mindist: float = 0.0) -> np.ndarray:
    """Green's function for the biharmonic spline (verde spline.py:564-584).

    Piecewise form avoids log(0): ``d<1 → d·(log(d^d)−d)``, else
    ``d²·(log d − 1)``. Must match the reference bit-for-bit — grid-value
    parity depends on it.
    """
    distance = np.sqrt(east**2 + north**2)
    distance = distance + mindist
    result = np.empty_like(distance)
    small = distance < 1
    big = ~small
    ds = distance[small]
    result[small] = ds * (np.log(ds**ds) - ds)
    db = distance[big]
    result[big] = db**2 * (np.log(db) - 1)
    return result


def spline_jacobian(
    east: np.ndarray,
    north: np.ndarray,
    force_east: np.ndarray,
    force_north: np.ndarray,
    mindist: float = 0.0,
) -> np.ndarray:
    """(n_data, n_forces) Green's matrix via broadcasting (spline.py:617-626)."""
    return greens_function(
        east.reshape((east.size, 1)) - force_east,
        north.reshape((north.size, 1)) - force_north,
        mindist,
    )


def spline_predict(
    east: np.ndarray,
    north: np.ndarray,
    force_east: np.ndarray,
    force_north: np.ndarray,
    forces: np.ndarray,
    mindist: float = 0.0,
    chunk: int = 4096,
) -> np.ndarray:
    """Σ_j g(x − x_j)·f_j, chunked to bound the temporary matrix."""
    out = np.empty(east.size, dtype="float64")
    for lo in range(0, east.size, chunk):
        hi = min(lo + chunk, east.size)
        jac = spline_jacobian(east[lo:hi], north[lo:hi], force_east, force_north, mindist)
        out[lo:hi] = jac @ forces
    return out


def _halo_explode(
    df: DataFrame,
    grid: BlockGrid,
    pad: float,
    easting: str,
    northing: str,
) -> DataFrame:
    """Duplicate each point into every tile whose *padded* extent contains it.

    The halo-exchange primitive (SURVEY §4.2 / verde rolling_window
    semantics, coordinates.py:947-1202): candidate tile indices are the
    clamped floor-division indices of (coord ± pad) — a ≤(2×2) integer
    range, exploded via ``sequence`` (pure Catalyst, no UDF).
    """
    e, n = F.col(easting), F.col(northing)
    ex = grid.east
    nx = grid.north
    e_edge, n_edge = ex.start - ex.step / 2, nx.start - nx.step / 2

    def idx(coord, axis, edge):
        raw = F.floor((coord - F.lit(edge)) / F.lit(axis.step)).cast("long")
        return F.least(F.lit(axis.size - 1), F.greatest(F.lit(0), raw))

    ix_min = idx(e - F.lit(pad), ex, e_edge)
    ix_max = idx(e + F.lit(pad), ex, e_edge)
    iy_min = idx(n - F.lit(pad), nx, n_edge)
    iy_max = idx(n + F.lit(pad), nx, n_edge)
    out = (
        df.withColumn("__ix", F.explode(F.sequence(ix_min, ix_max)))
        .withColumn("__iy", F.explode(F.sequence(iy_min, iy_max)))
        .withColumn("tile", F.col("__iy") * F.lit(grid.n_east) + F.col("__ix"))
        .drop("__ix", "__iy")
    )
    return out


class Spline(BaseGridder):
    """Distributed biharmonic spline (verde spline.py:315-650).

    Parameters mirror the reference (``damping``, ``mindist`` — both with
    verde defaults) plus the distribution knobs: ``tile_spacing`` (None →
    one global solve, exact verde parity) and ``halo`` (padding distance;
    points within ``halo`` of a tile boundary also contribute forces to the
    neighboring tile).
    """

    def __init__(
        self,
        damping: Optional[float] = None,
        mindist: float = 0.0,
        force_coords=None,
        tile_spacing: Optional[float] = None,
        halo: Optional[float] = None,
    ):
        self.damping = damping
        self.mindist = float(mindist)
        # verde spline.py:369-377: optional (easting, northing) arrays
        # placing the forces away from the data points (fewer forces than
        # data → rectangular least-squares fit)
        self.force_coords = force_coords
        self.tile_spacing = tile_spacing
        self.halo = halo
        self.forces_: Optional[DataFrame] = None
        self.tile_grid_: Optional[BlockGrid] = None
        self.region_: Optional[Tuple[float, float, float, float]] = None

    # -- fit -----------------------------------------------------------------

    def fit(
        self,
        df: DataFrame,
        data_col: str = "scalars",
        weight_col: Optional[str] = None,
        easting: str = "easting",
        northing: str = "northing",
        region=None,
    ) -> "Spline":
        # passing region explicitly skips the min/max aggregation job —
        # worth it when the caller already knows the bounds (verde also
        # accepts a region through grid()/CV paths)
        self.region_ = region if region is not None else get_region(df, easting, northing)
        if self.tile_spacing is None:
            # One tile covering everything: grid with a single block.
            self.tile_grid_ = BlockGrid.from_region(self.region_, shape=(1, 1))
            pad = 0.0
        else:
            self.tile_grid_ = BlockGrid.from_region(self.region_, spacing=self.tile_spacing)
            pad = self.halo if self.halo is not None else self.tile_spacing / 2
        grid = self.tile_grid_
        pts = df.select(
            F.col(easting).alias("easting"),
            F.col(northing).alias("northing"),
            F.col(data_col).alias("data"),
            (F.col(weight_col) if weight_col else F.lit(None).cast("double")).alias("weight"),
        )
        exploded = _halo_explode(pts, grid, pad, "easting", "northing")

        damping, mindist = self.damping, self.mindist
        schema = T.StructType(
            [
                T.StructField("tile", T.LongType()),
                T.StructField("force_east", T.DoubleType()),
                T.StructField("force_north", T.DoubleType()),
                T.StructField("force", T.DoubleType()),
            ]
        )

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            east = pdf["easting"].to_numpy("float64")
            north = pdf["northing"].to_numpy("float64")
            data = pdf["data"].to_numpy("float64")
            w = pdf["weight"].to_numpy("float64")
            weights = None if np.isnan(w).all() else np.nan_to_num(w, nan=1.0)
            jac = spline_jacobian(east, north, east, north, mindist)
            forces = least_squares(jac, data, weights, damping)
            return pd.DataFrame(
                {
                    "tile": pdf["tile"].iloc[0],
                    "force_east": east,
                    "force_north": north,
                    "force": forces,
                }
            )

        if self.force_coords is None:
            self.forces_ = exploded.groupBy("tile").applyInPandas(solve, schema)
            return self

        # custom force locations (verde spline.py:458-462): the SAME halo
        # explosion assigns each force to every tile it can serve, and a
        # cogroup pairs each tile's data with its forces — the solve becomes
        # a rectangular least squares (n_data_in_tile × n_forces_in_tile).
        fe = np.ravel(np.asarray(self.force_coords[0], dtype="float64"))
        fn = np.ravel(np.asarray(self.force_coords[1], dtype="float64"))
        fdf = df.sparkSession.createDataFrame(
            pd.DataFrame({"easting": fe, "northing": fn})
        )
        f_exploded = _halo_explode(fdf, grid, pad, "easting", "northing")

        def solve_rect(key, data_pdf: pd.DataFrame, force_pdf: pd.DataFrame):
            if len(force_pdf) == 0 or len(data_pdf) == 0:
                return pd.DataFrame(
                    {"tile": [], "force_east": [], "force_north": [], "force": []}
                ).astype(
                    {"tile": "int64", "force_east": "float64",
                     "force_north": "float64", "force": "float64"}
                )
            east = data_pdf["easting"].to_numpy("float64")
            north = data_pdf["northing"].to_numpy("float64")
            data = data_pdf["data"].to_numpy("float64")
            w = data_pdf["weight"].to_numpy("float64")
            weights = None if np.isnan(w).all() else np.nan_to_num(w, nan=1.0)
            f_east = force_pdf["easting"].to_numpy("float64")
            f_north = force_pdf["northing"].to_numpy("float64")
            jac = spline_jacobian(east, north, f_east, f_north, mindist)
            forces = least_squares(jac, data, weights, damping)
            return pd.DataFrame(
                {
                    "tile": key[0],
                    "force_east": f_east,
                    "force_north": f_north,
                    "force": forces,
                }
            )

        self.forces_ = (
            exploded.groupBy("tile")
            .cogroup(f_exploded.groupBy("tile"))
            .applyInPandas(solve_rect, schema)
        )
        return self

    # -- predict ---------------------------------------------------------------

    def predict(
        self,
        df: DataFrame,
        output_col: str = "prediction",
        easting: str = "easting",
        northing: str = "northing",
    ) -> DataFrame:
        """Evaluate the fitted spline at the points of *df*.

        Nodes are keyed by their (un-padded) tile and cogrouped with the
        tile's forces; the Green's sum is one chunked NumPy matmul per tile.
        """
        if self.forces_ is None or self.tile_grid_ is None:
            raise RuntimeError("Spline is not fitted.")
        grid = self.tile_grid_
        mindist = self.mindist
        tiled = df.withColumn("tile", grid.label_expr(easting, northing).alias("tile"))
        out_fields = [f for f in tiled.schema.fields if f.name != "tile"]
        schema = T.StructType(out_fields + [T.StructField(output_col, T.DoubleType())])
        e_name, n_name = easting, northing

        def evaluate(key, nodes: pd.DataFrame, forces: pd.DataFrame) -> pd.DataFrame:
            nodes = nodes.drop(columns=["tile"])
            if len(nodes) == 0:
                nodes[output_col] = pd.Series(dtype="float64")
                return nodes
            if len(forces) == 0:
                nodes[output_col] = np.nan
                return nodes
            pred = spline_predict(
                nodes[e_name].to_numpy("float64"),
                nodes[n_name].to_numpy("float64"),
                forces["force_east"].to_numpy("float64"),
                forces["force_north"].to_numpy("float64"),
                forces["force"].to_numpy("float64"),
                mindist,
            )
            nodes = nodes.copy()
            nodes[output_col] = pred
            return nodes

        return (
            tiled.groupBy("tile")
            .cogroup(self.forces_.groupBy("tile"))
            .applyInPandas(evaluate, schema)
        )

    def filter(
        self,
        df: DataFrame,
        data_col: str = "scalars",
        weight_col: Optional[str] = None,
        easting: str = "easting",
        northing: str = "northing",
    ) -> DataFrame:
        """fit + residuals (BaseGridder.filter, base/base_classes.py:273-316)."""
        self.fit(df, data_col, weight_col, easting, northing)
        pred = self.predict(df, "__pred", easting, northing)
        return pred.withColumn(data_col, F.col(data_col) - F.col("__pred")).drop("__pred")


def _solve_grid_parts(
    df: DataFrame,
    region: Sequence[float],
    shape,
    tile_spacing: float,
    halo: Optional[float],
    damping: Optional[float],
    mindist: float,
    data_col: str,
    weight_col: Optional[str],
    easting: str,
    northing: str,
    output_col: str,
    keep_tile: bool,
):
    """Shared setup of the fused solve+grid: (exploded points, labeled
    nodes, cogroup body, output schema)."""
    from ..coordinates import grid_coordinates

    spark = df.sparkSession
    grid = BlockGrid.from_region(region, spacing=tile_spacing)
    pad = halo if halo is not None else tile_spacing / 2
    pts = df.select(
        F.col(easting).alias("easting"),
        F.col(northing).alias("northing"),
        F.col(data_col).alias("data"),
        (F.col(weight_col) if weight_col else F.lit(None).cast("double")).alias("weight"),
    )
    exploded = _halo_explode(pts, grid, pad, "easting", "northing").select(
        "tile", "easting", "northing", "data", "weight"
    )
    # forward the caller's coordinate names: the node table, the tile
    # label and solve_and_eval's nds[easting]/nds[northing] reads all
    # use them (defaults-only nodes made the easting=/northing=
    # parameters crash on UNRESOLVED_COLUMN)
    nodes = grid_coordinates(
        spark, region, shape=shape, easting=easting, northing=northing
    ).withColumn("tile", grid.label_expr(easting, northing))
    fields = [
        T.StructField("iy", T.LongType()),
        T.StructField("ix", T.LongType()),
        T.StructField(northing, T.DoubleType()),
        T.StructField(easting, T.DoubleType()),
        T.StructField(output_col, T.DoubleType()),
    ]
    if keep_tile:
        fields.insert(0, T.StructField("tile", T.LongType()))
    schema = T.StructType(fields)

    def solve_and_eval(key, points: pd.DataFrame, nds: pd.DataFrame) -> pd.DataFrame:
        if keep_tile:
            nds = nds.copy()
        else:
            nds = nds.drop(columns=["tile"]).copy()
        if len(nds) == 0:
            nds[output_col] = pd.Series(dtype="float64")
            return nds
        # the resumable path pads every tile with one null-coordinate
        # sentinel row so point-free tiles still run (and emit NaN nodes)
        points = points[points["easting"].notna()]
        if len(points) == 0:
            nds[output_col] = np.nan
            return nds
        east = points["easting"].to_numpy("float64")
        north = points["northing"].to_numpy("float64")
        data = points["data"].to_numpy("float64")
        w = points["weight"].to_numpy("float64")
        weights = None if np.isnan(w).all() else np.nan_to_num(w, nan=1.0)
        jac = spline_jacobian(east, north, east, north, mindist)
        forces = least_squares(jac, data, weights, damping)
        nds[output_col] = spline_predict(
            nds[easting].to_numpy("float64"),
            nds[northing].to_numpy("float64"),
            east,
            north,
            forces,
            mindist,
        )
        return nds

    return exploded, nodes, solve_and_eval, schema


def spline_solve_grid(
    df: DataFrame,
    region: Sequence[float],
    shape,
    tile_spacing: float,
    halo: Optional[float] = None,
    damping: Optional[float] = None,
    mindist: float = 0.0,
    data_col: str = "scalars",
    weight_col: Optional[str] = None,
    easting: str = "easting",
    northing: str = "northing",
    output_col: str = "prediction",
) -> DataFrame:
    """Fused per-tile solve + grid evaluation in ONE cogroup pass.

    ``Spline.fit().grid()`` materializes the force table between two Python
    stages; when the forces aren't reused, solving and predicting inside
    the same ``applyInPandas`` halves the Python-stage count and drops a
    shuffle — the plan is scan → blockagg exchange → cogroup(points, nodes)
    → output, with every stage embarrassingly parallel across tiles. This
    is the throughput path the benchmark exercises.
    """
    exploded, nodes, solve_and_eval, schema = _solve_grid_parts(
        df, region, shape, tile_spacing, halo, damping, mindist,
        data_col, weight_col, easting, northing, output_col, keep_tile=False,
    )
    return (
        exploded.groupBy("tile")
        .cogroup(nodes.groupBy("tile"))
        .applyInPandas(solve_and_eval, schema)
    )


def spline_solve_grid_resumable(
    df: DataFrame,
    region: Sequence[float],
    shape,
    tile_spacing: float,
    checkpoint_path: str,
    halo: Optional[float] = None,
    damping: Optional[float] = None,
    mindist: float = 0.0,
    data_col: str = "scalars",
    weight_col: Optional[str] = None,
    easting: str = "easting",
    northing: str = "northing",
    output_col: str = "prediction",
) -> DataFrame:
    """``spline_solve_grid`` with per-tile checkpoint/resume (north rule:
    "resumable from checkpoint with per-partition lineage + metrics").

    The checkpoint unit is the tile, and the todo set covers EVERY tile of
    the tiling grid — the halo-exploded point table is unioned with one
    null-coordinate sentinel row per tile (``spark.range`` over the tile
    count, no shuffle), so tiles that contain no data points still reach
    the cogroup and emit their grid nodes with NaN predictions, exactly
    like plain :func:`spline_solve_grid`.  Each tile's point group is
    self-contained (halo rows are duplicated into it), so anti-joining
    completed tiles away loses nothing.  Completed tiles are read back
    from the checkpoint; only remaining tiles solve.  Output carries the
    ``tile`` column (= the partition value of the checkpoint layout,
    pruning-friendly).
    """
    from ..checkpoint import run_resumable

    exploded, nodes, solve_and_eval, schema = _solve_grid_parts(
        df, region, shape, tile_spacing, halo, damping, mindist,
        data_col, weight_col, easting, northing, output_col, keep_tile=True,
    )
    spark = df.sparkSession
    tile_grid = BlockGrid.from_region(region, spacing=tile_spacing)
    sentinels = spark.range(tile_grid.n_blocks).select(
        F.col("id").alias("tile"),
        *[
            F.lit(None).cast("double").alias(c)
            for c in ("easting", "northing", "data", "weight")
        ],
    )
    inputs = exploded.unionByName(sentinels)

    def stage(remaining: DataFrame) -> DataFrame:
        todo_tiles = remaining.select("tile").distinct()
        nds = nodes.join(F.broadcast(todo_tiles), "tile", "semi")
        return (
            remaining.groupBy("tile")
            .cogroup(nds.groupBy("tile"))
            .applyInPandas(solve_and_eval, schema)
        )

    # count_col="easting": sentinel rows must not inflate rows_in lineage
    return run_resumable(spark, inputs, stage, checkpoint_path, count_col="easting")
