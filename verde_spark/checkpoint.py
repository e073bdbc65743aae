"""Resumable per-partition checkpointing with lineage + metrics.

The north rule requires pipelines over 10^12-row tables to be *resumable
from checkpoint with per-partition lineage + metrics*. The unit of
checkpointing here is the spatial partition (tile/cell id): a pipeline
stage writes its per-tile results as parquet partitioned by the tile
column plus a **manifest** row per tile (tile id, row counts in/out,
value checksum, wall time, status). On resume, completed tile ids are
anti-joined away so only missing/failed tiles recompute.

Everything is plain DataFrame mechanics — the manifest is itself a tiny
parquet table, so lineage queries ("which tiles are stale?", "rows per
tile over time") are just Spark SQL.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


class TileCheckpoint:
    """Checkpointed, tile-partitioned output of one pipeline stage.

    >>> ckpt = TileCheckpoint("/tmp/stage1", tile_col="tile")
    >>> done = ckpt.completed_tiles(spark)          # tiny DataFrame of ids
    >>> todo = inputs.join(done, "tile", "left_anti")  # resume = anti-join
    >>> ckpt.write(result_of(todo))                  # appends data + manifest
    >>> full = ckpt.load(spark)                      # all completed tiles
    """

    def __init__(self, path: str, tile_col: str = "tile"):
        self.path = path
        self.tile_col = tile_col
        self.data_path = os.path.join(path, DATA_DIR)
        self.manifest_path = os.path.join(path, MANIFEST_DIR)

    # -- reading ---------------------------------------------------------------

    def manifest(self, spark: SparkSession) -> Optional[DataFrame]:
        try:
            return spark.read.parquet(self.manifest_path)
        except Exception:
            return None

    def completed_tiles(self, spark: SparkSession) -> DataFrame:
        """Distinct tile ids marked ok in the manifest (empty DF if none)."""
        man = self.manifest(spark)
        if man is None:
            return spark.createDataFrame([], f"{self.tile_col} long")
        return (
            man.filter(F.col("status") == "ok")
            .select(F.col("tile").alias(self.tile_col))
            .distinct()
        )

    def remaining(self, inputs: DataFrame) -> DataFrame:
        """Input rows whose tile has not completed yet (the resume set)."""
        done = self.completed_tiles(inputs.sparkSession)
        return inputs.join(done, self.tile_col, "left_anti")

    def load(self, spark: SparkSession) -> DataFrame:
        """All checkpointed output rows (committed attempts only).

        Data lives under ``data/attempt=<id>/tile=<t>/`` and a manifest row
        is the COMMIT MARKER for its (tile, attempt): a crash between the
        data append and the manifest append leaves orphan attempt data that
        this semi-join (on both keys) excludes, so the tile's re-run on
        resume cannot surface duplicated rows (ADVICE r2).  ``attempt`` is
        a hive partition column, so the exclusion prunes whole directories.
        """
        out = spark.read.parquet(self.data_path)
        man = self.manifest(spark)
        committed = man.filter(F.col("status") == "ok").select(
            F.col("tile").alias(self.tile_col), "attempt"
        ).distinct()
        return out.join(
            committed, [self.tile_col, "attempt"], "left_semi"
        ).drop("attempt")

    # -- writing ---------------------------------------------------------------

    def write(self, result: DataFrame, input_counts: Optional[DataFrame] = None) -> DataFrame:
        """Append *result* partitioned by tile and append its manifest rows.

        Incremental by construction: per-tile metrics (rows_out, value
        checksum = sum of row hashes mod 2^31 — order-insensitive) are
        aggregated from *result* itself, which is persisted for the
        duration of the write so the data write and the stats pass share
        one computation. Previously checkpointed data is NEVER re-read and
        the manifest is append-only — the cost of a stage write is
        O(new tiles), independent of total checkpoint size (the property
        that keeps resume viable at 100 TB). ``input_counts``
        (tile, rows_in) joins lineage from the stage input. Each tile is
        expected to be written at most once (``run_resumable`` guarantees
        this via the completed-tiles anti-join). Data is written under a
        fresh ``attempt=<id>`` subdirectory and the manifest row carrying
        that id is the commit marker — a crash between the two appends
        leaves an orphan attempt that ``load`` never reads. Returns the
        manifest rows written.
        """
        spark = result.sparkSession
        t0 = time.time()
        attempt = uuid.uuid4().hex
        result = result.persist()
        try:
            (
                result.write.partitionBy(self.tile_col)
                .mode("append")
                .parquet(os.path.join(self.data_path, f"attempt={attempt}"))
            )
            duration = time.time() - t0
            hash_cols = [c for c in result.columns if c != self.tile_col]
            stats = result.groupBy(F.col(self.tile_col).alias("tile")).agg(
                F.count(F.lit(1)).alias("rows_out"),
                # sum-fold of row hashes: order-insensitive content checksum
                F.sum(F.xxhash64(*hash_cols) % F.lit(1 << 31)).alias("checksum"),
            )
            if input_counts is not None:
                stats = stats.join(
                    input_counts.select(
                        F.col(self.tile_col).alias("tile"), F.col("rows_in")
                    ),
                    "tile",
                    "left",
                )
            else:
                stats = stats.withColumn("rows_in", F.lit(None).cast("long"))
            manifest = stats.select(
                "tile",
                "rows_in",
                "rows_out",
                "checksum",
                F.lit(round(duration, 3)).alias("stage_seconds"),
                F.current_timestamp().alias("completed_at"),
                F.lit("ok").alias("status"),
                F.lit(attempt).alias("attempt"),
            )
            manifest.write.mode("append").parquet(self.manifest_path)
            # the returned rows must survive the unpersist below without
            # re-running the stage lineage: hand back the tiny collected set
            rows = manifest.collect()
            return spark.createDataFrame(rows, manifest.schema)
        finally:
            result.unpersist()


def run_resumable(
    spark: SparkSession,
    inputs: DataFrame,
    stage: Callable[[DataFrame], DataFrame],
    checkpoint_path: str,
    tile_col: str = "tile",
    count_col: Optional[str] = None,
) -> DataFrame:
    """Run ``stage`` over only the tiles not yet completed, checkpoint the
    new results, and return the full (old + new) output.

    ``count_col``: when given, the per-tile lineage ``rows_in`` counts only
    rows with a non-null value in that column — callers that pad ``inputs``
    with one sentinel row per tile (to guarantee every tile runs even with
    zero data rows) use it to keep the lineage honest.
    """
    ckpt = TileCheckpoint(checkpoint_path, tile_col)
    # persist: the emptiness probe, the lineage counts and the stage itself
    # all consume `todo` — without caching each one re-runs the anti-join
    # against the manifest (and re-scans the inputs) from scratch
    todo = ckpt.remaining(inputs).persist()
    try:
        if not todo.isEmpty():
            counted = F.count(F.lit(1)) if count_col is None else F.count(F.col(count_col))
            counts = todo.groupBy(tile_col).agg(counted.alias("rows_in"))
            ckpt.write(stage(todo), input_counts=counts)
    finally:
        todo.unpersist()
    return ckpt.load(spark)
