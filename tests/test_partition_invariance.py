"""Results must be independent of physical partitioning — the property
that makes an operator a *distributed* operator rather than a lucky
single-partition one. Each test runs the same logical input through two
very different partitionings and compares outputs (floats to 1e-12:
aggregation order may differ in the last ulp)."""

import numpy as np
import numpy.testing as npt
import pandas as pd
from pyspark.sql import functions as F

import verde_spark as vs
from verde_spark.operators.spline import spline_solve_grid


def _pts(spark, n=2000, parts=1):
    rng = np.random.RandomState(17)
    pdf = pd.DataFrame(
        {
            "easting": rng.uniform(0, 10, n),
            "northing": rng.uniform(-10, 0, n),
            "scalars": rng.uniform(-100, 100, n),
        }
    )
    return spark.createDataFrame(pdf).repartition(parts)


def test_block_mean_partition_invariant(spark):
    outs = []
    for parts in (1, 13):
        df = _pts(spark, parts=parts)
        out, _ = vs.block_mean(df, spacing=2.5, region=(0, 10, -10, 0))
        outs.append(out.toPandas())
    npt.assert_allclose(outs[0]["scalars"], outs[1]["scalars"], rtol=1e-12)
    npt.assert_allclose(outs[0]["weight_scalars"], outs[1]["weight_scalars"], rtol=1e-9)


def test_spline_solve_grid_partition_invariant(spark):
    outs = []
    for parts in (1, 13):
        df = _pts(spark, n=500, parts=parts)
        dec, _ = vs.block_mean(df, spacing=1.0, region=(0, 10, -10, 0), sort=False)
        # damping 1e-4: a well-conditioned solve, so the last-ulp float
        # differences from aggregation order do not amplify
        grid = spline_solve_grid(
            dec, region=(0, 10, -10, 0), shape=(12, 12), tile_spacing=5.0,
            halo=2.5, damping=1e-4, output_col="pred",
        )
        outs.append(grid.orderBy("iy", "ix").toPandas())
    npt.assert_allclose(outs[0]["pred"], outs[1]["pred"], rtol=1e-6)


def test_knn_and_polygon_partition_invariant(spark):
    from verde_spark.operators.polygons import point_in_polygon

    poly = [(1.0, -9.1), (9.0, -8.2), (6.0, -3.3), (8.0, -1.4), (2.0, -2.5)]
    outs_knn, outs_pip = [], []
    for parts in (1, 13):
        df = _pts(spark, n=1000, parts=parts)
        # deterministic query pick (limit() would be partition-dependent)
        q = df.filter(F.col("easting") < 0.6).select(
            F.col("easting").alias("qe"), F.col("northing").alias("qn")
        ).withColumn("qid", (F.col("qe") * 1e9).cast("long"))
        knn = vs.knn_join(
            df.select("easting", "northing"), q, k=3,
            query_easting="qe", query_northing="qn", query_id="qid",
        )
        outs_knn.append(
            knn.select("qe", "qn", "distance", "rank")
            .toPandas().sort_values(["qe", "rank"]).reset_index(drop=True)
        )
        outs_pip.append(
            point_in_polygon(df, poly).orderBy("easting").select("inside").toPandas()
        )
    pd.testing.assert_frame_equal(outs_knn[0], outs_knn[1])
    pd.testing.assert_frame_equal(outs_pip[0], outs_pip[1])
