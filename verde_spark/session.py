"""Recommended Spark session configuration for verde_spark workloads.

These settings matter at every scale and encode lessons measured on the
bench (PLANS.md §7):

* ``adaptive.enabled`` — AQE skew-split + runtime re-planning; required
  by the skew story for dense cells.
* ``coalescePartitions.minPartitionSize=1b`` — THE critical one for this
  engine: the decimated block tables feeding the per-tile spline /
  Delaunay solves are byte-tiny (a few MB for tens of thousands of
  blocks) but carry seconds-to-minutes of dense linear algebra per
  partition.  AQE's default byte-based coalescing (minPartitionSize=1m)
  collapses those stages to 2-3 tasks **regardless of cluster size**,
  serializing the compute.  With ``1b`` AQE still coalesces, but
  parallelism-first: ≈ one partition per core.
* ``arrow.pyspark.enabled`` — all pandas/Arrow UDF stages (the engine
  forbids per-row Python; see BASELINE.json input_hint).

``make_session`` is a convenience for tests/benchmarks; production jobs
launched via spark-submit should set the same confs on the command line.
"""

from __future__ import annotations

RECOMMENDED_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1b",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def make_session(master: str = "local[*]", app_name: str = "verde_spark", **extra):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in {**RECOMMENDED_CONF, **extra}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
