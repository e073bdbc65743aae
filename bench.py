"""Benchmark driver: headline queries + two-parallelism scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "gridded_points_per_sec": ..., "scaling": {...}}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the headline run (default 32)
  SPARK_GRAFT_SCALING  "0" to skip the local[8]-vs-local[32] scaling pair

The scaling pair runs the SAME flagship job (synthesize → geotag → cell
block-mean → tiled spline → grid) on identical input at local[8] and
local[32]; efficiency = (T_8 / T_32) / 4 per the north rule (no real
cluster in this sandbox — see BENCH.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

_m = re.search(r"sf([\d.]+)", SF_DIR)
SF = float(_m.group(1)) if _m else 0.1
# synthetic page volume scales with sf: sf0.1 → 1M pages
N_PAGES = max(100_000, int(10_000_000 * SF))


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"verde_spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        # ZGC: string-heavy scans (regexp geotag parse) are allocation-bound;
        # the default GC serializes all executor threads behind collections
        # in local mode's single shared heap
        .config("spark.driver.extraJavaOptions", "-XX:+UseZGC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


PAGES_CACHE = "/tmp/verde_spark_bench"


def pages_parquet(spark, n_pages: int) -> str:
    """Materialize the deterministic page table once per size; the benched
    pipeline then starts from a parquet scan like a real deployment."""
    path = os.path.join(PAGES_CACHE, f"pages_{n_pages}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from verde_spark.sources.pages import synthesize_pages

        synthesize_pages(
            spark, n_pages, region=(-5.0, 0.0, 5.0, 10.0), num_partitions=64
        ).write.mode("overwrite").parquet(path)
    return path


def flagship(spark, n_pages: int):
    """read pages parquet → geotag → cell block-mean → tiled spline → grid.

    Returns (#input points, #grid nodes). This is the full EP2-shaped
    pipeline the north rule names; one shuffle for the decimation, one
    groupBy for the tile solves, one cogroup for the prediction.
    """
    from pyspark.sql import functions as F

    from verde_spark import Spline, block_mean
    from verde_spark.sources.pages import geotagged

    region = (-5.0, 0.0, 5.0, 10.0)
    pages = spark.read.parquet(pages_parquet(spark, n_pages))
    pts = geotagged(pages).select(
        F.col("lon").alias("easting"), F.col("lat").alias("northing")
    )
    pts = pts.withColumn(
        "scalars",
        F.lit(1000.0)
        * F.sin(F.lit(2 * 3.141592653589793 / 2.5) * F.col("easting"))
        * F.cos(F.lit(2 * 3.141592653589793 / 2.5) * F.col("northing")),
    )
    dec, _ = block_mean(pts, spacing=0.1, region=region)
    # the decimated table is tiny (≤2.5k rows): persist it so the N-row scan
    # + shuffle happens exactly once, not once per downstream spline job
    dec = dec.persist()
    spline = Spline(damping=1e-6, tile_spacing=1.25, halo=0.5).fit(
        dec, weight_col="weight_scalars"
    )
    grid = spline.grid(spark, region=region, shape=(200, 200), output_col="prediction")
    n_nodes = grid.count()
    dec.unpersist()
    return n_pages, n_nodes


def bench_queries(spark):
    """Headline operator set over the driver-provided tables."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    picks = [
        "block_mean",
        "block_stats",
        "block_mean_uncertainty",
        "knn_join",
        "distance_mask",
        "cell_counts",
        "dedup_exact",
        "token_counts",
        "cosine_topk",
        "spline_grid",
    ]
    times = {}
    for name in picks:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def main():
    result = {"metric": "verde_spark headline (geotag→cell→blockmean→spline→grid + operator set)",
              "unit": "sec", "sf": SF}

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    flagship(spark, max(N_PAGES // 20, 10_000))  # warm Python workers/Arrow/JIT
    t0 = time.time()
    n_pts, n_nodes = flagship(spark, N_PAGES)
    t_flag = time.time() - t0
    qtimes = {"flagship_pipeline": round(t_flag, 3)}
    qtimes.update(bench_queries(spark))
    spark.stop()

    result["queries"] = qtimes
    result["value"] = round(sum(qtimes.values()), 3)
    result["gridded_points_per_sec"] = round(n_pts / t_flag, 1)
    result["flagship_input_points"] = n_pts
    result["flagship_grid_nodes"] = n_nodes

    if RUN_SCALING:
        scaling = {}
        n_scale = max(N_PAGES, 16_000_000)  # large enough to be compute-bound
        for cores in (8, 32):
            s = make_spark(cores)
            s.sparkContext.setLogLevel("ERROR")
            flagship(s, n_scale // 20)  # warm Python workers/Arrow/JIT
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                flagship(s, n_scale)
                best = min(best, time.time() - t0)
            scaling[f"local[{cores}]"] = {
                "sec": round(best, 3),
                "points_per_sec": round(n_scale / best, 1),
            }
            s.stop()
        scaling["input_points"] = n_scale
        t8 = scaling["local[8]"]["sec"]
        t32 = scaling["local[32]"]["sec"]
        scaling["efficiency_8_to_32"] = round((t8 / t32) / 4.0, 3)
        result["scaling"] = scaling
        _write_bench_md(result)

    print(json.dumps(result))


def _write_bench_md(result):
    sc = result["scaling"]
    lines = [
        "# BENCH — throughput + scaling evidence",
        "",
        f"Flagship pipeline: synthesize {result['flagship_input_points']:,} pages → "
        "geotag (regexp) → cell block-mean (spacing 0.1) → tiled biharmonic spline "
        f"(tile 1.25, halo 0.5, 16 tiles) → 200×200 grid. sf={result['sf']}.",
        "",
        f"- headline total: {result['value']} s across {len(result['queries'])} queries",
        f"- gridded points/sec (local[{CPUS}]): {result['gridded_points_per_sec']:,}",
        "",
        "## Two-cluster-size scaling (north rule)",
        "",
        "No real cluster exists in this sandbox; per the driver instruction the",
        f"same warm job runs on identical input ({sc['input_points']:,} pages) at two",
        "parallelism levels (best of 2 runs after a warm-up pass):",
        "",
        "| parallelism | sec | points/sec |",
        "|---|---|---|",
        f"| local[8] | {sc['local[8]']['sec']} | {sc['local[8]']['points_per_sec']:,} |",
        f"| local[32] | {sc['local[32]']['sec']} | {sc['local[32]']['points_per_sec']:,} |",
        "",
        f"**Scaling efficiency (T8/T32)/4 = {sc['efficiency_8_to_32']}** "
        "(north-rule target ≥ 0.8 core-for-core; note local-mode JVMs share one "
        "driver, so constant per-job overhead depresses this vs a real cluster).",
        "",
        "Per-query seconds: " + json.dumps(result["queries"]),
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
