"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (geotag → block-mean decimate →
tiled biharmonic spline → regular grid) on sf0.001. ``queries`` exposes
one callable per implemented operator from SURVEY.md §2 over the
driver-provided tables; ``oracle_sql`` gives the DuckDB-equivalent SQL.

Oracle-parity rules used throughout (see SURVEY.md §5):
- derived coordinates use only IEEE-exact ops (+,-,*,/ mod, floor) — no
  libm — so Spark and DuckDB compute bit-identical doubles;
- aggregated floats are either exactly representable (integer-valued
  data, block centers) or rounded to 9 decimals on BOTH sides;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from verde_spark import (
    BlockGrid,
    CheckerBoard,
    Spline,
    Trend,
    block_mean,
    block_reduce,
    inside,
)
from verde_spark.coordinates import grid_coordinates
from verde_spark.functions.cells import cell_encode, cell_encode_sql
from verde_spark.functions.text import token_count
from verde_spark.operators.dedup import dedup_exact, exact_duplicates, simhash_near_duplicates
from verde_spark.operators.masks import convexhull_mask, distance_mask
from verde_spark.operators.neighbors import knn_join
from verde_spark.operators.similarity import cosine_topk
from verde_spark.sources.pages import geotagged, synthesize_pages

# ---------------------------------------------------------------------------
# shared derivations (must stay IEEE-exact and mirrored in the SQL below)
# ---------------------------------------------------------------------------

REGION = (-5.0, 0.0, 5.0, 10.0)
GRID = BlockGrid.from_region(REGION, spacing=1.0)


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → synthetic point set; decorrelated multiplicative hashing,
    integer-valued data so aggregate sums are exact in both engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id"),
        (F.lit(-5.0) + F.lit(5.0) * ((F.col("event_id") * 7919) % 9973) / F.lit(9973.0)).alias(
            "easting"
        ),
        (F.lit(5.0) + F.lit(5.0) * ((F.col("event_id") * 4409) % 9967) / F.lit(9967.0)).alias(
            "northing"
        ),
        (F.col("event_id") % 97).cast("double").alias("scalars"),
        (F.lit(1) + F.col("event_id") % 3).cast("double").alias("weight"),
    )


_POINTS_SQL = """
    SELECT event_id,
           -5.0 + 5.0 * ((event_id * 7919) % 9973) / 9973.0 AS easting,
           5.0 + 5.0 * ((event_id * 4409) % 9967) / 9967.0 AS northing,
           CAST(event_id % 97 AS DOUBLE) AS scalars,
           CAST(1 + event_id % 3 AS DOUBLE) AS weight
    FROM events
"""

_LABEL_SQL = GRID.label_sql("easting", "northing")


def _rolling_centers_values() -> str:
    """VALUES rows for the rolling-window centers (same axes the operator
    computes: region shrunk by size/2, grid-line registered)."""
    from verde_spark.coordinates import _resolve_axes

    half = 1.0
    w, e, s, n = REGION
    east_ax, north_ax = _resolve_axes(
        (w + half, e - half, s + half, n - half), spacing=2.0, adjust="spacing"
    )
    rows = []
    for iy in range(north_ax.size):
        for ix in range(east_ax.size):
            rows.append(
                f"({iy * east_ax.size + ix}, {east_ax.value(ix)!r}, {north_ax.value(iy)!r})"
            )
    return ", ".join(rows)


def _center_sql() -> tuple[str, str]:
    ex, nx = GRID.east, GRID.north
    ce = f"({ex.start!r} + (block % {GRID.n_east}) * {ex.step!r})"
    cn = f"({nx.start!r} + CAST(FLOOR(block / {GRID.n_east}) AS BIGINT) * {nx.step!r})"
    return ce, cn


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geotagged pages → cell block-mean → tiled spline → grid."""
    from verde_spark.operators.spline import spline_solve_grid

    sf_dir = "/root/testdata/sf0.001"
    pts = _points(spark, sf_dir)
    # decimate (one shuffle, algebraic agg), then the fused per-tile
    # solve+evaluate cogroup (one Python stage, tested exactly equal to the
    # two-pass fit().grid() path)
    dec, _ = block_mean(pts, spacing=0.5, region=REGION, sort=False)
    return spline_solve_grid(
        dec, region=REGION, shape=(20, 20), tile_spacing=2.5, halo=1.25,
        damping=1e-8, weight_col="weight_scalars", output_col="prediction",
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q_block_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = block_reduce(
        _points(spark, sf_dir),
        "mean",
        region=REGION,
        spacing=1.0,
        center_coordinates=True,
        data_cols=("scalars",),
        grid=GRID,
    )
    return out.select("block", "easting", "northing", "scalars")


def _q_block_mean_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = block_reduce(
        _points(spark, sf_dir),
        "mean",
        region=REGION,
        spacing=1.0,
        center_coordinates=True,
        data_cols=("scalars",),
        weight_cols=("weight",),
        grid=GRID,
    )
    return out.select("block", "easting", "northing", "scalars")


def _q_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn("block", GRID.label_expr())
    return (
        pts.groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("scalars").alias("min_val"),
            F.max("scalars").alias("max_val"),
            F.sum("scalars").alias("sum_val"),
        )
        .orderBy("block")
    )


def _q_block_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = block_reduce(
        _points(spark, sf_dir),
        "median",
        region=REGION,
        spacing=1.0,
        center_coordinates=True,
        data_cols=("scalars",),
        grid=GRID,
    )
    return out.select("block", "scalars")


def _q_block_mean_uncertainty(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = block_mean(
        _points(spark, sf_dir),
        region=REGION,
        spacing=1.0,
        center_coordinates=True,
        weight_cols=("weight",),
        uncertainty=True,
        grid=GRID,
    )
    # weighted mean is exact (integer-valued sums); the propagated-variance
    # weight needs the global-min rescale → round on both sides.
    return out.select(
        "block", "scalars", F.round("weight_scalars", 9).alias("weight_scalars")
    )


def _q_inside(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.filter(inside((-3.0, -1.0, 6.0, 8.0))).select(
        "event_id", "easting", "northing"
    )


def _q_get_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.agg(
        F.min("easting").alias("w"),
        F.max("easting").alias("e"),
        F.min("northing").alias("s"),
        F.max("northing").alias("n"),
    )


def _q_grid_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid_coordinates(spark, REGION, spacing=0.5).select(
        "iy", "ix", "northing", "easting"
    )


def _q_checkerboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic source evaluated on a grid; sin/cos are libm → round(9).
    cb = CheckerBoard(region=REGION)
    nodes = grid_coordinates(spark, REGION, spacing=0.5)
    return nodes.select(
        "iy", "ix", F.round(cb.predict_expr(), 6).alias("value")
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).cache()
    queries = pts.filter(F.col("event_id") < 20).select(
        F.col("event_id").alias("query_id"),
        F.col("easting").alias("qe"),
        F.col("northing").alias("qn"),
    )
    out = knn_join(
        pts.select("event_id", "easting", "northing"),
        queries,
        k=3,
        query_easting="qe",
        query_northing="qn",
        query_id="query_id",
    )
    return out.select(
        "query_id", F.col("nb_event_id").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        F.round("distance", 9).alias("distance"),
    ).orderBy("query_id", "rank")


def _q_distance_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).filter(F.col("event_id") % 100 == 0)
    nodes = grid_coordinates(spark, REGION, spacing=0.5)
    out = distance_mask(pts, nodes, maxdist=0.75)
    return out.select("iy", "ix", "in_range").orderBy("iy", "ix")


def _q_convexhull(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hull of the 4 bbox corners of a sub-rectangle → membership must equal
    # the inside() predicate: a known-geometry oracle for the hull machinery.
    import pandas as pd

    corners = spark.createDataFrame(
        pd.DataFrame(
            {"easting": [-4.0, -1.0, -1.0, -4.0], "northing": [6.0, 6.0, 9.0, 9.0]}
        )
    )
    nodes = grid_coordinates(spark, REGION, spacing=0.5)
    out = convexhull_mask(corners, nodes)
    return out.select("iy", "ix", "in_hull").orderBy("iy", "ix")


def _q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        pts.select(cell_encode("easting", "northing", 6).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cell")
    )


def _q_geotag_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # build a geotag string from exact coordinates, parse it back with the
    # production regex — validates the text→(lon,lat) extractor both sides.
    from verde_spark.functions.text import geotag_lat, geotag_lon

    pts = _points(spark, sf_dir).filter(F.col("event_id") < 1000)
    tagged = pts.select(
        "event_id",
        F.format_string("geo:%.6f,%.6f", F.col("northing"), F.col("easting")).alias("text"),
    )
    return tagged.select(
        "event_id",
        geotag_lat("text").alias("lat"),
        geotag_lon("text").alias("lon"),
    )


def _q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    pts = _points(spark, sf_dir).withColumn(
        "plane",
        F.lit(10.0) + F.lit(2.0) * F.col("easting") - F.lit(0.4) * F.col("northing"),
    )
    trend = Trend(degree=1).fit(pts, data_col="plane")
    coefs = [round(float(c), 6) for c in trend.coef_]
    return spark.createDataFrame(
        pd.DataFrame({"coef_idx": range(3), "coef": coefs})
    )


def _q_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    pred = pts.withColumn("pred", F.col("scalars") * 0.5 + 10.0)
    agg = pred.agg(
        F.sum((F.col("scalars") - F.col("pred")) * (F.col("scalars") - F.col("pred"))).alias(
            "ss_res"
        ),
        F.sum("scalars").alias("sd"),
        F.sum(F.col("scalars") * F.col("scalars")).alias("sd2"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    return agg.select(
        F.round(
            F.lit(1.0) - F.col("ss_res") / (F.col("sd2") - F.col("sd") * F.col("sd") / F.col("n")),
            9,
        ).alias("r2")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        dedup_exact(docs, id_col="doc_id", text_col="text")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


def _q_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_duplicates(docs).select("n_copies", "keep_id").orderBy("keep_id")


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", token_count("text").cast("long").alias("tokens")
    ).orderBy("doc_id")


def _q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(token_count("text")).cast("long").alias("total_tokens"),
        )
        .orderBy("lang")
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=5)
    # cosine values differ in the last ulp across engines (summation order)
    # → compare ids/ranks only.
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash is the candidate generator (bag-of-tokens signature: hamming 0
    # admits reordered/near-identical docs); the exact token-multiset verify
    # makes the result oracle-checkable.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = simhash_near_duplicates(docs, max_hamming=0)
    toks = docs.select(
        F.col("doc_id"),
        F.sort_array(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("toks"),
    )
    verified = (
        cand.join(toks.withColumnRenamed("doc_id", "id_a").withColumnRenamed("toks", "ta"), "id_a")
        .join(toks.withColumnRenamed("doc_id", "id_b").withColumnRenamed("toks", "tb"), "id_b")
        .filter(F.col("ta") == F.col("tb"))
    )
    return verified.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


def _q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from verde_spark.operators.windows import rolling_window

    pts = _points(spark, sf_dir)
    out, _ = rolling_window(pts, size=2.0, spacing=2.0, region=REGION)
    return (
        out.groupBy(
            F.col("window").alias("win_id"), "center_easting", "center_northing"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("scalars").alias("sum_val"))
        .orderBy("win_id")
    )


def _q_expanding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from verde_spark.operators.windows import expanding_window

    pts = _points(spark, sf_dir)
    out = expanding_window(pts, center=(-2.5, 7.5), sizes=[1.0, 2.0, 4.0])
    return (
        out.filter(F.col("min_size_idx").isNotNull())
        .groupBy(F.col("min_size_idx").cast("long").alias("min_size_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("min_size_idx")
    )


def _q_spline_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-SQL-expressible (iterative dense solve): rows-only check.
    from verde_spark.operators.spline import spline_solve_grid

    pts = _points(spark, sf_dir)
    dec, _ = block_mean(pts, spacing=0.5, region=REGION, sort=False)
    return spline_solve_grid(
        dec, region=REGION, shape=(20, 20), tile_spacing=2.5, halo=1.25,
        damping=1e-8, weight_col="weight_scalars", output_col="prediction",
    )


# concave polygon inside REGION; no horizontal edges (keeps the crossing
# division well-defined in both engines without CASE-guard differences)
_POLY = [(-4.5, 5.5), (-0.5, 6.2), (-2.5, 7.8), (-0.2, 9.3), (-3.8, 9.6), (-4.8, 7.1)]


def _poly_crossing_sql() -> str:
    """Even-odd crossing count as SQL with the same operation order as
    ``point_in_polygon_expr`` (IEEE-exact parity)."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        ax, ay = _POLY[i]
        bx, by = _POLY[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({ay!r} > northing) <> ({by!r} > northing)) AND "
            f"(easting < {ax!r} + ({bx!r} - {ax!r}) * (northing - {ay!r}) / ({by!r} - {ay!r})) "
            "THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


def _q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from verde_spark.operators.polygons import point_in_polygon

    pts = _points(spark, sf_dir)
    return (
        point_in_polygon(pts, _POLY, col_name="inside")
        .groupBy("inside")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("inside")
    )


def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from verde_spark.operators.polygons import zonal_stats

    pts = _points(spark, sf_dir)
    polys = spark.createDataFrame(
        [("p1", [{"x": float(x), "y": float(y)} for x, y in _POLY])],
        schema="poly_id string, vertices array<struct<x:double,y:double>>",
    )
    # count + sum only: scalars are integer-valued, so sums are exact in
    # both engines (no float rounding concerns)
    return zonal_stats(pts, polys, "scalars", stats=("count", "sum"), method="bbox")


def _q_linear_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-SQL-expressible (Delaunay triangulation): rows-only check.
    from verde_spark import Linear

    pts = _points(spark, sf_dir)
    dec, _ = block_mean(pts, spacing=0.5, region=REGION, sort=False)
    return (
        Linear(tile_spacing=2.5, halo=1.5)
        .fit(dec, region=REGION)
        .grid(spark, region=REGION, shape=(20, 20), output_col="prediction")
    )


def _q_cubic_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-SQL-expressible (Clough-Tocher C1 patches): rows-only check.
    from verde_spark import Cubic

    pts = _points(spark, sf_dir)
    dec, _ = block_mean(pts, spacing=0.5, region=REGION, sort=False)
    return (
        Cubic(tile_spacing=2.5, halo=1.5)
        .fit(dec, region=REGION)
        .grid(spark, region=REGION, shape=(20, 20), output_col="prediction")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "block_mean": _q_block_mean,
        "block_mean_weighted": _q_block_mean_weighted,
        "block_stats": _q_block_stats,
        "block_median": _q_block_median,
        "block_mean_uncertainty": _q_block_mean_uncertainty,
        "inside_filter": _q_inside,
        "get_region": _q_get_region,
        "grid_nodes": _q_grid_nodes,
        "checkerboard": _q_checkerboard,
        "knn_join": _q_knn,
        "rolling_window": _q_rolling_window,
        "expanding_window": _q_expanding_window,
        "distance_mask": _q_distance_mask,
        "convexhull_mask": _q_convexhull,
        "cell_counts": _q_cell_counts,
        "geotag_roundtrip": _q_geotag_roundtrip,
        "trend_coefficients": _q_trend,
        "r2_score": _q_r2,
        "dedup_exact": _q_dedup_exact,
        "duplicate_groups": _q_duplicate_groups,
        "token_counts": _q_token_counts,
        "lang_stats": _q_lang_stats,
        "cosine_topk": _q_cosine_topk,
        "simhash_exact_pairs": _q_simhash_pairs,
        "spline_grid": _q_spline_grid,
        "linear_grid": _q_linear_grid,
        "cubic_grid": _q_cubic_grid,
        "point_in_polygon": _q_point_in_polygon,
        "zonal_stats": _q_zonal_stats,
    }


def oracle_sql() -> dict[str, str]:
    ce, cn = _center_sql()
    label = _LABEL_SQL
    n_e, n_n = GRID.n_east, GRID.n_north
    # grid node axes (linspace with forced endpoint)
    def axis_case(var, start, stop, size):
        step = (stop - start) / (size - 1)
        return (
            f"CASE WHEN {var} = {size - 1} THEN {stop!r} "
            f"ELSE {start!r} + {var} * {step!r} END"
        )

    e_nodes = axis_case("ix", -5.0, 0.0, 11)
    n_nodes = axis_case("iy", 5.0, 10.0, 11)
    grid_nodes_sql = f"""
        SELECT CAST(i // 11 AS BIGINT) AS iy, CAST(i % 11 AS BIGINT) AS ix,
               {n_nodes.replace('iy', '(i // 11)')} AS northing,
               {e_nodes.replace('ix', '(i % 11)')} AS easting
        FROM (SELECT UNNEST(range(121)) AS i)
    """
    return {
        "block_mean": f"""
            WITH pts AS ({_POINTS_SQL}),
            agg AS (
              SELECT {label} AS block, avg(scalars) AS scalars
              FROM pts GROUP BY 1
            )
            SELECT block, {ce} AS easting, {cn} AS northing, scalars
            FROM agg ORDER BY block
        """,
        "block_mean_weighted": f"""
            WITH pts AS ({_POINTS_SQL}),
            agg AS (
              SELECT {label} AS block, sum(weight*scalars)/sum(weight) AS scalars
              FROM pts GROUP BY 1
            )
            SELECT block, {ce} AS easting, {cn} AS northing, scalars
            FROM agg ORDER BY block
        """,
        "block_stats": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT {label} AS block, count(*) AS n,
                   min(scalars) AS min_val, max(scalars) AS max_val,
                   sum(scalars) AS sum_val
            FROM pts GROUP BY 1 ORDER BY block
        """,
        "block_median": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT {label} AS block, median(scalars) AS scalars
            FROM pts GROUP BY 1 ORDER BY block
        """,
        "block_mean_uncertainty": f"""
            WITH pts AS ({_POINTS_SQL}),
            agg AS (
              SELECT {label} AS block,
                     sum(weight*scalars)/sum(weight) AS scalars,
                     1.0/sum(weight) AS var
              FROM pts GROUP BY 1
            ),
            scaled AS (
              SELECT block, scalars,
                     CASE WHEN var > 1e-15
                          THEN (SELECT min(var) FROM agg WHERE var > 1e-15) / var
                          ELSE 1.0 END AS w
              FROM agg
            )
            SELECT block, scalars, round(w, 9) AS weight_scalars
            FROM scaled ORDER BY block
        """,
        "inside_filter": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT event_id, easting, northing FROM pts
            WHERE easting >= -3.0 AND easting <= -1.0
              AND northing >= 6.0 AND northing <= 8.0
        """,
        "get_region": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT min(easting) AS w, max(easting) AS e,
                   min(northing) AS s, max(northing) AS n
            FROM pts
        """,
        "grid_nodes": grid_nodes_sql,
        "checkerboard": f"""
            WITH nodes AS ({grid_nodes_sql})
            SELECT iy, ix,
                   round(1000.0 * sin(2*pi()/2.5 * easting)
                                * cos(2*pi()/2.5 * northing), 6) AS value
            FROM nodes
        """,
        "knn_join": f"""
            WITH pts AS ({_POINTS_SQL}),
            q AS (SELECT event_id AS query_id, easting AS qe, northing AS qn
                  FROM pts WHERE event_id < 20),
            cand AS (
              SELECT q.query_id, p.event_id AS neighbor_id,
                     sqrt((p.easting-q.qe)*(p.easting-q.qe)
                        + (p.northing-q.qn)*(p.northing-q.qn)) AS distance,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY sqrt((p.easting-q.qe)*(p.easting-q.qe)
                                   + (p.northing-q.qn)*(p.northing-q.qn)) ASC,
                                p.event_id ASC
                     ) AS rank
              FROM q CROSS JOIN pts p
            )
            SELECT query_id, neighbor_id, rank, round(distance, 9) AS distance
            FROM cand WHERE rank <= 3 ORDER BY query_id, rank
        """,
        "rolling_window": f"""
            WITH pts AS ({_POINTS_SQL}),
            centers AS (
              SELECT * FROM (VALUES {_rolling_centers_values()})
                AS t(win_id, center_easting, center_northing)
            )
            SELECT c.win_id, c.center_easting, c.center_northing,
                   count(*) AS n, sum(p.scalars) AS sum_val
            FROM centers c JOIN pts p
              ON abs(p.easting - c.center_easting) <= 1.0
             AND abs(p.northing - c.center_northing) <= 1.0
            GROUP BY 1, 2, 3 ORDER BY c.win_id
        """,
        "expanding_window": f"""
            WITH pts AS ({_POINTS_SQL}),
            cheb AS (
              SELECT scalars,
                     greatest(abs(easting - (-2.5)), abs(northing - 7.5)) AS d
              FROM pts
            )
            SELECT CAST(CASE WHEN d <= 0.5 THEN 0 WHEN d <= 1.0 THEN 1
                        WHEN d <= 2.0 THEN 2 END AS BIGINT) AS min_size_idx,
                   count(*) AS n
            FROM cheb WHERE d <= 2.0
            GROUP BY 1 ORDER BY min_size_idx
        """,
        "distance_mask": f"""
            WITH pts AS ({_POINTS_SQL}),
            data AS (SELECT easting, northing FROM pts WHERE event_id % 100 = 0),
            nodes AS ({grid_nodes_sql})
            SELECT iy, ix,
                   EXISTS(SELECT 1 FROM data d
                          WHERE (d.easting-nodes.easting)*(d.easting-nodes.easting)
                              + (d.northing-nodes.northing)*(d.northing-nodes.northing)
                              <= 0.75*0.75) AS in_range
            FROM nodes ORDER BY iy, ix
        """,
        "convexhull_mask": f"""
            WITH nodes AS ({grid_nodes_sql})
            SELECT iy, ix,
                   (easting >= -4.0 AND easting <= -1.0
                    AND northing >= 6.0 AND northing <= 9.0) AS in_hull
            FROM nodes ORDER BY iy, ix
        """,
        "cell_counts": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT {cell_encode_sql('easting', 'northing', 6)} AS cell, count(*) AS n
            FROM pts GROUP BY 1 ORDER BY cell
        """,
        "geotag_roundtrip": f"""
            WITH pts AS ({_POINTS_SQL}),
            tagged AS (
              SELECT event_id, printf('geo:%.6f,%.6f', northing, easting) AS text
              FROM pts WHERE event_id < 1000
            )
            SELECT event_id,
                   TRY_CAST(regexp_extract(text, 'geo:(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1) AS DOUBLE) AS lat,
                   TRY_CAST(regexp_extract(text, 'geo:(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2) AS DOUBLE) AS lon
            FROM tagged
        """,
        "trend_coefficients": f"""
            -- closed-form 3x3 normal-equation solve (Cramer) for the plane
            -- fit 10 + 2e - 0.4n; rounding to 6 decimals absorbs float noise
            WITH pts AS ({_POINTS_SQL}),
            d AS (SELECT easting AS e, northing AS n,
                         10.0 + 2.0*easting - 0.4*northing AS z FROM pts),
            s AS (
              SELECT count(*)::DOUBLE AS s00, sum(e) AS s10, sum(n) AS s01,
                     sum(e*e) AS s20, sum(e*n) AS s11, sum(n*n) AS s02,
                     sum(z) AS t0, sum(e*z) AS t1, sum(n*z) AS t2
              FROM d
            ),
            solved AS (
              SELECT
                (s00*(s20*s02-s11*s11) - s10*(s10*s02-s11*s01) + s01*(s10*s11-s20*s01)) AS det,
                (t0*(s20*s02-s11*s11) - s10*(t1*s02-s11*t2) + s01*(t1*s11-s20*t2)) AS d0,
                (s00*(t1*s02-t2*s11) - t0*(s10*s02-s11*s01) + s01*(s10*t2-t1*s01)) AS d1,
                (s00*(s20*t2-s11*t1) - s10*(s10*t2-t1*s01) + t0*(s10*s11-s20*s01)) AS d2
              FROM s
            )
            SELECT CAST(UNNEST([0, 1, 2]) AS BIGINT) AS coef_idx,
                   UNNEST([round(d0/det, 6), round(d1/det, 6), round(d2/det, 6)]) AS coef
            FROM solved
        """,
        "r2_score": f"""
            WITH pts AS ({_POINTS_SQL}),
            p AS (SELECT scalars, scalars*0.5 + 10.0 AS pred FROM pts)
            SELECT round(1.0 - sum((scalars-pred)*(scalars-pred))
                       / (sum(scalars*scalars) - sum(scalars)*sum(scalars)/count(*)), 9) AS r2
            FROM p
        """,
        "dedup_exact": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
            ORDER BY doc_id
        """,
        "duplicate_groups": """
            SELECT count(*) AS n_copies, min(doc_id) AS keep_id
            FROM documents GROUP BY text HAVING count(*) > 1
            ORDER BY keep_id
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tokens
            FROM documents ORDER BY doc_id
        """,
        "lang_stats": r"""
            SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS total_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
            cand AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                e.vec_id ASC
                     ) AS rank
              FROM q CROSS JOIN embeddings e
            )
            SELECT query_id, neighbor_id, rank FROM cand
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "simhash_exact_pairs": r"""
            -- identical token multisets: exactly what the simhash-candidate +
            -- multiset-verify pipeline returns (hamming 0 is implied)
            WITH toks AS (
              SELECT doc_id,
                     list_sort(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
            FROM toks a JOIN toks b ON a.t = b.t AND a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        "point_in_polygon": f"""
            WITH pts AS ({_POINTS_SQL}),
            flags AS (
              SELECT (({_poly_crossing_sql()}) % 2) = 1 AS inside FROM pts
            )
            SELECT inside, count(*) AS n FROM flags
            GROUP BY inside ORDER BY inside
        """,
        "zonal_stats": f"""
            WITH pts AS ({_POINTS_SQL}),
            flags AS (
              SELECT scalars, (({_poly_crossing_sql()}) % 2) = 1 AS ins FROM pts
            )
            SELECT 'p1' AS poly_id, count(*) AS count_scalars,
                   sum(scalars) AS sum_scalars
            FROM flags WHERE ins
        """,
        # spline_grid / linear_grid / cubic_grid: iterative dense solve /
        # Delaunay triangulation — intentionally no SQL oracle (driver
        # records the weaker rows-only check).
    }
