"""kNN interpolation as a distributed cell join (verde neighbors.py:20-140).

The reference builds one KD-tree over all data and queries k neighbors per
prediction point. Distributed form: both sides get an (unclamped) square
cell index; each query point is exploded into its ring-r candidate cells
and **equi-joined** on the cell key (shuffle-hash join, AQE skew-split
eligible — never a cartesian/range join), then
``row_number() over (partition by query order by distance, id)`` keeps the
top k. Ring-r completeness: every data point outside ring r is at
Euclidean distance ≥ r·cell_size from the query, so a query whose kth
candidate distance is ≤ r·cell_size is final; unfinished queries (sparse
regions) escalate with a doubled ring in a driver-side loop — at most
``max_rounds`` geometric rounds, each a bounded join over only the
stragglers, with a brute-force cross join as the final fallback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..base import BaseGridder


def _cell_index(coord, origin: float, cell_size: float):
    """Unclamped integer cell index (floor division from a fixed origin)."""
    return F.floor((coord - F.lit(origin)) / F.lit(cell_size)).cast("long")


def _topk(cand: DataFrame, query_id: str, k: int) -> DataFrame:
    win = Window.partitionBy(query_id).orderBy(F.col("distance").asc(), F.col("__did").asc())
    return cand.withColumn("rank", F.row_number().over(win)).filter(F.col("rank") <= k)


def knn_join(
    data: DataFrame,
    queries: DataFrame,
    k: int = 1,
    cell_size: Optional[float] = None,
    data_easting: str = "easting",
    data_northing: str = "northing",
    query_easting: str = "easting",
    query_northing: str = "northing",
    query_id: str = "__qid",
    max_rounds: int = 5,
    bbox: Optional[Tuple[float, float, float, float]] = None,
    count: Optional[int] = None,
) -> DataFrame:
    """Top-k nearest data points per query point.

    Returns ``query columns + neighbor data columns (prefixed 'nb_') +
    distance + rank``. Distance ties break by a content-derived data row id
    (``xxhash64`` over all data columns) so the result is deterministic
    under task retries and any repartitioning — ``monotonically_increasing_id``
    would assign different ids per partitioning and flip equal-distance
    ties run-to-run. (verde's reductions are order-insensitive over the
    k-set; only set membership matters — neighbors.py:111-140.)

    Supply a stable ``query_id`` column when one exists; otherwise a
    monotonic id is generated (deterministic for deterministic sources).
    """
    # the output appends its OWN distance/rank columns; a query frame
    # already carrying either (e.g. BaseGridder.profile output) would be
    # silently overwritten mid-join and the final aggregation would read
    # neighbor distances where the caller's values were expected —
    # refuse loudly (KNeighbors.predict shows the namespacing pattern)
    clash = {"distance", "rank"} & set(queries.columns)
    if clash:
        raise ValueError(
            f"queries already carry reserved output column(s) "
            f"{sorted(clash)}; rename or project them away before "
            "knn_join (see KNeighbors.predict for the namespacing "
            "pattern)"
        )
    if query_id not in queries.columns:
        queries = queries.withColumn(query_id, F.monotonically_increasing_id())
    data = data.withColumn("__did", F.xxhash64(*[F.col(c) for c in data.columns]))

    # one scan for bbox + count (two separate jobs would scan data twice);
    # callers that already know both (e.g. KNeighbors.fit) pass them in and
    # skip this scan entirely — one job saved per predict call
    if bbox is not None and count is not None:
        (w, e, s, n), cnt = bbox, count
    else:
        row = data.agg(
            F.min(data_easting).alias("w"), F.max(data_easting).alias("e"),
            F.min(data_northing).alias("s"), F.max(data_northing).alias("n"),
            F.count(F.lit(1)).alias("cnt"),
        ).first()
        w, e, s, n, cnt = row["w"], row["e"], row["s"], row["n"], row["cnt"]
    if cell_size is None:
        extent = max(e - w, n - s) or 1.0
        cells = max(1, int(np.sqrt(max(cnt, 1) / 64.0)))
        cell_size = extent / cells
    cell_size = float(cell_size)

    d = data.withColumn("dix", _cell_index(F.col(data_easting), w, cell_size)).withColumn(
        "diy", _cell_index(F.col(data_northing), s, cell_size)
    )
    d = d.select(
        "__did",
        "dix",
        "diy",
        *[F.col(c).alias(f"nb_{c}") for c in data.columns if c != "__did"],
    )
    de, dn = F.col(f"nb_{data_easting}"), F.col(f"nb_{data_northing}")

    q = queries.withColumn("qix", _cell_index(F.col(query_easting), w, cell_size)).withColumn(
        "qiy", _cell_index(F.col(query_northing), s, cell_size)
    )

    def dist_col():
        return F.sqrt(
            (de - F.col(query_easting)) * (de - F.col(query_easting))
            + (dn - F.col(query_northing)) * (dn - F.col(query_northing))
        )

    remaining = q
    finished = []
    ring = 1
    for _ in range(max_rounds):
        # explode the query into its (2r+1)^2 candidate cells → equi-join.
        cand_cells = remaining.withColumn(
            "cix", F.explode(F.sequence(F.col("qix") - ring, F.col("qix") + ring))
        ).withColumn("ciy", F.explode(F.sequence(F.col("qiy") - ring, F.col("qiy") + ring)))
        cand = cand_cells.join(
            d, (F.col("cix") == F.col("dix")) & (F.col("ciy") == F.col("diy"))
        ).withColumn("distance", dist_col())
        # localCheckpoint the round's top-k (≤ queries×k rows): cuts the
        # per-round lineage so round r never recomputes rounds 1..r-1 (the
        # former O(rounds²) job blow-up), stores RDD-level blocks the
        # context cleaner frees once the result DataFrame is dropped (a
        # SQL-level persist() would sit in the CacheManager for the session
        # lifetime, leaking one cache entry per knn_join call), and keeps
        # the RETURNED plan lazy — the caller's first action just reads
        # these small checkpointed blocks instead of paying an extra eager
        # materialization of the full result here.
        topk = _topk(cand, query_id, k).localCheckpoint(eager=True)
        stats = topk.groupBy(query_id).agg(
            F.count(F.lit(1)).alias("__nk"), F.max("distance").alias("__kdist")
        )
        done_ids = stats.filter(
            (F.col("__nk") >= k) & (F.col("__kdist") <= F.lit(float(ring) * cell_size))
        ).select(query_id)
        finished.append(topk.join(done_ids, query_id, "left_semi"))
        remaining = remaining.join(done_ids, query_id, "left_anti").localCheckpoint(
            eager=True
        )
        n_rem = remaining.count()  # cheap: counts the checkpointed blocks
        if n_rem == 0:
            remaining = None
            break
        ring *= 2
    if remaining is not None:
        cand = remaining.crossJoin(d).withColumn("distance", dist_col())
        finished.append(_topk(cand, query_id, k))

    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    drop = [c for c in ("qix", "qiy", "cix", "ciy", "dix", "diy", "__did", "nb___did",
                        "nb_dix", "nb_diy") if c in out.columns]
    out = out.drop(*drop)
    # the union stacks every round's partitioning (~rounds ×
    # shuffle.partitions of mostly-empty tasks); coalesce to the session
    # parallelism so downstream stages schedule sensibly
    sc = data.sparkSession.sparkContext
    return out.coalesce(sc.defaultParallelism)


class KNeighbors(BaseGridder):
    """verde ``KNeighbors`` gridder (neighbors.py:20-140): mean/median of the
    k nearest data values at each prediction point.

    grid/scatter/profile/score come from :class:`verde_spark.base.BaseGridder`.
    """

    def __init__(self, k: int = 1, reduction: str = "mean"):
        self.k = k
        self.reduction = reduction
        self.data_: Optional[DataFrame] = None
        self.region_: Optional[Tuple[float, float, float, float]] = None
        self._names: Tuple[str, str, str] = ("easting", "northing", "scalars")

    def fit(
        self,
        df: DataFrame,
        data_col: str = "scalars",
        easting: str = "easting",
        northing: str = "northing",
        weight_col: Optional[str] = None,
    ) -> "KNeighbors":
        if weight_col is not None:
            import warnings

            # parity with the reference: KNeighbors cannot use weights and
            # says so out loud (verde neighbors.py:96-102)
            warnings.warn(
                "KNeighbors does not support weights and they will be ignored."
            )
        self._names = (easting, northing, data_col)
        self.data_ = df.select(easting, northing, data_col)
        # bbox AND count in one scan, reused by every predict (knn_join
        # skips its own bbox/count job when both are supplied)
        row = self.data_.agg(
            F.min(easting), F.max(easting), F.min(northing), F.max(northing),
            F.count(F.lit(1)),
        ).first()
        self.region_ = (row[0], row[1], row[2], row[3])
        self._count = row[4]
        return self

    def predict(
        self,
        df: DataFrame,
        output_col: str = "prediction",
        easting: str = "easting",
        northing: str = "northing",
    ) -> DataFrame:
        if self.data_ is None:
            raise RuntimeError("KNeighbors is not fitted.")
        de, dn, dv = self._names
        qid = "__qid"
        # query columns move to a private namespace around the join:
        # knn_join emits its own "distance" / "nb_*" columns, which would
        # otherwise collide with same-named query columns (e.g. the
        # "distance" column of BaseGridder.profile points)
        safe = {c: f"__q{i}" for i, c in enumerate(df.columns)}
        queries = df.select(
            *[F.col(c).alias(safe[c]) for c in df.columns]
        ).withColumn(qid, F.monotonically_increasing_id())
        joined = knn_join(
            self.data_,
            queries,
            k=self.k,
            data_easting=de,
            data_northing=dn,
            query_easting=safe[easting],
            query_northing=safe[northing],
            query_id=qid,
            bbox=self.region_,
            count=self._count,
        )
        # the reference's reduction is a numpy callable over the k values
        # (default np.mean, neighbors.py:65); known callables normalize to
        # the native aggregate (same registry as block_reduce)
        from .blockreduce import _REDUCTIONS, _normalize_reduction

        name = _normalize_reduction(self.reduction)
        if callable(name):
            raise ValueError(
                f"KNeighbors reduction {self.reduction!r} is not a recognized "
                f"named/numpy reduction; use one of {sorted(_REDUCTIONS)}"
            )
        red = _REDUCTIONS[name]
        # single pass: carry the query columns through the agg (no join back,
        # so the generated qid is only ever used inside one lineage).
        aggs = [F.first(F.col(safe[c])).alias(c) for c in df.columns] + [
            red(F.col(f"nb_{dv}")).alias(output_col)
        ]
        return joined.groupBy(qid).agg(*aggs).drop(qid)


def median_distance(
    df: DataFrame,
    k: int = 1,
    easting: str = "easting",
    northing: str = "northing",
) -> DataFrame:
    """Per-point median distance to its k nearest neighbors, excluding self
    (verde distances.py:16-111: queries k+1 and drops the zero self-hit)."""
    # query columns move to a private namespace around the join (the
    # KNeighbors.predict pattern): knn_join refuses query frames whose
    # own distance/rank columns its output would overwrite
    safe = {c: f"__q{i}" for i, c in enumerate(df.columns)}
    pts = df.select(
        *[F.col(c).alias(safe[c]) for c in df.columns]
    ).withColumn("__qid", F.monotonically_increasing_id())
    joined = knn_join(
        df.select(easting, northing),
        pts,
        k=k + 1,
        data_easting=easting,
        data_northing=northing,
        query_easting=safe[easting],
        query_northing=safe[northing],
        query_id="__qid",
    )
    no_self = joined.filter(F.col("rank") > 1)
    aggs = [F.first(F.col(safe[c])).alias(c) for c in df.columns] + [
        F.median("distance").alias("median_distance")
    ]
    return no_self.groupBy("__qid").agg(*aggs).drop("__qid")
