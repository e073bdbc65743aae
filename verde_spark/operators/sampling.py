"""Deterministic sampling + dataset-split operators for training pipelines.

All three are rank-by-hash constructions, so the result is a pure
function of the data — stable under retries, repartitioning, and
cluster size (unlike ``DataFrame.sample``, whose Bernoulli draw depends
on partition boundaries):

* ``stratified_sample`` — exactly ≤ n rows per stratum: one window per
  stratum key (single shuffle, ``WindowGroupLimit`` partial top-k below
  the exchange).
* ``deterministic_sample`` — global n rows by minimal hash: Spark plans
  a ``TakeOrderedAndProject`` (per-partition partial top-n, no full
  sort).
* ``hash_split`` — train/val/test labels from a bucketed hash of a key
  column: a stateless projection, no shuffle at all; every row of a key
  lands in the same split on any machine.

The hash is ``xxhash64`` by default; pass ``hash_expr`` for a custom
(e.g. SQL-portable arithmetic) ranking key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    hash_expr: Optional[Column] = None,
    keep_rank: bool = False,
) -> DataFrame:
    """At most *n_per_stratum* rows per value of *strata_col*, chosen by
    minimal hash rank within the stratum (deterministic pseudo-random).

    One hash-partition window; skewed strata (one viral language/domain)
    stay a single partition's problem and AQE can split the exchange.
    """
    h = hash_expr if hash_expr is not None else F.xxhash64(*[F.col(c) for c in df.columns])
    win = Window.partitionBy(strata_col).orderBy(h.asc())
    out = df.withColumn("__rank", F.row_number().over(win)).filter(
        F.col("__rank") <= n_per_stratum
    )
    return out if keep_rank else out.drop("__rank")


def cap_per_domain(
    df: DataFrame,
    max_pages: int,
    url_col: str = "url",
    domain_col: Optional[str] = None,
    hash_expr: Optional[Column] = None,
    keep_domain: bool = False,
) -> DataFrame:
    """At most *max_pages* rows per web domain — corpus balance
    enforcement (``top_domains`` exposes the skew; this caps it: one
    viral domain must not dominate a training mix).

    The domain is parsed from *url_col* (``functions.urls.domain_of`` —
    lowercased host, credentials/port stripped) unless *domain_col*
    names an existing column.  Row choice within a domain is minimal
    deterministic hash rank (stable under retries / repartitioning /
    cluster size), overridable via *hash_expr*.

    Physical shape = :func:`stratified_sample`: ONE hash-partition
    window whose ``row_number <= k`` plans as ``WindowGroupLimit`` —
    each map task keeps only its local top-k per domain below the
    exchange, so a 10^9-page domain ships ~k rows per task, not its
    whole traffic.  ``keep_domain=True`` retains the derived
    ``__domain`` column for downstream stratification.
    """
    if max_pages < 1:
        raise ValueError(f"max_pages must be ≥ 1, got {max_pages!r}")
    if domain_col is None:
        from ..functions.urls import domain_of

        df = df.withColumn("__domain", domain_of(url_col))
        domain_col, derived = "__domain", True
    else:
        derived = False
    out = stratified_sample(
        df, domain_col, max_pages, hash_expr=hash_expr
    )
    if derived and not keep_domain:
        out = out.drop("__domain")
    return out


def deterministic_sample(
    df: DataFrame, n: int, hash_expr: Optional[Column] = None
) -> DataFrame:
    """Global deterministic sample of *n* rows (minimal-hash order).

    ``orderBy(hash).limit(n)`` plans as ``TakeOrderedAndProject``:
    each partition keeps its local top-n, the driver merges — no global
    sort, no full shuffle.
    """
    h = hash_expr if hash_expr is not None else F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn("__h", h).orderBy(F.col("__h").asc()).limit(n).drop("__h")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float] = (0.9, 0.05, 0.05),
    labels: Optional[Sequence[str]] = None,
    split_col: str = "split",
    buckets: int = 10_000,
    seed: int = 0,
) -> DataFrame:
    """Stable train/val/test assignment from a hash of *key_col*.

    ``pmod(xxhash64(key, seed), buckets)`` maps each key to a bucket;
    cumulative weight boundaries map buckets to labels. Properties a
    training pipeline needs: (a) pure projection — no shuffle, survives
    any repartition; (b) same key → same split across runs AND across
    tables (join-free leakage control: a url never straddles train and
    test); (c) re-running with one more label only moves the boundary
    buckets.
    """
    if labels is None:
        labels = ["train", "val", "test"][: len(weights)]
    if len(labels) != len(weights):
        raise ValueError("labels and weights must have the same length")
    total = float(sum(weights))
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(buckets))
    expr = None
    acc = 0.0
    for label, wgt in zip(labels, weights):
        acc += wgt / total
        bound = int(round(acc * buckets))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(split_col, expr.otherwise(F.lit(labels[-1])))


def hash_sample(
    df: DataFrame,
    fraction,
    key_col: Optional[str] = None,
    strata_col: Optional[str] = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample — a pure projection.

    Keeps rows where ``pmod(xxhash64(key, seed), 2^20) < fraction·2^20``:
    no shuffle, stable under retries/repartitioning (unlike
    ``DataFrame.sample``), and — when *key_col* is a cross-table key like
    a url — CONSISTENT across tables: every table sampled with the same
    key/seed keeps the same entities, so sampled joins stay complete.

    *fraction* is a float, or a ``{stratum: float}`` dict with
    *strata_col* set (per-language/per-domain rates; unlisted strata get
    0).  Default key is all columns (row-content hash).
    """
    buckets = 1 << 20
    key = (
        F.xxhash64(F.col(key_col), F.lit(seed))
        if key_col
        else F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    )
    bucket = F.pmod(key, F.lit(buckets))
    if isinstance(fraction, dict):
        if not strata_col:
            raise ValueError("per-stratum fractions need strata_col")
        expr = None
        for stratum, frac in fraction.items():
            cond = (F.col(strata_col) == F.lit(stratum)) & (
                bucket < F.lit(int(round(frac * buckets)))
            )
            expr = cond if expr is None else expr | cond
        return df.filter(expr)
    return df.filter(bucket < F.lit(int(round(float(fraction) * buckets))))
