"""Hashed TF-IDF featurization — turn raw text into sparse L2-normalized
vectors so the similarity / near-dup operators (cosine top-k, embedding
dedup) run on corpora that ship no embedding column.

Public technique: the "hashing trick" TF-IDF (sklearn HashingVectorizer
+ TfidfTransformer; Weinberger et al. 2009 for feature hashing).  The
reference (fatiando/verde) has no text layer; this belongs to the
webtext payload beside BM25 (operators/search.py) — BM25 ranks against
a query at search time, TF-IDF produces a per-document VECTOR usable
for pairwise similarity, clustering (operators/clustering.py) and ANN.

Spark-first shapes:

* **Fit** (:func:`fit_tfidf`): document frequency per hashed bucket =
  ONE ``explode(distinct grams) → groupBy`` aggregate — bounded key
  domain (≤ dim), so the post-partial shuffle is constant-size at any
  corpus scale; only the ≤ dim count rows are collected.  The idf table
  (``ln((1+N)/(1+df_b)) + 1``, sklearn smooth-idf) is Python float64 —
  twin engines embed the literals and never evaluate ``ln``
  (the charlm/DSIR discipline).
* **Transform** (:meth:`TfidfModel.sparse_expr`): pure Catalyst
  projection to ``struct(indices array<int>, values array<double>)``,
  indices sorted ascending (canonical sparse form), values
  L2-normalized.  Bit-identical under the DuckDB twin: the tf counts
  are integers, the idf factors are shared literals, the norm is a
  serial fold + IEEE ``sqrt`` (correctly rounded everywhere), and the
  divisions are IEEE-exact.
* **Similarity** (:func:`sparse_cosine`): dot of two normalized sparse
  vectors via a bucket→value map lookup — one projection, no explode.
  :func:`tfidf_topk` broadcasts a single query vector and compiles to
  TakeOrderedAndProject (per-partition heaps, corpus never shuffled).

The bucket hash is :func:`verde_spark.operators.dsir.dsir_bucket_ids`
(exact mod-prime polynomial — reproducible in any engine, unlike
xxhash); unigrams by default, ``bigrams=True`` matches DSIR features.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dsir import (
    _RAW_SEED,
    _TARGET_SEED,
    dsir_bucket_ids,
    dsir_bucket_ids_sql,
    reference_bucket_ids,
)

__all__ = [
    "EXAMPLE_TFIDF",
    "TfidfModel",
    "fit_tfidf",
    "fit_tfidf_python",
    "reference_sparse_tfidf",
    "sparse_cosine",
    "sparse_cosine_literal_sql",
    "tfidf_topk",
]


@dataclass(frozen=True)
class TfidfModel:
    """A fitted idf table (Python float64 literals, ln-free engines)."""

    idf: tuple = field(repr=False)
    dim: int = 1024
    bigrams: bool = False

    def sparse_expr(self, text: Column | str = "text") -> Column:
        """``struct(indices array<int>, values array<double>)`` —
        sorted hashed buckets with L2-normalized tf·idf weights.  One
        projection, zero shuffle, zero Python.  NULL text → NULL;
        empty/whitespace text → empty arrays."""
        table = F.lit(list(self.idf))
        ids_expr = dsir_bucket_ids(text, self.dim, self.bigrams)

        def _vec(ids: Column) -> Column:
            sd = F.array_sort(F.array_distinct(ids))
            raw = F.transform(
                sd,
                lambda d: (
                    F.size(F.filter(ids, lambda x: x == d)).cast("double")
                    * F.element_at(table, d + 1)
                ),
            )

            def _norm(vals: Column) -> Column:
                n = F.sqrt(
                    F.aggregate(
                        vals, F.lit(0.0), lambda acc, v: acc + v * v
                    )
                )
                return F.struct(
                    sd.alias("indices"),
                    F.transform(vals, lambda v: v / n).alias("values"),
                )

            # let-bind the raw weights: the norm fold and the division
            # both read them (no CSE in interpreted Catalyst)
            return F.element_at(F.transform(F.array(raw), _norm), 1)

        # let-bind the gram ids: the distinct pass and every per-bucket
        # count filter read them (the CollapseProject trap otherwise
        # re-runs the full hash per bucket).  The explicit null guard
        # matters: without it a NULL text yields struct(NULL, NULL)
        # (the struct constructor never returns NULL), not NULL.
        t = (F.col(text) if isinstance(text, str) else text).cast("string")
        return F.when(
            t.isNotNull(),
            F.element_at(F.transform(F.array(ids_expr), _vec), 1),
        )

    def sparse_sql(self, col: str) -> str:
        """DuckDB twin of :meth:`sparse_expr` — identical literals,
        fold order, sqrt and divisions → bit-identical vectors."""
        lits = ", ".join(f"'{float(x)!r}'::DOUBLE" for x in self.idf)
        ids = dsir_bucket_ids_sql(col, self.dim, self.bigrams)
        # let-bind via a 1-element list_transform chain (ids → raw)
        sd = "list_sort(list_distinct(i))"
        raw = (
            f"list_transform({sd}, d -> "
            f"len(list_filter(i, x -> x = d))::DOUBLE * ([{lits}])[d + 1])"
        )
        inner = (
            f"list_transform([{ids}], i -> "
            f"{{'indices': {sd}, 'raw': {raw}}})[1]"
        )
        norm = (
            "sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
            "list_transform(s.raw, v -> v * v)), (acc, x) -> acc + x))"
        )
        body = (
            f"list_transform([{inner}], s -> {{'indices': s.indices, "
            f"'values': list_transform(s.raw, v -> v / {norm})}})[1]"
        )
        return f"CASE WHEN {col} IS NULL THEN NULL ELSE {body} END"


def fit_tfidf(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 1024,
    bigrams: bool = False,
) -> TfidfModel:
    """Fit the idf table: ONE bounded-key aggregation (distinct hashed
    grams per doc → bucket document frequencies); only the ≤ dim count
    rows and the corpus row count reach the driver."""
    ids = dsir_bucket_ids(text_col, dim, bigrams)
    per_doc = df.select(F.array_distinct(ids).alias("b")).filter(
        F.col("b").isNotNull()
    )
    agg = (
        per_doc.select(F.explode("b").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = per_doc.count()
    dfreq = {r["bucket"]: r["df"] for r in agg.collect()}
    idf = tuple(
        math.log((1.0 + n_docs) / (1.0 + dfreq.get(b, 0))) + 1.0
        for b in range(dim)
    )
    return TfidfModel(idf=idf, dim=dim, bigrams=bigrams)


def fit_tfidf_python(
    texts: list, dim: int = 1024, bigrams: bool = False
) -> TfidfModel:
    """Pure-Python fit (code-constant models / fit parity reference)."""
    dfreq: dict = {}
    n_docs = 0
    for t in texts:
        ids = reference_bucket_ids(t, dim, bigrams)
        if ids is None:
            continue
        n_docs += 1
        for b in set(ids):
            dfreq[b] = dfreq.get(b, 0) + 1
    idf = tuple(
        math.log((1.0 + n_docs) / (1.0 + dfreq.get(b, 0))) + 1.0
        for b in range(dim)
    )
    return TfidfModel(idf=idf, dim=dim, bigrams=bigrams)


def reference_sparse_tfidf(text, model: TfidfModel):
    """Single-value Python reference for :meth:`TfidfModel.sparse_expr`
    — identical count/fold/sqrt order, so it matches BIT-for-bit."""
    ids = reference_bucket_ids(text, model.dim, model.bigrams)
    if ids is None:
        return None
    sd = sorted(set(ids))
    raw = [ids.count(d) * model.idf[d] for d in sd]
    acc = 0.0
    for v in raw:
        acc += v * v
    n = math.sqrt(acc)
    return sd, [v / n for v in raw]


def sparse_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two L2-normalized sparse vectors (structs
    as built by :meth:`TfidfModel.sparse_expr`): dot via a bucket→value
    map over the smaller operand — ONE projection, no explode."""
    av = F.col(a) if isinstance(a, str) else a
    bv = F.col(b) if isinstance(b, str) else b

    def _dot(m: Column) -> Column:
        return F.aggregate(
            F.arrays_zip(av["indices"].alias("i"), av["values"].alias("v")),
            F.lit(0.0),
            lambda acc, e: acc
            + e["v"] * F.coalesce(F.element_at(m, e["i"]), F.lit(0.0)),
        )

    bmap = F.map_from_arrays(bv["indices"], bv["values"])
    return F.element_at(F.transform(F.array(bmap), _dot), 1)


def tfidf_topk(
    corpus: DataFrame,
    query_text: str,
    model: TfidfModel,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by TF-IDF cosine against one query string.  The
    query vector is computed driver-side in Python (bit-identical to
    the engine expression) and enters the plan as LITERAL arrays — the
    corpus is scanned once, scored in a projection, and reduced by
    TakeOrderedAndProject.  Zero shuffle at any corpus size."""
    q = reference_sparse_tfidf(query_text, model)
    if q is None or not q[0]:
        raise ValueError("query_text produced an empty tf-idf vector")
    q_idx, q_val = q
    qv = F.struct(
        F.lit(list(q_idx)).alias("indices"),
        F.lit(list(q_val)).alias("values"),
    )
    scored = corpus.filter(F.col(text_col).isNotNull()).select(
        id_col,
        sparse_cosine(model.sparse_expr(text_col), qv).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def sparse_cosine_literal_sql(vec: str, q_idx, q_val) -> str:
    """DuckDB twin of :func:`sparse_cosine` against a LITERAL query
    vector (the :func:`tfidf_topk` shape): the dot accumulates over the
    document's indices in ascending order — exactly the Spark fold — so
    the score replays bit-for-bit."""
    qi = ", ".join(str(int(i)) for i in q_idx)
    qv = ", ".join(f"'{float(x)!r}'::DOUBLE" for x in q_val)
    dot = (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(range(1, len(s.indices) + 1), j -> "
        f"s.values[j] * coalesce(([{qv}])[list_position([{qi}], "
        "s.indices[j])], 0.0))), (acc, x) -> acc + x)"
    )
    return f"list_transform([{vec}], s -> {dot})[1]"


#: code-constant example model (the charlm ENGLISH_LM discipline):
#: fitted in pure Python at import over the DSIR seed prose, so static
#: driver oracle SQL embeds the identical idf literals
EXAMPLE_TFIDF = fit_tfidf_python(list(_TARGET_SEED) + list(_RAW_SEED), dim=128)
