"""Vocabulary building + token-id encoding — the bridge from cleaned text
to the integer sequences a training pipeline actually ships (the ids feed
``operators.packing.pack_sequences``).

* :func:`build_vocab` — frequency vocabulary: ONE map-side-combinable
  word-count aggregate (shuffle carries distinct words per task, not
  occurrences) → top-``size`` by (count desc, token asc) as a
  TakeOrderedAndProject → dense ids 0..size-1 in that order.  Exact
  integers end to end: any twin engine reproduces the vocabulary
  bit-for-bit.
* :func:`encode_tokens` — text → ``array<int>`` ids with OOV policy
  (``unk_id``, default -1; or drop).  Two engines:
  ``method="map"`` builds a literal Catalyst map from the collected
  vocab (documented tiny side — vocabularies are ≤ a few 100k entries
  by construction) so encoding is a PURE codegen projection with zero
  shuffles at any corpus size; ``method="join"`` is the fully
  distributed fallback for huge vocabularies (posexplode → broadcast
  join → regroup, 1 shuffle) — both produce identical output (tested).

Tokenizer = the engine-portable ``lower → split [^a-z0-9]+`` shared with
BM25 (`operators.search.tokens_expr`), so search, vocab, and encoding
agree on word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["build_vocab", "encode_tokens", "build_vocab_sql", "encode_tokens_sql"]


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Top-``size`` frequency vocabulary → ``(token, id int, count long)``.

    Ties break lexicographically so the id assignment is deterministic
    and engine-portable.  The final ranking window runs on ≤``size`` rows
    (post-limit), not the corpus.
    """
    from ..operators.search import tokens_expr

    counts = (
        df.select(F.explode(tokens_expr(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    order = [F.col("count").desc(), F.col("token").asc()]
    top = counts.orderBy(*order).limit(size)
    return top.select(
        "token",
        (F.row_number().over(Window.orderBy(*order)) - 1).cast("int").alias("id"),
        "count",
    )


def build_vocab_sql(
    col: str = "text",
    size: int = 1000,
    min_count: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`build_vocab` (integer-exact)."""
    return f"""
        WITH tok AS (
          SELECT unnest(list_filter(
            string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> ''
          )) AS token FROM {table}
        ),
        cnt AS (
          SELECT token, CAST(count(*) AS BIGINT) AS count
          FROM tok GROUP BY token HAVING count(*) >= {min_count}
        ),
        top AS (
          SELECT token, count FROM cnt
          ORDER BY count DESC, token LIMIT {size}
        )
        SELECT token,
               CAST(row_number() OVER (ORDER BY count DESC, token) - 1 AS INT)
                 AS id,
               count
        FROM top
    """


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "token_ids",
    unk_id: int | None = -1,
    method: str = "map",
) -> DataFrame:
    """Add ``out_col``: the text's token-id array under *vocab*
    (``(token, id)`` rows, e.g. from :func:`build_vocab`).

    ``unk_id=None`` drops out-of-vocabulary tokens; otherwise they map to
    ``unk_id``.  ``method="map"`` collects the vocab into a literal map
    (tiny side by construction) — zero shuffles; ``method="join"`` keeps
    everything distributed (posexplode → broadcast-joined vocab →
    regroup in position order) for vocabularies too big to inline.
    """
    from ..operators.search import tokens_expr

    toks = tokens_expr(text_col)
    if method == "map":
        rows = vocab.select("token", "id").collect()
        pairs: list[Column] = []
        for r in rows:
            pairs.append(F.lit(r["token"]))
            pairs.append(F.lit(int(r["id"])).cast("int"))
        m = F.create_map(*pairs) if pairs else F.create_map().cast("map<string,int>")
        looked = F.transform(toks, lambda t: F.element_at(m, t))
        if unk_id is None:
            ids = F.filter(looked, lambda x: x.isNotNull())
        else:
            ids = F.transform(
                looked, lambda x: F.coalesce(x, F.lit(int(unk_id)).cast("int"))
            )
        return df.withColumn(out_col, ids)
    if method != "join":
        raise ValueError(f"unknown method: {method!r}")
    exploded = df.select(
        F.col(id_col).alias("__did"), F.posexplode(toks).alias("__pos", "__tok")
    )
    joined = exploded.join(
        F.broadcast(vocab.select(F.col("token").alias("__tok"), F.col("id").alias("__vid"))),
        "__tok",
        "left",
    )
    if unk_id is None:
        joined = joined.filter(F.col("__vid").isNotNull())
        val = F.col("__vid")
    else:
        val = F.coalesce(F.col("__vid"), F.lit(int(unk_id)))
    regrouped = (
        joined.groupBy("__did")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos").alias("p"), val.cast("int").alias("v")))
            ).alias("__pv")
        )
        .select(
            F.col("__did"),
            F.transform(F.col("__pv"), lambda s: s["v"]).alias(out_col),
        )
    )
    # engine parity with method="map": NULL text stays NULL (transform
    # over a null array propagates); only docs WITH text coalesce their
    # missing regroup row (zero tokens) to an empty array
    return df.join(regrouped, df[id_col] == regrouped["__did"], "left").drop(
        "__did"
    ).withColumn(
        out_col,
        F.when(
            F.col(text_col).isNotNull(),
            F.coalesce(F.col(out_col), F.array().cast("array<int>")),
        ),
    )


def encode_tokens_sql(
    src_sql: str,
    vocab_sql: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "token_ids",
    unk_id: int | None = -1,
    select_cols: str | None = None,
) -> str:
    """DuckDB twin of :func:`encode_tokens` (join semantics — identical
    output to both Spark methods)."""
    unk = "NULL" if unk_id is None else str(int(unk_id))
    keep = "" if unk_id is not None else " AND vid IS NOT NULL"
    cols = select_cols or f"src.{id_col}"
    return f"""
        WITH src AS ({src_sql}),
        voc AS ({vocab_sql}),
        lists AS (
          SELECT {id_col},
                 list_filter(
                   string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                   x -> x <> ''
                 ) AS ts
          FROM src
        ),
        tok AS (
          SELECT {id_col}, unnest(ts) AS t,
                 unnest(range(1, len(ts) + 1)) AS pos
          FROM lists
        ),
        looked AS (
          SELECT tok.{id_col}, tok.pos,
                 COALESCE(voc.id, {unk}) AS vid
          FROM tok LEFT JOIN voc ON voc.token = tok.t
        ),
        grouped AS (
          SELECT {id_col},
                 list(CAST(vid AS INT) ORDER BY pos) AS {out_col}
          FROM looked WHERE TRUE{keep} GROUP BY {id_col}
        )
        SELECT {cols},
               COALESCE(grouped.{out_col}, []::INT[]) AS {out_col}
        FROM src LEFT JOIN grouped USING ({id_col})
    """
