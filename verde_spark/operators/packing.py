"""Sequence packing: lay documents end-to-end into fixed-length training
sequences (the "concat then chunk" packing every LLM data pipeline ends
with).

No reference counterpart (fatiando/verde is a gridding library) — this
is part of the web-scale training-data layer the task brief asks for,
alongside dedup/decontamination/quality gates.

Physical shape at 10^12 docs: packing is inherently sequential *within a
stream*, so the distributed form shards the corpus by hash into
``n_shards`` independent streams (each one training-data file / reader
worker) and packs each shard with ONE window cumulative sum:

    shard = pmod(hash(id), n_shards)          -- pure projection
    offset = sum(tokens) OVER (shard ORDER BY rank)  -- one shuffle
    start_seq = floor(start_offset / seq_len) -- pure projection

Per-shard window state is a running sum — Spark's WindowExec streams it
without materializing the frame, and shard count bounds every partition,
so the single exchange is the whole cost.  Document order within a shard
is deterministic (hash rank), making the layout reproducible run-to-run
and across engines — the property that lets a resumable training job
find byte-identical sequence boundaries after restart.

A doc whose token span crosses a multiple of ``seq_len`` spans two (or
more) consecutive sequences — exactly the standard packing semantics
(no padding between docs; ``sep_tokens`` reserves room for separator /
EOD tokens after each doc).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
    sep_tokens: int = 1,
    hash_expr: Optional[Column] = None,
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """Assign every doc its (shard, token offsets, sequence span).

    Returns the input's ``id_col`` plus ``shard``, ``n_tokens``,
    ``start_tok``/``end_tok`` (offsets into the shard's token stream,
    end exclusive of the ``sep_tokens`` separator), and
    ``start_seq``/``end_seq`` (the fixed-length sequences the doc's
    tokens land in; end inclusive).

    ``hash_expr`` overrides the ordering/sharding key (an injective
    arithmetic expression keeps a DuckDB oracle tie-free);
    ``tokens_col`` uses a precomputed token count instead of the
    whitespace tokenizer.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from ..functions.text import token_count

    key = F.xxhash64(F.col(id_col)) if hash_expr is None else hash_expr
    # NULL text / NULL token count → 0 tokens, NOT a NULL span: a NULL
    # _span would vanish from the window sum while the doc still gets a
    # non-null end offset, silently overlapping its neighbor's token
    # span in the shard stream
    toks = F.coalesce(
        (
            F.col(tokens_col)
            if tokens_col is not None
            else token_count(text_col)
        ).cast("long"),
        F.lit(0),
    )
    base = df.select(
        F.col(id_col),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
        key.alias("_rank"),
        (toks + F.lit(int(sep_tokens))).alias("_span"),
        toks.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_rank", id_col)
    # running end-offset of each doc's span within its shard stream
    end = F.sum("_span").over(w)
    out = base.select(
        id_col,
        "shard",
        "n_tokens",
        (end - F.col("_span")).alias("start_tok"),
        (end - F.lit(int(sep_tokens))).alias("end_tok"),
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_tok",
        "end_tok",
        F.floor(F.col("start_tok") / seq_len).cast("long").alias("start_seq"),
        # empty docs occupy no tokens: their sequence span collapses to
        # the one containing start_tok
        F.floor(
            F.greatest(F.col("end_tok") - 1, F.col("start_tok")) / seq_len
        ).cast("long").alias("end_seq"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing summary: docs, tokens, sequences, waste.

    ``n_sequences`` counts the fixed-length sequences the shard's stream
    fills (ceil of total span / seq_len); ``tail_waste`` is the padding
    the final partial sequence needs.  One map-side-combined aggregate
    over :func:`pack_sequences` output.
    """
    span = F.max(F.col("end_tok"))  # separators after the last doc never pad
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.ceil(span / seq_len).cast("long").alias("n_sequences"),
            (F.ceil(span / seq_len) * seq_len - span).cast("long").alias("tail_waste"),
        )
        .orderBy("shard")
    )
