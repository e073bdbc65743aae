"""pack_sequences: concat-then-chunk training-sequence packing."""

import pytest
from pyspark.sql import functions as F

from verde_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, counts):
    rows = [(i, " ".join(f"w{j}" for j in range(c))) for i, c in enumerate(counts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_shard_layout_by_hand(spark):
    counts = [10, 3, 7, 0, 5]
    df = _docs(spark, counts)
    out = (
        pack_sequences(
            df, seq_len=8, n_shards=1, sep_tokens=1, hash_expr=F.col("doc_id")
        )
        .orderBy("doc_id")
        .collect()
    )
    # hash_expr = doc_id -> docs laid out in id order; offsets by hand:
    # spans (tokens+sep): 11, 4, 8, 1, 6 -> starts 0, 11, 15, 23, 24
    assert [r["start_tok"] for r in out] == [0, 11, 15, 23, 24]
    assert [r["end_tok"] for r in out] == [10, 14, 22, 23, 29]
    assert [r["n_tokens"] for r in out] == counts
    # seq_len=8: doc0 tokens 0-9 spans seqs 0-1; doc2 tokens 15-21 spans 1-2
    assert (out[0]["start_seq"], out[0]["end_seq"]) == (0, 1)
    assert (out[2]["start_seq"], out[2]["end_seq"]) == (1, 2)
    # empty doc occupies no tokens: collapses to the seq holding start_tok
    assert (out[3]["start_seq"], out[3]["end_seq"]) == (2, 2)

    stats = packing_stats(
        pack_sequences(df, 8, n_shards=1, hash_expr=F.col("doc_id")), 8
    ).collect()
    assert len(stats) == 1
    s = stats[0]
    # stream span = last end_tok = 29 -> ceil(29/8) = 4 sequences, 3 waste
    assert (s["n_docs"], s["n_tokens"], s["n_sequences"], s["tail_waste"]) == (
        5, 25, 4, 3,
    )


def test_shards_are_independent_contiguous_streams(spark):
    df = _docs(spark, [4] * 100)
    out = pack_sequences(df, seq_len=16, n_shards=4, sep_tokens=1).collect()
    assert {r["shard"] for r in out} == {0, 1, 2, 3}
    for shard in range(4):
        rows = sorted(
            (r for r in out if r["shard"] == shard), key=lambda r: r["start_tok"]
        )
        assert rows[0]["start_tok"] == 0  # every stream starts at offset 0
        for prev, cur in zip(rows, rows[1:]):  # and is gap-free: end+sep==next
            assert cur["start_tok"] == prev["end_tok"] + 1


def test_deterministic_under_repartition(spark):
    df = _docs(spark, list(range(1, 60)))
    a = pack_sequences(df, 32, n_shards=8).orderBy("doc_id").collect()
    b = (
        pack_sequences(df.repartition(13), 32, n_shards=8)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_validation(spark):
    df = _docs(spark, [3])
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, 8, n_shards=0)


def test_plan_one_window_exchange_no_python(spark):
    df = _docs(spark, [5] * 50)
    plan = (
        pack_sequences(df, 64, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one shuffle for the per-shard window; stats add only an aggregate
    assert plan.count("Exchange") <= 2
