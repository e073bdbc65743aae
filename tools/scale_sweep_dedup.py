"""Data-size scaling sweep for the NEAR-DUP path (round 5): the text
front door has a measured size slope (SWEEP_TEXT.json / BENCH.md) and
the flagship has PLANS.md §9 — this gives the same evidence for the
MinHash near-duplicate pipeline (`dedup_minhash`: shingle → minhash →
LSH bands → bucket join → exact Jaccard → connected components →
anti-join), the family the 100 TB claim most needs a slope for: the
pair count must grow with the PLANTED duplicates (linear), never with
any all-pairs term.

Corpus: deterministic synthetic docs of 40 pseudo-words drawn from a
1024-word vocabulary keyed on a TEMPLATE id = floor(doc_id/16)*16.
Within every 16-doc block, doc 1 reuses doc 0's template with ONE word
swapped (38 3-shingles, 3 differ → Jaccard 35/41 ≈ 0.854 ≥ the 0.8
threshold); docs 2..15 get their own templates.  So exactly n/16
near-dup pairs are planted — detection count and edge count scale
linearly by construction, and any super-linear time term would expose
an all-pairs join.  Signature engine = "arrow" (the production
vectorized path; candidates bit-identical to the Catalyst oracle,
pinned in tests/test_dedup.py).

Protocol mirrors bench.py / scale_sweep_text.py: local[32], warm
parquet (materialized once per size), rep-0 warm-up discarded,
best-of-3, one JSON line out, persisted to SWEEP_DEDUP.json for
BENCH.md's template.

Run:  python tools/scale_sweep_dedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(x) for x in os.environ.get(
    "SWEEP_SIZES", "250000,1000000,4000000"
).split(",")]
CACHE = "/tmp/verde_spark_bench"  # share the bench.py cache dir
N_WORDS = 40
VOCAB = 1024
BLOCK = 16


def dup_corpus_parquet(spark, n: int) -> str:
    """Materialize the deterministic near-dup corpus once per size."""
    from pyspark.sql import functions as F

    path = os.path.join(CACHE, f"dupdocs_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        i = F.col("id")
        tid = F.when(i % BLOCK == 1, i - 1).otherwise(i)
        words = F.transform(
            F.sequence(F.lit(1), F.lit(N_WORDS)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(tid, j), F.lit(VOCAB))
            ),
        )
        # doc 1 of each block swaps ONE template-keyed position for a
        # globally unique token -> Jaccard 35/41 vs doc 0
        swap_pos = (F.pmod(F.xxhash64(tid, F.lit(99)), F.lit(N_WORDS - 4)) + 3).cast("int")
        mutated = F.transform(
            F.sequence(F.lit(1), F.lit(N_WORDS)),
            lambda j: F.when(
                (i % BLOCK == 1) & (j == swap_pos),
                F.concat(F.lit("x"), i.cast("string")),
            ).otherwise(
                F.concat(F.lit("w"), F.pmod(F.xxhash64(tid, j), F.lit(VOCAB)))
            ),
        )
        _ = words  # template documented above; mutated covers both arms
        spark.range(0, n, 1, 64).select(
            i.alias("doc_id"),
            F.array_join(mutated, " ").alias("text"),
        ).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    import bench  # reuse make_spark (same conf as the benches)

    from verde_spark.operators.dedup import dedup_minhash

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        path = dup_corpus_parquet(spark, n)
        docs = spark.read.parquet(path)

        def run() -> int:
            return dedup_minhash(
                docs, threshold=0.8, shingle_size=3,
                num_hashes=64, bands=16, engine="arrow",
            ).count()

        kept = run()  # warm-up rep: parquet cache, python workers, JIT
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            kept = run()
            best = min(best, time.time() - t0)
        dropped = n - kept
        rows.append({
            "docs": n,
            "planted_pairs": n // BLOCK,
            "dropped": dropped,
            "sec": round(best, 3),
            "docs_per_sec": round(n / best, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]
    for r in rows:
        r["size_ratio_vs_smallest"] = round(r["docs"] / base["docs"], 2)
        r["time_ratio_vs_smallest"] = round(r["sec"] / base["sec"], 2)
    out = {"dedup_minhash_sweep": rows}
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SWEEP_DEDUP.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
