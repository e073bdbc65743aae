"""Data-size scaling sweep for the ANN path (round 5): completes the
trilogy (SWEEP_TEXT = text front door, SWEEP_DEDUP = near-dup family)
with the similarity-search claim — brute-force `cosine_topk` scans
everything, IVF (`build_ivf_index` + `ivf_topk`) reads only the probed
clusters, so the speedup must GROW with corpus size while recall holds.

Corpus: deterministic clustered embeddings — 64 theme centers (unit-box
uniforms keyed on the theme id), each vector = its theme center + a
0.25-radius uniform perturbation, 32 dims, `array<float>`.  Queries = a
SELECTIVE batch of 8 perturbed theme centers (ANN serving is
low-latency small batches; a batch probing every cell reduces IVF to a
full scan and brute force wins on FLOPs — that regime is brute's by
design).  The index uses 256 cells (subdividing the 64 themes, the
~sqrt-n regime), so 8 queries x n_probe=8 probe <= 64/256 = 25% of the
partitions — the layout prunes the other 75% statically.
Centroids train ONCE on the smallest corpus (bounded 20k driver-side
sample — the index-build contract) and are reused at every size, so the
sweep isolates the PROBE path.  The IVF layout is materialized per size
with `build_ivf_index` (parquet partitioned by cluster — the inverted
file) and probes run `assigned=True, engine="arrow"` (the production
probe engine — pinned identical to the Catalyst oracle path in
tests/test_webscale.py) against that layout, i.e. exactly
what a deployment does.

recall@10 compares IVF's neighbor-id set to the exact brute-force
top-10 per query (ties broken identically by (cosine DESC, id ASC) in
both paths).

Protocol mirrors the other sweeps: local[32], warm parquet, rep-0
warm-up discarded, best-of-3, one JSON line, persisted to
SWEEP_ANN.json for BENCH.md's template.

Run:  python tools/scale_sweep_ann.py
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
CACHE = "/tmp/verde_spark_bench"
DIM = 32
THEMES = 64          # natural data clusters
N_CENTROIDS = 256    # IVF cells (subdivide themes; ~sqrt-n regime)
N_QUERIES = 8        # SELECTIVE probe batch: 8 x n_probe <= 64 of 256
K = 10               # cells probed -> <=25% of partitions read
N_PROBE = 8


def _unit(key, j):
    from pyspark.sql import functions as F

    return (F.xxhash64(key, j).cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def vec_parquet(spark, n: int) -> str:
    from pyspark.sql import functions as F

    path = os.path.join(CACHE, f"annvecs_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        i = F.col("id")
        theme = (i % THEMES).cast("long")
        emb = F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (
                _unit(theme * 1000, j) + F.lit(0.25) * _unit(i, j)
            ).cast("float"),
        )
        spark.range(0, n, 1, 64).select(
            i.alias("vec_id"), emb.alias("embedding")
        ).write.mode("overwrite").parquet(path)
    return path


def query_df(spark):
    from pyspark.sql import functions as F

    q = F.col("id")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            _unit(q * 1000, j) + F.lit(0.25) * _unit(q + 777_000, j)
        ).cast("float"),
    )
    return spark.range(N_QUERIES).select(q.alias("query_id"), emb.alias("embedding"))


def main() -> int:
    import bench  # reuse make_spark (same conf as the benches)

    from verde_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = query_df(spark).cache()
    queries.count()

    # index-build contract: centroids from a bounded sample, ONCE
    smallest = spark.read.parquet(vec_parquet(spark, SIZES[0]))
    C = train_ivf_centroids(
        smallest, n_centroids=N_CENTROIDS, sample_size=40_000, seed=17
    )

    rows = []
    for n in SIZES:
        corpus = spark.read.parquet(vec_parquet(spark, n))
        ivf_path = os.path.join(CACHE, f"annivf{N_CENTROIDS}_{n}")
        if not os.path.exists(os.path.join(ivf_path, "_SUCCESS")):
            build_ivf_index(corpus, ivf_path, C)
        assigned = spark.read.parquet(ivf_path)

        def brute():
            return cosine_topk(corpus, queries, k=K).count()

        def probe():
            return ivf_topk(
                assigned, queries, k=K, centroids=C,
                n_probe=N_PROBE, assigned=True, engine="arrow",
            ).count()

        brute(); probe()  # warm-up reps discarded
        b_best = p_best = float("inf")
        for _ in range(3):
            t0 = time.time(); brute(); b_best = min(b_best, time.time() - t0)
            t0 = time.time(); probe(); p_best = min(p_best, time.time() - t0)

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(corpus, queries, k=K).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                assigned, queries, k=K, centroids=C,
                n_probe=N_PROBE, assigned=True, engine="arrow",
            ).collect()
        }
        recall = len(exact & got) / len(exact)
        rows.append({
            "docs": n,
            "brute_sec": round(b_best, 3),
            "ivf_sec": round(p_best, 3),
            "ivf_speedup": round(b_best / p_best, 2),
            "recall_at_10": round(recall, 4),
            "ivf_docs_per_sec": round(n / p_best, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]
    for r in rows:
        r["size_ratio_vs_smallest"] = round(r["docs"] / base["docs"], 2)
        r["ivf_time_ratio_vs_smallest"] = round(r["ivf_sec"] / base["ivf_sec"], 2)
    out = {"ann_sweep": rows, "dim": DIM, "n_queries": N_QUERIES,
           "n_centroids": N_CENTROIDS, "n_probe": N_PROBE, "k": K}
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SWEEP_ANN.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
