"""Data-size scaling sweep for the TEXT front door (VERDICT r4 #5):
the flagship pipeline has a measured size slope (PLANS.md §9); this
gives the same evidence for `clean_corpus` — the full gate stack
(tokens / stopword / repetition / quality + url-dedup + exact content
dedup) over the deterministic synthetic page table at three sizes.

Protocol mirrors bench.py: local[32], warm parquet (materialized once
per size), rep-0 warm-up discarded, best-of-3, one JSON line out.

Run:  python tools/scale_sweep_text.py
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
REGION = (-5.0, 0.0, 5.0, 10.0)
CACHE = "/tmp/verde_spark_bench"  # share the bench.py page cache


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench  # reuse make_spark + pages_parquet (same conf, same cache)

    from verde_spark.pipelines import clean_corpus

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        path = bench.pages_parquet(spark, n)
        pages = spark.read.parquet(path)

        def run() -> int:
            # min_tokens=3: the synthetic page text is 4 whitespace tokens,
            # so the default 5 would zero the corpus and the downstream
            # url/content dedup windows would shuffle nothing — this keeps
            # the en pages flowing through the FULL path
            return clean_corpus(pages, min_tokens=3).count()

        kept = run()  # warm-up rep: parquet cache, python workers, JIT
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            kept = run()
            best = min(best, time.time() - t0)
        rows.append({
            "pages": n,
            "kept": kept,
            "sec": round(best, 3),
            "pages_per_sec": round(n / best, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]
    for r in rows:
        size_ratio = r["pages"] / base["pages"]
        time_ratio = r["sec"] / base["sec"]
        r["time_ratio_vs_smallest"] = round(time_ratio, 2)
        r["size_ratio_vs_smallest"] = round(size_ratio, 2)
    out = {"clean_corpus_sweep": rows}
    print(json.dumps(out))
    # persist for bench.py's BENCH.md template (regenerated every run)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SWEEP_TEXT.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
