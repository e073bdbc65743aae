"""Round-3 dogfood: a realistic user workflow with NON-default column
names end-to-end, touching the round-3 API additions (BaseGridder.filter,
row-wise default CV, Vector.score, dedup_winnow, winnow_pairs).

Run: python tools/dogfood_r3.py — prints PASS/FAIL lines; exits nonzero on
any failure. Not part of the pytest suite (it deliberately re-walks the
README migration path like a new user would).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

failures = []


def check(name, fn):
    try:
        fn()
        print(f"PASS {name}")
    except Exception as exc:  # noqa: BLE001
        failures.append(name)
        print(f"FAIL {name}: {exc!r}")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import verde_spark as vd

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- README switching example, custom names throughout ----------------
    pdf = vd.datasets.fetch_texas_wind()
    df = spark.createDataFrame(pdf)

    def readme_chain():
        train, test = vd.train_test_split(
            df, spacing=2.0, easting="longitude", northing="latitude"
        )
        chain = vd.Chain([
            ("mean", vd.BlockReduce("mean", spacing=0.5)),
            ("spline", vd.Spline()),
        ])
        chain.fit(
            train,
            easting="longitude",
            northing="latitude",
            data_col="air_temperature_c",
        )
        grid = chain.grid(spark, spacing=0.5)
        assert grid.count() > 0
        s = chain.score(
            test,
            easting="longitude",
            northing="latitude",
            data_col="air_temperature_c",
        )
        assert -5 < s <= 1.0, s

    check("readme_chain_custom_columns", readme_chain)

    # --- new r3: inherited filter() on a custom-name frame -----------------
    def filter_custom_names():
        resid = vd.Trend(degree=1).filter(
            df,
            data_col="air_temperature_c",
            easting="longitude",
            northing="latitude",
        )
        assert set(resid.columns) == set(df.columns)
        m = resid.agg(F.avg("air_temperature_c")).first()[0]
        assert abs(m) < 1.0, m  # detrended mean ~0

    check("basegridder_filter_custom_columns", filter_custom_names)

    # --- new r3: row-wise default cross_val_score with custom names --------
    def default_cv():
        scores = vd.cross_val_score(
            vd.Trend(degree=1),
            df,
            data_col="air_temperature_c",
            easting="longitude",
            northing="latitude",
        )
        assert len(scores) == 5 and all(-5 < s <= 1 for s in scores), scores

    check("cross_val_score_default_rowwise_kfold", default_cv)

    # --- Vector with custom component names --------------------------------
    def vector_score():
        vec = vd.Vector([vd.Trend(degree=1), vd.Trend(degree=1)])
        vec.fit(
            df,
            data_cols=("wind_speed_east_knots", "wind_speed_north_knots"),
            easting="longitude",
            northing="latitude",
        )
        s = vec.score(
            df,
            data_cols=("wind_speed_east_knots", "wind_speed_north_knots"),
            easting="longitude",
            northing="latitude",
        )
        assert -5 < s <= 1.0, s

    check("vector_score_custom_columns", vector_score)

    # --- winnow dedup with custom id/text names -----------------------------
    def winnow_custom_names():
        from verde_spark.operators.dedup import dedup_winnow, winnow_pairs

        core = "an original paragraph about spatial interpolation on spark"
        filler = " ".join(f"pad{i} fill{i}" for i in range(30))
        docs = spark.createDataFrame(
            pd.DataFrame({
                "pid": [10, 11, 12],
                "body": [core, f"{filler} {core}", "entirely different content z4"],
            })
        )
        pairs = winnow_pairs(docs, id_col="pid", text_col="body", min_shared=2)
        got = {(r["id_a"], r["id_b"]): r["containment"] for r in pairs.collect()}
        assert got[(10, 11)] == 1.0, got
        kept = dedup_winnow(docs, id_col="pid", text_col="body").toPandas()
        assert sorted(kept["pid"]) == [10, 12], kept

    check("winnow_custom_columns", winnow_custom_names)

    # --- ScipyGridder + filter chain step interop ---------------------------
    def scipy_chain_step():
        chain = vd.Chain([
            ("trend", vd.Trend(degree=1)),
            ("nearest", vd.ScipyGridder("nearest")),
        ])
        chain.fit(
            df,
            easting="longitude",
            northing="latitude",
            data_col="air_temperature_c",
        )
        g = chain.grid(spark, spacing=1.0)
        assert g.count() > 0

    check("chain_trend_then_scipygridder", scipy_chain_step)

    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
