"""Skew salting: two-level aggregates agree with the direct forms."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verde_spark.operators.salting import salted_mean, salted_median, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.RandomState(7)
    # key 0 is hot (10k rows), keys 1..20 cold (~50 rows each)
    keys = np.concatenate([np.zeros(10_000, dtype=int), rng.randint(1, 21, 1000)])
    vals = rng.normal(loc=keys * 10.0, scale=1.0)
    return spark.createDataFrame(pd.DataFrame({"key": keys, "value": vals})).cache()


def test_salted_mean_matches_plain(spark, skewed):
    plain = {
        r["key"]: r["m"]
        for r in skewed.groupBy("key").agg(F.avg("value").alias("m")).collect()
    }
    salted = {r["key"]: r["mean"] for r in salted_mean(skewed, "key", "value").collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k] == pytest.approx(salted[k], rel=1e-12)


def test_salted_median_matches_plain(spark, skewed):
    plain = {
        r["key"]: r["m"]
        for r in skewed.groupBy("key").agg(F.median("value").alias("m")).collect()
    }
    # hot_threshold 5000: key 0 takes the salted path, the rest the exact path
    salted = {
        r["key"]: r["median"]
        for r in salted_median(skewed, "key", "value", hot_threshold=5000).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k] == pytest.approx(salted[k], rel=1e-12)


def test_with_salt_spreads(spark, skewed):
    dist = (
        with_salt(skewed.filter(F.col("key") == 0), n_salts=8)
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # hot key spread over all salts
    counts = [r["count"] for r in dist]
    assert max(counts) < 3 * min(counts)


def test_salted_median_all_null_hot_key_returns_null(spark):
    """A hot key whose values are all NULL returns NULL like the cold
    F.median path — not an element_at(·, 0) crash (review r5)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"key": [1] * 50 + [2] * 3, "value": [None] * 50 + [1.0, 2.0, 3.0]}
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["key"]: r["median"]
        for r in salted_median(df, "key", "value", hot_threshold=10).collect()
    }
    assert got[1] is None and got[2] == 2.0
