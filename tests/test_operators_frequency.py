"""heavy_hitters: Misra-Gries candidate generation + exact verify."""

import pytest
from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.operators.frequency import heavy_hitters


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key i appears ~ 3000/i times; plenty of singleton noise
    rows = []
    for i in range(1, 40):
        rows += [Row(k=f"key{i}", g=i % 3) for _ in range(3000 // i)]
    rows += [Row(k=f"noise{j}", g=j % 3) for j in range(2000)]
    return spark.createDataFrame(rows).repartition(16)


def exact(df, keys, min_share=None, min_count=None):
    counted = df.na.drop(subset=keys).groupBy(*keys).count()
    if min_share is not None:
        total = df.na.drop(subset=keys).count()
        counted = counted.where(F.col("count") >= min_share * total)
    else:
        counted = counted.where(F.col("count") >= min_count)
    return {tuple(r)[:-1] + (r["count"],) for r in counted.collect()}


def test_min_share_matches_exact(skewed):
    got = {tuple(r) for r in heavy_hitters(skewed, "k", min_share=0.01).collect()}
    assert got == exact(skewed, ["k"], min_share=0.01)
    assert got  # non-trivial


def test_min_count_matches_exact(skewed):
    got = {tuple(r) for r in heavy_hitters(skewed, "k", min_count=300).collect()}
    assert got == exact(skewed, ["k"], min_count=300)
    assert got


def test_multi_key(skewed):
    got = {
        tuple(r)
        for r in heavy_hitters(skewed, ["k", "g"], min_share=0.02).collect()
    }
    assert got == exact(skewed, ["k", "g"], min_share=0.02)


def test_tiny_k_still_exact_superset_guarantee(skewed):
    # even a minimal legal width k=ceil(2/θ) must never miss a true hitter
    got = {
        tuple(r)
        for r in heavy_hitters(skewed, "k", min_share=0.05, k=40).collect()
    }
    assert got == exact(skewed, ["k"], min_share=0.05)


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [Row(k="a")] * 50 + [Row(k=None)] * 100 + [Row(k="b")] * 10
    )
    got = heavy_hitters(df, "k", min_share=0.5).collect()
    assert [(r.k, r.cnt) for r in got] == [("a", 50)]


def test_argument_validation(skewed):
    with pytest.raises(ValueError):
        heavy_hitters(skewed, "k")
    with pytest.raises(ValueError):
        heavy_hitters(skewed, "k", min_share=0.1, min_count=5)
    with pytest.raises(ValueError):
        heavy_hitters(skewed, "k", min_share=1.5)
    with pytest.raises(ValueError):
        heavy_hitters(skewed, "k", min_share=1e-9)  # k beyond sane bound


def test_verify_join_is_broadcast(skewed):
    plan = heavy_hitters(skewed, "k", min_share=0.01)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
