"""Deterministic hash sampling/splitting: stability, disjointness,
stratified fractions."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import sampling as S


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(2000).select(F.col("id").alias("doc_id"))


def test_sample_fraction_and_determinism(ids):
    a = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in S.hash_sample(ids.repartition(13), "doc_id", 0.3).collect()}
    assert a == b  # layout-independent and rerun-stable
    assert len(a) == pytest.approx(600, rel=0.15)
    # different seed → different (but still deterministic) sample
    c = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.3, seed="other").collect()}
    assert c != a


def test_sample_is_nested(ids):
    """A smaller fraction under the same seed is a SUBSET of a larger one
    (threshold semantics) — lets pipelines grow samples incrementally."""
    small = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.4).collect()}
    assert small <= big


def test_split_disjoint_and_complete(ids):
    out = S.hash_split(ids, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 2000  # fractions sum to 1 → nothing dropped
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert set(by_split) == {"train", "valid", "test"}
    assert len(by_split["train"]) == pytest.approx(1600, rel=0.1)
    # disjoint
    assert not (by_split["train"] & by_split["valid"])
    assert not (by_split["train"] & by_split["test"])


def test_stratified_fractions(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = S.stratified_hash_sample(df, "doc_id", "lang",
                                   {"en": 0.5, "de": 0.1})
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == pytest.approx(500, rel=0.2)
    assert counts["de"] == pytest.approx(100, rel=0.35)
    # unknown strata use default_fraction (0.0 → dropped)
    out2 = S.stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5})
    assert out2.where(F.col("lang") == "de").count() == 0


def test_overcommitted_split_rejected(ids):
    with pytest.raises(ValueError):
        S.hash_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_weighted_sample_matches_python_recomputation(spark):
    """The selected set equals a python replay of the same E-S keys."""
    import hashlib
    import math

    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    rows = [(i, "g%d" % (i % 2), float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")

    def bucket(v):
        h = int(hashlib.md5(f"{v}s0".encode()).hexdigest()[:15], 16)
        return h % 1_000_000

    def key(i, w):
        return math.log((bucket(i) + 0.5) / 1_000_000) / w

    want = set()
    for g in ("g0", "g1"):
        grp = [(key(i, w), i) for (i, gg, w) in rows if gg == g]
        grp.sort(key=lambda t: (-t[0], t[1]))
        want |= {i for _, i in grp[:7]}
    got = {r.id for r in weighted_hash_sample(df, "id", "w", 7, ["g"]).collect()}
    assert got == want


def test_weighted_sample_layout_independent_and_biased(spark):
    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = {r.id for r in weighted_hash_sample(df, "id", "w", 25).collect()}
    b = {r.id for r in
         weighted_hash_sample(df.repartition(13), "id", "w", 25).collect()}
    assert a == b and len(a) == 25
    # the 1% of rows carrying 1000x weight should dominate the sample
    assert len([i for i in a if i < 20]) >= 15


def test_weighted_sample_global_no_window_single_partition(spark):
    """The global path must compile to TakeOrderedAndProject, not a
    one-partition window sort."""
    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    df = spark.range(10_000).selectExpr("id", "cast(1 + id % 9 as double) AS w")
    out = weighted_hash_sample(df, "id", "w", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # zero-and-negative weights never qualify
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], "id long, w double")
    assert [r.id for r in weighted_hash_sample(df2, "id", "w", 5).collect()] == [3]
