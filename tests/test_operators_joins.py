import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.joins import salted_join
from druid_hadoop_utils_spark.sources.tables import load_table


def canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_inner(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = orders.join(customer, "custkey")
    salted = salted_join(orders, customer, "custkey", salts=4)
    cols = ["custkey", "o_orderkey", "c_name"]
    assert canon(salted, cols) == canon(plain, cols)


def test_salted_join_left_preserves_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, a="x"), Row(k=2, a="y"), Row(k=99, a="z")])
    right = spark.createDataFrame([Row(k=1, b="p"), Row(k=2, b="q")])
    out = salted_join(left, right, "k", how="left", salts=3)
    rows = {r.k: r.b for r in out.collect()}
    assert rows == {1: "p", 2: "q", 99: None}


def test_salted_join_skewed_key_correct(spark):
    # a pathological hot key: 10k copies of k=1 against a 3-row dim
    left = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    left = left.union(spark.range(5).select(F.lit(2).alias("k"), F.col("id")))
    right = spark.createDataFrame([Row(k=1, v="hot"), Row(k=2, v="cold"), Row(k=3, v="none")])
    out = salted_join(left, right, "k", salts=8)
    got = out.groupBy("k", "v").count().collect()
    res = {(r.k, r.v): r["count"] for r in got}
    assert res == {(1, "hot"): 10000, (2, "cold"): 5}


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_asof_join_semantics(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import asof_join

    t = lambda m: datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([
        Row(k=1, ts=t(1)), Row(k=1, ts=t(5)), Row(k=1, ts=t(10)),
        Row(k=2, ts=t(3)),
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=t(0), v=10.0), Row(k=1, ts=t(5), v=50.0),
        Row(k=2, ts=t(9), v=90.0),
    ])
    out = asof_join(left, right, on="ts", keys=["k"], right_cols=["v"])
    got = {(r.k, r.ts.minute): r.v for r in out.collect()}
    assert got == {
        (1, 1): 10.0,   # latest right at or before :01 is :00
        (1, 5): 50.0,   # equal timestamp: the right row at :05 wins (<=)
        (1, 10): 50.0,  # carried forward
        (2, 3): None,   # no right row yet for k=2
    }
    assert out.count() == 4  # left rows preserved exactly


def test_asof_join_null_right_values_survive(spark):
    """A stored null in the most recent right row must come through as null
    (not an older row's value), and all output columns must come from the
    SAME right row — DuckDB ASOF JOIN semantics (the module's oracle)."""
    from datetime import datetime

    import duckdb

    from druid_hadoop_utils_spark.operators.joins import asof_join

    t = lambda m: datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [Row(k=1, ts=t(1)), Row(k=1, ts=t(6)), Row(k=1, ts=t(11))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=t(0), a=10.0, b="x"),
         Row(k=1, ts=t(5), a=None, b="y"),   # stored null must survive
         Row(k=1, ts=t(10), a=30.0, b=None)],
        "k int, ts timestamp, a double, b string",
    )
    out = asof_join(left, right, on="ts", keys=["k"], right_cols=["a", "b"])
    got = {r.ts.minute: (r.a, r.b) for r in out.collect()}
    # :06 → right row :05 → (None, 'y'); column a must NOT leak 10.0 from :00
    assert got == {1: (10.0, "x"), 6: (None, "y"), 11: (30.0, None)}

    con = duckdb.connect()
    con.execute("CREATE TABLE l AS SELECT * FROM (VALUES "
                "(1, TIMESTAMP '2024-01-01 00:01:00'),"
                "(1, TIMESTAMP '2024-01-01 00:06:00'),"
                "(1, TIMESTAMP '2024-01-01 00:11:00')) t(k, ts)")
    con.execute("CREATE TABLE r AS SELECT * FROM (VALUES "
                "(1, TIMESTAMP '2024-01-01 00:00:00', 10.0, 'x'),"
                "(1, TIMESTAMP '2024-01-01 00:05:00', NULL, 'y'),"
                "(1, TIMESTAMP '2024-01-01 00:10:00', 30.0, NULL)) t(k, ts, a, b)")
    oracle = con.execute(
        "SELECT l.ts, r.a, r.b FROM l ASOF JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.ts"
    ).fetchall()
    assert {ts.minute: (a, b) for ts, a, b in oracle} == got


def test_asof_join_collision_requires_suffix(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import asof_join

    left = spark.createDataFrame([Row(k=1, ts=datetime(2024, 1, 1), v=1.0)])
    right = spark.createDataFrame([Row(k=1, ts=datetime(2024, 1, 1), v=2.0)])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, on="ts", keys=["k"], right_cols=["v"])
    out = asof_join(left, right, on="ts", keys=["k"], right_cols=["v"],
                    suffix="_r")
    r = out.first()
    assert r.v == 1.0 and r.v_r == 2.0


def test_range_join_point_in_interval(spark):
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [Row(k=1, p=5.0), Row(k=1, p=15.0), Row(k=1, p=25.0), Row(k=2, p=5.0)]
    )
    right = spark.createDataFrame([
        Row(k=1, lo=0.0, hi=10.0, tag="a"),     # covers p=5
        Row(k=1, lo=4.0, hi=30.0, tag="b"),     # covers 5, 15, 25
        Row(k=1, lo=15.0, hi=16.0, tag="c"),    # covers 15 (lo inclusive)
        Row(k=1, lo=20.0, hi=25.0, tag="d"),    # 25 excluded (hi exclusive)
        Row(k=2, lo=0.0, hi=10.0, tag="e"),
    ])
    out = range_join(left, right, "p", "lo", "hi", keys=["k"], bin_width=10.0)
    got = sorted((r.k, r.p, r.tag) for r in out.collect())
    assert got == [(1, 5.0, "a"), (1, 5.0, "b"), (1, 15.0, "b"),
                   (1, 15.0, "c"), (1, 25.0, "b"), (2, 5.0, "e")]


def test_range_join_left_keeps_unmatched(spark):
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import range_join

    left = spark.createDataFrame([Row(k=1, p=5.0), Row(k=1, p=99.0)])
    right = spark.createDataFrame([Row(k=1, lo=0.0, hi=10.0, tag="a")])
    out = range_join(left, right, "p", "lo", "hi", keys=["k"],
                     bin_width=10.0, how="left")
    got = {r.p: r.tag for r in out.collect()}
    assert got == {5.0: "a", 99.0: None}


def test_range_join_left_keeps_range_misses_sharing_a_bin(spark):
    """A left row whose bin-mates all FAIL the exact range check must still
    survive a left join with null right columns."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import range_join

    left = spark.createDataFrame([Row(k=1, p=9.0)])
    right = spark.createDataFrame([Row(k=1, lo=0.0, hi=5.0, tag="a")])  # same bin
    out = range_join(left, right, "p", "lo", "hi", keys=["k"],
                     bin_width=10.0, how="left")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].tag is None


def test_range_join_left_does_not_persist(spark):
    """The left path must not pin the probe side in memory: no
    InMemoryRelation in the plan (the anti-join derives unmatched rows
    instead), and duplicate left rows behave like a plain left join."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import range_join

    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    left = spark.createDataFrame(
        [Row(k=1, p=5.0), Row(k=1, p=5.0), Row(k=1, p=99.0), Row(k=1, p=99.0)]
    )
    right = spark.createDataFrame([Row(k=1, lo=0.0, hi=10.0, tag="a")])
    out = range_join(left, right, "p", "lo", "hi", keys=["k"],
                     bin_width=10.0, how="left")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    got = sorted((r.p, r.tag) for r in out.collect())
    assert got == [(5.0, "a"), (5.0, "a"), (99.0, None), (99.0, None)]
    # nothing newly cached behind the caller's back
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == cached_before


def test_interval_overlap_join_matches_naive(spark):
    """Binned overlap join == naive non-equi overlap join, exactly once per
    pair — including pairs whose intersection spans many bins."""
    import random

    from druid_hadoop_utils_spark.operators.joins import interval_overlap_join

    rng = random.Random(7)
    lrows = [(rng.randrange(3), i, rng.uniform(0, 100)) for i in range(60)]
    rrows = [(rng.randrange(3), i, rng.uniform(0, 100)) for i in range(60)]
    left = spark.createDataFrame(
        [(k, i, lo, lo + rng.uniform(0.1, 40)) for (k, i, lo) in lrows],
        "k int, lid int, llo double, lhi double",
    )
    right = spark.createDataFrame(
        [(k, i, lo, lo + rng.uniform(0.1, 40)) for (k, i, lo) in rrows],
        "k int, rid int, rlo double, rhi double",
    )
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", keys=["k"], bin_width=5.0
    )
    got = sorted((r.k, r.lid, r.rid) for r in out.collect())
    naive = left.join(
        right.withColumnRenamed("k", "rk"),
        (left.k == F.col("rk")) & (left.llo < F.col("rhi")) & (F.col("rlo") < left.lhi),
    )
    want = sorted((r.k, r.lid, r.rid) for r in naive.collect())
    assert got == want and len(got) == len(set(got))


def test_interval_overlap_join_half_open_edges(spark):
    """[a,b) × [b,c) do NOT overlap; identical intervals do; empty
    intervals never match."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([
        Row(k=1, lid=0, llo=0.0, lhi=10.0),
        Row(k=1, lid=1, llo=10.0, lhi=20.0),
        Row(k=1, lid=2, llo=5.0, lhi=5.0),    # empty
    ])
    right = spark.createDataFrame([
        Row(k=1, rid=0, rlo=10.0, rhi=30.0),
        Row(k=1, rid=1, rlo=0.0, rhi=10.0),
        Row(k=2, rid=2, rlo=0.0, rhi=100.0),  # other key group
    ])
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", keys=["k"], bin_width=8.0
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    assert got == [(0, 1), (1, 0)]


def test_interval_overlap_join_no_shuffle_dedup_in_plan(spark):
    """The exactly-once guarantee must come from the first-bin predicate,
    not a distinct/dedup aggregate over the joined output."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([Row(k=1, lid=0, llo=0.0, lhi=50.0)])
    right = spark.createDataFrame([Row(k=1, rid=0, rlo=1.0, rhi=49.0)])
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", keys=["k"], bin_width=5.0
    )
    assert out.count() == 1  # 10 shared bins, one output row
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan and "Distinct" not in plan
