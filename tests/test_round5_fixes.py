"""Regression tests for the round-4 ADVICE.md findings.

Each test pins one fix:
 1. write_segment manifest stats come from the parquet actually written,
    not a re-execution of a possibly non-deterministic input pipeline.
 2. interval-typed columns are skipped by stats/bloom dtype gating (an
    'int' PREFIX match would treat 'interval day to second' as numeric
    and crash json.dumps with a timedelta).
 3. bloom_excludes with a truncated/corrupt bits payload conservatively
    scans instead of raising IndexError at plan time.
 4. union dataSource members get manifest stats segment pruning (the
    query's DimFilter reaches _scan_segments per member).
 5. streaming_funnel drops NaT timestamps instead of letting the int64
    sentinel distort chain start / horizon math.
"""
import datetime

import pytest
from pyspark.sql import functions as F


def test_write_segment_stats_reflect_persisted_rows_not_reexecution(
    spark, tmp_path
):
    """A non-deterministic pipeline (row-at-a-time random UDF — test-only)
    must record stats matching the rows that landed on disk, which only a
    staged re-read guarantees."""
    from druid_hadoop_utils_spark.sources.segments import (
        list_manifests,
        write_segment,
    )

    import random

    @F.udf("int")
    def noise():
        return random.randint(0, 10_000_000)

    df = spark.range(200).select(
        F.lit(datetime.datetime(2024, 1, 1, 12)).alias("__time"),
        noise().alias("v"),
    )
    root = str(tmp_path / "nondet_root")
    m = write_segment(df, root, "nd", "2024-01-01/2024-01-02", "v1",
                      stats_columns=["v"])
    persisted = spark.read.parquet(m.path).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    stats = list_manifests(root, "nd")[0].stats
    assert stats["v"] == {"min": persisted.lo, "max": persisted.hi}


def test_interval_dtype_skipped_by_stats_and_bloom(spark, tmp_path):
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.segments import (
        column_stats,
        list_manifests,
    )

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), "a", 1)], ["ts", "d", "n"]
    ).withColumn("iv", F.expr("INTERVAL '3' DAY")) \
     .withColumn("dts", F.expr("make_dt_interval(0, 1, 0, 0.0)"))
    dtypes = dict(df.dtypes)
    assert dtypes["iv"].startswith("interval")
    assert dtypes["dts"].startswith("interval")

    # column_stats skips both interval flavors, keeps the real columns
    st = column_stats(df, ["iv", "dts", "n", "d"])
    assert set(st) == {"n", "d"}

    # publish path: stats/bloom request on interval columns must neither
    # crash the manifest json.dumps nor record interval stats
    root = str(tmp_path / "iv_root")
    publish_segments(df, root, "x", version="v1", time_column="ts",
                     bucket="DAY", stats_columns=["iv", "dts", "n"],
                     bloom_columns=["iv", "dts", "d"])
    m = list_manifests(root, "x")[0]
    # blooms live inside stats[col]["bloom"]; interval columns appear in
    # neither family
    assert set(m.stats or {}) <= {"n", "d"}
    assert "iv" not in (m.stats or {}) and "dts" not in (m.stats or {})
    assert "bloom" in (m.stats or {}).get("d", {})


def test_bloom_excludes_truncated_bits_scans_conservatively():
    import base64

    from druid_hadoop_utils_spark.plans.pruning import bloom_excludes

    # m=8192 bits claims 1 KiB; hand it 4 bytes — must return False
    # (scan), not IndexError
    bl = {"m": 8192, "k": 4, "t": "str",
          "bits": base64.b64encode(b"\x00\x00\x00\x00").decode()}
    assert bloom_excludes(bl, ["anything"]) is False


class TestUnionMemberPruning:
    def _root(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import publish_segments

        root = str(tmp_path / "union_prune_root")
        a = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, h), "click", float(h))
             for h in range(3)],
            ["ts", "event_type", "value"])
        b = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, h), "view", 10.0 + h)
             for h in range(2)],
            ["ts", "event_type", "value"])
        publish_segments(a, root, "a", version="v1", time_column="ts",
                         bucket="DAY", stats_columns=["event_type"])
        publish_segments(b, root, "b", version="v1", time_column="ts",
                         bucket="DAY", stats_columns=["event_type"])
        return root

    def _q(self, filt):
        return {
            "queryType": "groupBy",
            "dataSource": {"type": "union", "dataSources": ["a", "b"]},
            "granularity": "ALL",
            "dimensions": ["event_type"],
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": ["2024-01-01/2024-01-02"],
            "filter": filt,
        }

    def test_one_member_stats_pruned_result_correct(self, spark, tmp_path):
        from druid_hadoop_utils_spark.api import druid_query

        root = self._root(spark, tmp_path)
        out = druid_query(spark, root, self._q(
            {"type": "selector", "dimension": "event_type",
             "value": "click"})).collect()
        assert {(r["event_type"], r["n"]) for r in out} == {("click", 3)}

    def test_all_members_pruned_returns_shaped_empty(self, spark, tmp_path):
        from druid_hadoop_utils_spark.api import druid_query

        root = self._root(spark, tmp_path)
        out = druid_query(spark, root, self._q(
            {"type": "selector", "dimension": "event_type",
             "value": "nosuch"}))
        assert out.count() == 0
        assert set(out.columns) == {"__time", "event_type", "n"}

    def test_member_scans_actually_pruned(self, spark, tmp_path, monkeypatch):
        """The filter must REACH the per-member scan: with a
        click-selector, member 'b' (stats: view..view) is excluded at
        plan time — its parquet is never listed."""
        import druid_hadoop_utils_spark.plans.planner as planner_mod

        root = self._root(spark, tmp_path)
        seen = []
        real = planner_mod._scan_segments

        def spy(spark_, table_root, data_source, iv, dim_filter=None,
                **kw):
            seen.append((data_source, dim_filter is not None))
            return real(spark_, table_root, data_source, iv,
                        dim_filter=dim_filter, **kw)

        monkeypatch.setattr(planner_mod, "_scan_segments", spy)
        from druid_hadoop_utils_spark.api import druid_query

        druid_query(spark, root, self._q(
            {"type": "selector", "dimension": "event_type",
             "value": "click"})).collect()
        union_calls = [s for s in seen if s[0] in ("a", "b")]
        assert union_calls and all(f for _, f in union_calls)


def test_streaming_funnel_ignores_nat_timestamps(spark, tmp_path):
    """A NaT ts row must not pin chain start to the int64 NaT sentinel.
    With the bug, the NaT 'view' (−2^63 us) becomes t1 and the click at
    10:00 then sits outside any horizon anchored on it."""
    import pandas as pd

    from druid_hadoop_utils_spark.streaming.stateful import streaming_funnel

    pdf = pd.DataFrame({
        "user_id": ["u1", "u1", "u1"],
        "event_type": ["view", "view", "click"],
        "ts": [pd.NaT,
               pd.Timestamp("2024-01-01 09:59:30"),
               pd.Timestamp("2024-01-01 10:00:00")],
    })
    src = str(tmp_path / "nat_src")
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.parquet(src + "/c0")

    out = streaming_funnel(
        spark.readStream.schema(sdf.schema).parquet(src + "/*"),
        ["view", "click"], within_seconds=60,
    )
    q = (out.writeStream.format("memory").queryName("nat_funnel")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_nat"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM nat_funnel ORDER BY steps_completed DESC").collect()
    assert rows, "funnel emitted nothing"
    best = rows[0]
    # valid chain: view@09:59:30 -> click@10:00:00 inside the 60 s horizon
    assert best.steps_completed == 2
    t1 = datetime.datetime.utcfromtimestamp(best.step_times_us[0] / 1e6)
    assert t1 == datetime.datetime(2024, 1, 1, 9, 59, 30)
