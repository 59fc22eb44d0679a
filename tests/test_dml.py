"""Row-level DML (sources/dml.py): MERGE (upsert) and DELETE WHERE.

The segment-model contracts under test: only affected time buckets are
rewritten (untouched buckets keep their exact segment dirs), matching is
bucket-scoped on the key columns, emptied buckets tombstone at the same
version+stamp (the whole mutation enters every as_of view atomically),
the mutation composes with time travel / the result cache / restore,
and the loud refusals (schema drift, NULL times, missing keys) fire.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.dml import delete_where, merge_into
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.segments import list_manifests

SPEC = {"granularity": "NONE", "dimensions": ["k"],
        "metrics": [{"name": "v", "type": "double"}]}


@pytest.fixture(params=["local", "objectsim"])
def root(tmp_path, request, spark):
    r = (str(tmp_path / "tbl") if request.param == "local"
         else "objectsim://" + str(tmp_path / "tbl"))
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}", v=float(d * 10 + h))
            for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), r, "t", version="v1",
                     time_column="ts", bucket="DAY")
    return r


def _rows(spark, root, as_of=None):
    df = load(spark, root, SPEC, interval="2024-01-01/2024-02-01",
              data_source="t", as_of=as_of)
    return sorted((r["__time"].isoformat(), r["k"], r["v"])
                  for r in df.collect())


def test_merge_update_insert_and_new_bucket(spark, root):
    before = _rows(spark, root)
    ups = spark.createDataFrame([
        Row(__time=datetime(2024, 1, 1, 1), k="k1", v=999.0),   # replace
        Row(__time=datetime(2024, 1, 1, 9), k="k9", v=111.0),   # insert
        Row(__time=datetime(2024, 1, 4, 1), k="k1", v=444.0),   # new bucket
    ])
    merge_into(spark, root, "t", ups, ["k"])
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 999.0
    assert after[("2024-01-01T09:00:00", "k9")] == 111.0
    assert after[("2024-01-04T01:00:00", "k1")] == 444.0
    # bucket-scoped identity: k1 in OTHER days untouched
    assert after[("2024-01-02T01:00:00", "k1")] == 11.0
    assert after[("2024-01-03T01:00:00", "k1")] == 21.0
    assert len(after) == len(before) + 2  # one replace, two inserts


def test_merge_rewrites_only_affected_buckets(spark, root):
    untouched_before = {
        m.identifier: m.path for m in list_manifests(root, "t")
        if m.interval.start.day in (2, 3)}
    merge_into(spark, root, "t", spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 1, 1), k="k1", v=5.0)]), ["k"])
    ms = list_manifests(root, "t")
    untouched_after = {m.identifier: m.path for m in ms
                       if m.interval.start.day in (2, 3)}
    assert untouched_after == untouched_before  # same dirs, not rewritten
    day1 = [m for m in ms if m.interval.start.day == 1]
    assert len(day1) == 2  # v1 + the merge version


def test_merge_delete_tombstones_emptied_bucket(spark, root):
    # delete every key of day 2: the bucket must tombstone, not linger
    merge_into(spark, root, "t", spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 2, 0), k=f"k{h}") for h in (1, 2, 3)]),
        ["k"], when_matched="delete")
    got = _rows(spark, root)
    assert not any(t.startswith("2024-01-02") for t, _k, _v in got)
    assert len(got) == 6
    assert any(m.tombstone for m in list_manifests(root, "t"))


def test_merge_is_idempotent(spark, root):
    ups = spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 1, 1), k="k1", v=999.0)])
    merge_into(spark, root, "t", ups, ["k"])
    once = _rows(spark, root)
    merge_into(spark, root, "t", ups, ["k"])
    assert _rows(spark, root) == once


def test_merge_composes_with_time_travel(spark, root):
    from druid_hadoop_utils_spark.sources.segments import create_tag

    create_tag(root, "t", "pre-merge")
    before = _rows(spark, root)
    merge_into(spark, root, "t", spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 1, 1), k="k1", v=999.0)]), ["k"])
    assert _rows(spark, root, as_of="tag:pre-merge") == before
    assert _rows(spark, root) != before


def test_merge_refusals(spark, root):
    with pytest.raises(ValueError, match="schema must match"):
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(__time=datetime(2024, 1, 1, 1), k="k1")]), ["k"])
    with pytest.raises(ValueError, match="time column"):
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(k="k1", v=1.0)]), ["k"])
    with pytest.raises(ValueError, match="key column"):
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(__time=datetime(2024, 1, 1, 1), kk="k1", v=1.0)]), ["k"])
    with pytest.raises(ValueError, match="NULL"):
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(__time=None, k="k1", v=1.0)],
            "`__time` timestamp, k string, v double"), ["k"])
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(__time=datetime(2024, 1, 1, 1), k="k1", v=1.0)]), ["k"],
            when_matched="upsert")


def test_delete_where_selector(spark, root):
    res = delete_where(spark, root, "t",
                       {"type": "selector", "dimension": "k", "value": "k2"})
    assert res["announced"]
    got = _rows(spark, root)
    assert not any(k == "k2" for _t, k, _v in got)
    assert len(got) == 6  # 3 days x (k1, k3)


def test_delete_where_bound_and_interval(spark, root):
    # delete v >= 20 but only within day 3 — day 1/2 rows stay whole
    res = delete_where(
        spark, root, "t",
        {"type": "bound", "dimension": "v", "lower": "20",
         "ordering": "numeric"},
        interval="2024-01-03/2024-01-04")
    assert res["announced"]
    got = _rows(spark, root)
    assert not any(t.startswith("2024-01-03") for t, _k, _v in got)
    assert len(got) == 6


def test_delete_where_no_match_is_noop(spark, root):
    ms_before = {m.identifier for m in list_manifests(root, "t")}
    res = delete_where(spark, root, "t",
                       {"type": "selector", "dimension": "k", "value": "zz"})
    assert res == {"announced": [], "deleted_buckets": []}
    assert {m.identifier for m in list_manifests(root, "t")} == ms_before


def test_delete_where_empties_whole_bucket_tombstones(spark, root):
    res = delete_where(
        spark, root, "t",
        {"type": "in", "dimension": "k", "values": ["k1", "k2", "k3"]},
        interval="2024-01-02/2024-01-03")
    assert res["deleted_buckets"] == [
        "2024-01-02T00:00:00+00:00/2024-01-03T00:00:00+00:00"]
    got = _rows(spark, root)
    assert len(got) == 6
    assert not any(t.startswith("2024-01-02") for t, _k, _v in got)


def test_update_where_expression(spark, root):
    from druid_hadoop_utils_spark.sources.dml import update_where

    res = update_where(
        spark, root, "t",
        {"type": "selector", "dimension": "k", "value": "k2"},
        set={"v": "v * 10 + 1"})
    assert res["announced"]
    got = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert got[("2024-01-01T02:00:00", "k2")] == 21.0   # 2*10+1
    assert got[("2024-01-02T02:00:00", "k2")] == 121.0  # 12*10+1
    assert got[("2024-01-01T01:00:00", "k1")] == 1.0    # untouched
    assert len(got) == 9  # rows never appear or vanish


def test_update_where_simultaneous_assignment(spark, tmp_path):
    """SQL UPDATE semantics: SET a=b, b=a swaps via the ORIGINAL row."""
    from druid_hadoop_utils_spark.sources.dml import update_where

    r = str(tmp_path / "swap")
    publish_segments(spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, 1), k="x", a=1.0, b=2.0)]),
        r, "t", version="v1", time_column="ts", bucket="DAY")
    update_where(spark, r, "t",
                 {"type": "selector", "dimension": "k", "value": "x"},
                 set={"a": "b", "b": "a"})
    spec = {"granularity": "NONE", "dimensions": ["k"],
            "metrics": [{"name": "a", "type": "double"},
                        {"name": "b", "type": "double"}]}
    row = load(spark, r, spec, interval="2024-01-01/2024-01-02",
               data_source="t").collect()[0]
    assert (row["a"], row["b"]) == (2.0, 1.0)  # swapped, not doubled


def test_update_where_refusals_and_noop(spark, root):
    import pytest as _pytest

    from druid_hadoop_utils_spark.sources.dml import update_where

    with _pytest.raises(ValueError, match="__time"):
        update_where(spark, root, "t",
                     {"type": "selector", "dimension": "k", "value": "k1"},
                     set={"__time": "current_timestamp()"})
    with _pytest.raises(ValueError, match="unknown column"):
        update_where(spark, root, "t",
                     {"type": "selector", "dimension": "k", "value": "k1"},
                     set={"zz": "1"})
    ms_before = {m.identifier for m in list_manifests(root, "t")}
    res = update_where(spark, root, "t",
                       {"type": "selector", "dimension": "k", "value": "zz"},
                       set={"v": "0"})
    assert res == {"announced": [], "updated_buckets": []}
    assert {m.identifier for m in list_manifests(root, "t")} == ms_before


def test_update_where_only_affected_buckets_rewrite(spark, root):
    from druid_hadoop_utils_spark.sources.dml import update_where

    before = {m.identifier: m.path for m in list_manifests(root, "t")
              if m.interval.start.day != 2}
    update_where(
        spark, root, "t",
        {"type": "bound", "dimension": "v", "lower": "11", "upper": "13",
         "ordering": "numeric"},  # matches only day-2 rows (11,12,13)
        set={"v": "v + 1000"})
    after = {m.identifier: m.path for m in list_manifests(root, "t")
             if m.interval.start.day != 2}
    assert after == before  # days 1 and 3 untouched
    got = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert got[("2024-01-02T01:00:00", "k1")] == 1011.0
    assert got[("2024-01-03T01:00:00", "k1")] == 21.0


def test_delete_where_invalidates_result_cache(spark, root):
    """DML is a stamped announce like every publish: the timeline version
    changes, so a cached result built before the delete must refill, not
    serve deleted rows."""
    from druid_hadoop_utils_spark.sources.cache import cached_druid_query
    from druid_hadoop_utils_spark.sources.segments import timeline_version

    q = {"queryType": "groupBy", "dataSource": "t",
         "granularity": "ALL", "dimensions": ["k"],
         "aggregations": [{"type": "doubleSum", "name": "s",
                           "fieldName": "v"}],
         "intervals": "2024-01-01/2024-02-01"}
    v1 = timeline_version(root, "t")
    first = cached_druid_query(spark, root, "t", q)
    assert "k2" in {r["k"] for r in first.collect()}
    delete_where(spark, root, "t",
                 {"type": "selector", "dimension": "k", "value": "k2"})
    assert timeline_version(root, "t") != v1  # structural invalidation
    second = cached_druid_query(spark, root, "t", q)
    rows = {r["k"]: r["s"] for r in second.collect()}
    assert "k2" not in rows
