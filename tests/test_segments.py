"""Versioned-timeline overshadow semantics (reference:
DruidInputFormat.java:98-110) — including the partial-overshadow and
multi-segment paths the reference never tests (SURVEY.md §5)."""

from datetime import datetime

import pytest

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    resolve_visible_windows,
)


def seg(interval, version, shard=0, path=None):
    return SegmentManifest(
        data_source="ds",
        interval=Interval.parse(interval),
        version=version,
        shard_num=shard,
        path=path or f"/tmp/{interval.replace('/', '_')}_{version}_{shard}",
    )


QUERY = Interval.parse("2014-10-20/2014-10-30")


def visible_ids(manifests, query=QUERY):
    return {
        (w.manifest.interval.iso(), w.manifest.version, w.manifest.shard_num): w.windows
        for w in resolve_visible_windows(manifests, query)
    }


def test_single_segment_fully_visible():
    s = seg("2014-10-22/2014-10-23", "v1")
    out = resolve_visible_windows([s], QUERY)
    assert len(out) == 1
    assert out[0].is_fully_visible(QUERY)


def test_same_interval_newer_version_wins():
    old = seg("2014-10-22/2014-10-23", "v1")
    new = seg("2014-10-22/2014-10-23", "v2")
    out = resolve_visible_windows([old, new], QUERY)
    assert len(out) == 1
    assert out[0].manifest is new


def test_version_compare_is_lexicographic():
    # Druid versions are ISO timestamps compared as strings
    a = seg("2014-10-22/2014-10-23", "2014-10-22T10:00:00.000Z")
    b = seg("2014-10-22/2014-10-23", "2014-10-22T09:00:00.000Z")
    out = resolve_visible_windows([a, b], QUERY)
    assert [w.manifest.version for w in out] == ["2014-10-22T10:00:00.000Z"]


def test_all_shards_of_winning_version_visible():
    shards = [seg("2014-10-22/2014-10-23", "v2", shard=i) for i in range(3)]
    old = seg("2014-10-22/2014-10-23", "v1")
    out = resolve_visible_windows(shards + [old], QUERY)
    assert len(out) == 3
    assert {w.manifest.shard_num for w in out} == {0, 1, 2}


def test_partial_overshadow_old_survives_outside():
    # v1 covers two days; v2 re-publishes only the first day → v1 stays
    # visible for the second day only.
    old = seg("2014-10-22/2014-10-24", "v1")
    new = seg("2014-10-22/2014-10-23", "v2")
    out = {w.manifest.version: w for w in resolve_visible_windows([old, new], QUERY)}
    assert out["v2"].is_fully_visible(QUERY)
    assert out["v1"].windows == (Interval.parse("2014-10-23/2014-10-24"),)
    assert not out["v1"].is_fully_visible(QUERY)


def test_containment_overshadow_hides_old_completely():
    old = seg("2014-10-22/2014-10-23", "v1")
    new = seg("2014-10-21/2014-10-24", "v2")
    out = resolve_visible_windows([old, new], QUERY)
    assert [w.manifest.version for w in out] == ["v2"]


def test_interval_pruning_excludes_non_overlapping():
    inside = seg("2014-10-22/2014-10-23", "v1")
    outside = seg("2014-11-01/2014-11-02", "v1")
    out = resolve_visible_windows([inside, outside], QUERY)
    assert [w.manifest.interval.iso() for w in out] == [inside.interval.iso()]


def test_disjoint_buckets_all_visible():
    a = seg("2014-10-22/2014-10-23", "v1")
    b = seg("2014-10-23/2014-10-24", "v1")
    out = resolve_visible_windows([a, b], QUERY)
    assert len(out) == 2
    assert all(w.is_fully_visible(QUERY) for w in out)


def test_query_clips_segment_window():
    s = seg("2014-10-22/2014-10-23", "v1")
    q = Interval.parse("2014-10-22T06:00:00/2014-10-22T12:00:00")
    out = resolve_visible_windows([s], q)
    assert out[0].windows == (q,)
    assert out[0].is_fully_visible(q)


def test_manifest_json_roundtrip():
    s = seg("2014-10-22/2014-10-23", "v1", shard=2)
    assert SegmentManifest.from_json(s.to_json()) == s


def test_republish_same_version_idempotent(tmp_path):
    """Re-publishing the same (interval, version, shard) replaces the
    manifest and data in place — one manifest, latest data wins."""
    import os

    from druid_hadoop_utils_spark.sources.segments import (
        list_manifests,
        register_manifest,
    )

    a = seg("2014-10-22/2014-10-23", "v1")
    register_manifest(str(tmp_path), a)
    register_manifest(str(tmp_path), a)  # idempotent overwrite
    mdir = os.path.join(str(tmp_path), "ds", "_segments")
    assert len(os.listdir(mdir)) == 1
    assert list_manifests(str(tmp_path), "ds") == [a]
    # and identical manifests dedupe in the timeline too
    assert len(resolve_visible_windows([a, a], QUERY)) == 1


def test_schema_evolution_new_dimension_reads_null_in_old_segments(
        spark, tmp_path):
    """Druid dimensions evolve: a column first published in a NEWER
    segment version must read as NULL for older segments' rows (not fail,
    not silently vanish depending on footer sampling order)."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.plans.planner import load
    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    root = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 1), host="a", v=1.0)])
    new = spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 2), host="b", v=2.0, region="eu")])
    publish_segments(old, root, "ev", "v1", bucket="DAY")
    publish_segments(new, root, "ev", "v2", bucket="DAY")
    spec = {"granularity": "NONE", "dimensions": ["host", "region"],
            "metrics": [{"name": "v", "type": "double"}]}
    rows = {r.host: r.region for r in load(
        spark, root, spec, interval="2020-01-01/2030-01-01",
        data_source="ev").collect()}
    assert rows == {"a": None, "b": "eu"}

    # filtering on the evolved dimension only matches where it exists
    out = load(spark, root, dict(spec, filter={
        "type": "selector", "dimension": "region", "value": "eu"}),
        interval="2020-01-01/2030-01-01", data_source="ev")
    assert [r.host for r in out.collect()] == ["b"]
