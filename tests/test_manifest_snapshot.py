"""Manifest snapshot compaction (sources/segments.compact_manifests) —
the driver-side planning cost at object-store scale: a 100k-segment
table must list its timeline in ONE metadata read, not 100k.

Contracts pinned here:
- compaction is a pure metadata rewrite: the listing (and therefore the
  visible timeline, every query result, and timeline_version's identity
  semantics) is unchanged;
- publishes after compaction write ordinary per-segment files beside
  the snapshot and re-compaction folds them in;
- the crash window (snapshot written, originals not yet deleted)
  produces duplicates that list_manifests dedups and a re-run cleans;
- vacuum is snapshot-aware: it rewrites the snapshot without the
  reclaimed entries (atomic put) instead of being unable to delete a
  file that still holds live entries;
- the whole flow also runs on a no-rename (objectsim://) root.
"""

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.plans.planner import load
from druid_hadoop_utils_spark.sources.fs import get_fs
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import vacuum
from druid_hadoop_utils_spark.sources.segments import (
    SNAPSHOT_PREFIX,
    compact_manifests,
    list_manifests,
    timeline_version,
    write_segment,
)

SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "doubleSum"}]}


def _events(spark, days, per_day=4):
    rows = [
        Row(ts=datetime(2024, 1, d, h),
            event_type=("click" if h % 2 else "view"),
            value=float(d * 100 + h))
        for d in days for h in range(per_day)
    ]
    return spark.createDataFrame(rows)


def _mdir(root):
    fs = get_fs(root)
    return fs, fs.join(root, "ev", "_segments")


@pytest.fixture(params=["local", "objectsim"])
def root(tmp_path, request):
    local = tmp_path / "tbl"
    local.mkdir()
    return str(local) if request.param == "local" \
        else "objectsim://" + str(local)


def test_compaction_preserves_listing_and_results(spark, root):
    publish_segments(_events(spark, [1, 2, 3]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    before = sorted(m.identifier for m in list_manifests(root, "ev"))
    tv_before = timeline_version(root, "ev")
    rows_before = sorted(
        tuple(r) for r in load(spark, root, SPEC,
                               interval="2024-01-01/2024-02-01",
                               data_source="ev").collect())

    snap = compact_manifests(root, "ev")
    fs, mdir = _mdir(root)
    names = [n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]
    assert names == [fs.name(snap)]
    assert names[0].startswith(SNAPSHOT_PREFIX)

    assert sorted(m.identifier for m in list_manifests(root, "ev")) == before
    assert timeline_version(root, "ev") == tv_before
    rows_after = sorted(
        tuple(r) for r in load(spark, root, SPEC,
                               interval="2024-01-01/2024-02-01",
                               data_source="ev").collect())
    assert rows_after == rows_before


def test_publish_after_snapshot_then_recompact(spark, root):
    publish_segments(_events(spark, [1, 2]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    compact_manifests(root, "ev")
    # a NEW publish lands beside the snapshot as an ordinary file
    publish_segments(_events(spark, [3]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    fs, mdir = _mdir(root)
    assert len([n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]) == 2
    assert len(list_manifests(root, "ev")) == 3
    # re-compaction folds it in
    compact_manifests(root, "ev")
    assert len([n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]) == 1
    assert len(list_manifests(root, "ev")) == 3
    out = load(spark, root, SPEC, interval="2024-01-01/2024-02-01",
               data_source="ev")
    assert out.count() == 12


def test_crash_window_duplicates_dedup_and_cleanup(spark, root):
    """Snapshot written but originals NOT deleted (simulated crash):
    listing stays correct (deduped), and a re-run converges to one
    file."""
    publish_segments(_events(spark, [1, 2]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    fs, mdir = _mdir(root)
    originals = [n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]
    # hand-write the snapshot the way compact_manifests would, keeping
    # the originals in place
    entries = [json.loads(fs.read_text(fs.join(mdir, n)))
               for n in originals]
    fs.put_text(fs.join(mdir, f"{SNAPSHOT_PREFIX}deadbeef.json"),
                json.dumps({"snapshot": entries}))
    assert len([n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]) == 3
    ms = list_manifests(root, "ev")
    assert len(ms) == 2  # deduped
    # the snapshot copy won (its file sorts first) — vacuum ownership
    assert all(SNAPSHOT_PREFIX in (m.manifest_file or "") for m in ms)
    compact_manifests(root, "ev")
    assert len([n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]) == 1
    assert len(list_manifests(root, "ev")) == 2


def test_vacuum_rewrites_snapshot(spark, root):
    """Overshadow one day, compact manifests, vacuum: the snapshot is
    REWRITTEN without the reclaimed entry (not left dangling, not
    blocked), and the reclaimed data dir is gone."""
    publish_segments(_events(spark, [1, 2]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    v2 = _events(spark, [2]).withColumn("value", F.col("value") + 1000.0)
    write_segment(v2.withColumnRenamed("ts", "__time"), root, "ev",
                  "2024-01-02/2024-01-03", version="v2")
    compact_manifests(root, "ev")
    old_day2 = [m for m in list_manifests(root, "ev")
                if m.version == "v1" and m.interval.start.day == 2]
    assert len(old_day2) == 1

    removed = vacuum(root, "ev")
    assert removed == [old_day2[0].identifier]
    fs, mdir = _mdir(root)
    names = [n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]
    assert len(names) == 1 and names[0].startswith(SNAPSHOT_PREFIX)
    left = list_manifests(root, "ev")
    assert sorted(m.version for m in left) == ["v1", "v2"]
    assert not fs.isdir(old_day2[0].path) \
        and not fs.exists(old_day2[0].path)
    # results unchanged after vacuum
    out = load(spark, root, SPEC, interval="2024-01-01/2024-02-01",
               data_source="ev")
    assert out.where("value >= 1000").count() == 4
    assert out.count() == 8


def test_vacuum_deletes_snapshot_when_empty(spark, root):
    """Every entry invisible (full-interval tombstone then vacuum):
    the snapshot file itself is removed once it holds nothing."""
    from druid_hadoop_utils_spark.sources.maintenance import drop_interval

    publish_segments(_events(spark, [1]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    compact_manifests(root, "ev")
    drop_interval(root, "ev", "2024-01-01/2024-01-02")
    removed = vacuum(root, "ev")
    assert len(removed) == 1
    fs, mdir = _mdir(root)
    names = [n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]
    # the tombstone's own file remains (it is still visible); the
    # snapshot lost its only entry and was deleted
    assert len(names) == 1 and not names[0].startswith(SNAPSHOT_PREFIX)


def test_auto_compact_folds_manifests_over_threshold(spark, tmp_path):
    """auto_compact's manifest-compaction hook: above the threshold the
    sweep snapshots the metadata; below it, files are left alone."""
    from druid_hadoop_utils_spark.sources.maintenance import auto_compact

    root = str(tmp_path / "tbl")
    publish_segments(_events(spark, [1, 2, 3]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    fs, mdir = _mdir(root)
    auto_compact(spark, root, "ev", compact_manifests_over=10)
    assert len([n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]) == 3
    auto_compact(spark, root, "ev", compact_manifests_over=2)
    names = [n for n in fs.ls(mdir) if n.endswith(".json") and not n.startswith("_")]
    assert len(names) == 1 and names[0].startswith(SNAPSHOT_PREFIX)
    assert len(list_manifests(root, "ev")) == 3
