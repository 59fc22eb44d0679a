"""Segment lifecycle: publish → overshadow → compact → vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load, write_segment
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import compact_segments, vacuum
from druid_hadoop_utils_spark.sources.segments import list_manifests
from druid_hadoop_utils_spark.sources.tables import load_table

SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"},
                    {"name": "user_id", "type": "long"}]}


@pytest.fixture(scope="class")
def root(tmp_path_factory, spark, sf_dir):
    root = str(tmp_path_factory.mktemp("maint"))
    ev = load_table(spark, sf_dir, "events")
    publish_segments(
        ev.select("ts", "event_type", "value", "user_id").where(
            F.col("ts") < F.lit("2024-01-08")),
        root, "events", version="v1", time_column="ts", bucket="HOUR",
    )
    return root


class TestCompactVacuum:
    def test_compact_hour_to_day(self, spark, root):
        before = load(spark, root, SPEC, interval="2024-01-01/2024-01-08",
                      data_source="events")
        n_before = before.count()
        sum_before = before.agg(F.round(F.sum("value"), 2)).first()[0]
        n_files_before = len(before.inputFiles())

        manifests = compact_segments(spark, root, "events",
                                     "2024-01-01/2024-01-08", bucket="DAY")
        assert len(manifests) == 7  # 7 day buckets replace ~168 hour buckets

        after = load(spark, root, SPEC, interval="2024-01-01/2024-01-08",
                     data_source="events")
        assert after.count() == n_before
        assert after.agg(F.round(F.sum("value"), 2)).first()[0] == sum_before
        assert len(after.inputFiles()) < n_files_before
        # readers now see only the compacted version
        assert all("-compact" in f for f in after.inputFiles())

    def test_vacuum_removes_only_overshadowed(self, spark, root):
        all_manifests = list_manifests(root, "events")
        removed = vacuum(root, "events", dry_run=True)
        # the hourly v1 segments for the compacted week are dead; nothing else
        assert len(removed) > 100
        assert all("_v1_" in r for r in removed)

        removed_real = vacuum(root, "events")
        assert sorted(removed_real) == sorted(removed)
        left = list_manifests(root, "events")
        assert len(left) == len(all_manifests) - len(removed)

        # data unchanged after vacuum
        after = load(spark, root, SPEC, interval="2024-01-01/2024-01-08",
                     data_source="events")
        assert after.count() > 0
        # vacuumed data dirs are gone from disk
        for r in removed:
            assert not any(r in m.identifier for m in left)


def test_compact_subinterval_does_not_resurrect_overshadowed(spark, tmp_path):
    """Compacting a sub-interval must clip to that interval: a wider
    segment's out-of-interval rows must NOT be republished under the new
    top version, or they would resurrect data overshadowed elsewhere
    (v1 covers [d1,d4); v2 overshadows [d1,d2); compact [d2,d4))."""
    from datetime import datetime

    from pyspark.sql import Row

    root = str(tmp_path)
    v1_rows = [
        Row(__time=datetime(2024, 1, 1, 12), k="v1-d1", value=1.0),
        Row(__time=datetime(2024, 1, 2, 12), k="v1-d2", value=2.0),
        Row(__time=datetime(2024, 1, 3, 12), k="v1-d3", value=3.0),
    ]
    write_segment(spark.createDataFrame(v1_rows), root, "ds",
                  "2024-01-01/2024-01-04", "v1")
    v2_rows = [Row(__time=datetime(2024, 1, 1, 12), k="v2-d1", value=10.0)]
    write_segment(spark.createDataFrame(v2_rows), root, "ds",
                  "2024-01-01/2024-01-02", "v2")

    compact_segments(spark, root, "ds", "2024-01-02/2024-01-04", bucket="DAY")

    spec = {"granularity": "NONE", "dimensions": ["k"],
            "metrics": [{"name": "value", "type": "double"}]}
    after = load(spark, root, spec, interval="2024-01-01/2024-01-04",
                 data_source="ds")
    assert sorted(r.k for r in after.collect()) == ["v1-d2", "v1-d3", "v2-d1"]


def test_shard_append_union_visible(spark, tmp_path, golden_events):
    base = golden_events.drop("user_host")
    write_segment(base, str(tmp_path), "ds", "2014-10-22/2014-10-23", "v1", shard_num=0)
    write_segment(base.withColumn("visited_sum", F.col("visited_sum") + 1),
                  str(tmp_path), "ds", "2014-10-22/2014-10-23", "v1", shard_num=1)
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    df = load(spark, str(tmp_path), spec, interval="2014-10-22/2014-10-23",
              data_source="ds")
    assert df.count() == 6  # both shards of the same version are unioned


def test_orphan_data_without_manifest_is_invisible(spark, tmp_path, golden_events):
    """Crash-safety: parquet written without a manifest (simulating a crash
    before announcement) is never read."""
    base = golden_events.drop("user_host")
    write_segment(base, str(tmp_path), "ds", "2014-10-22/2014-10-23", "v1")
    # orphan: data for v2 exists on disk but was never announced
    from druid_hadoop_utils_spark.intervals import Interval
    from druid_hadoop_utils_spark.sources.segments import segment_dir

    orphan_dir = segment_dir(str(tmp_path), "ds",
                             Interval.parse("2014-10-22/2014-10-23"), "v2")
    base.withColumn("visited_sum", F.col("visited_sum") * 1000).write.parquet(orphan_dir)

    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    df = load(spark, str(tmp_path), spec, interval="2014-10-22/2014-10-23",
              data_source="ds")
    assert sum(r.visited_sum for r in df.collect()) == 450  # v1 only
    assert all("v=v1" in f for f in df.inputFiles())


def test_drop_interval_tombstone_lifecycle(spark, tmp_path, golden_events):
    """drop → invisible → vacuum reclaims → republish resurrects."""
    from druid_hadoop_utils_spark.sources.maintenance import drop_interval

    root = str(tmp_path)
    base = golden_events.drop("user_host")
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    write_segment(base, root, "ds", "2014-10-22/2014-10-23", "v1")
    day1 = load(spark, root, spec, interval="2014-10-22/2014-10-23",
                data_source="ds")
    n = day1.count()
    assert n > 0

    drop_interval(root, "ds", "2014-10-22/2014-10-23")
    # fully-dropped interval: no rows by default (ignoreWhenNoSegments
    # reference default), loud FileNotFoundError when the flag is off
    empty = load(spark, root, spec, interval="2014-10-22/2014-10-23",
                 data_source="ds")
    assert empty.count() == 0
    with pytest.raises(FileNotFoundError, match="dropped"):
        load(spark, root, spec, interval="2014-10-22/2014-10-23",
             data_source="ds", ignore_when_no_segments=False)

    # vacuum physically reclaims the hidden segment, keeps the tombstone
    removed = vacuum(root, "ds")
    assert any("v1" in r for r in removed)
    manifests = list_manifests(root, "ds")
    assert len(manifests) == 1 and manifests[0].tombstone

    # a later republish sits above the tombstone and is visible again
    write_segment(base, root, "ds", "2014-10-22/2014-10-23", "zzz-v2")
    again = load(spark, root, spec, interval="2014-10-22/2014-10-23",
                 data_source="ds")
    assert again.count() == n


def test_drop_partial_interval_keeps_other_days(spark, tmp_path, golden_events):
    """Dropping one day of a two-day segment hides ONLY that day."""
    from druid_hadoop_utils_spark.sources.maintenance import drop_interval

    root = str(tmp_path)
    base = golden_events.drop("user_host")
    d2 = base.withColumn("__time", F.col("__time") + F.expr("INTERVAL 1 DAY"))
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    write_segment(base.unionByName(d2), root, "ds",
                  "2014-10-22/2014-10-24", "v1")
    both = load(spark, root, spec, interval="2014-10-22/2014-10-24",
                data_source="ds")
    n_both = both.count()

    drop_interval(root, "ds", "2014-10-23/2014-10-24")
    after = load(spark, root, spec, interval="2014-10-22/2014-10-24",
                 data_source="ds")
    rows = after.collect()
    assert len(rows) == n_both // 2
    assert all(r["__time"].day == 22 for r in rows)
    # vacuum must NOT remove the segment — day 1 is still visible
    assert vacuum(root, "ds") == []


def test_apply_retention_drops_old_keeps_recent(spark, tmp_path, golden_events):
    from druid_hadoop_utils_spark.sources.maintenance import apply_retention

    root = str(tmp_path)
    base = golden_events.drop("user_host")
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    for day, v in (("22", "v1"), ("23", "v1"), ("24", "v1")):
        shifted = base.withColumn(
            "__time", F.col("__time") + F.expr(f"INTERVAL {int(day)-22} DAY"))
        write_segment(shifted, root, "ds",
                      f"2014-10-{day}/2014-10-{int(day)+1:02d}", v)
    per_day = load(spark, root, spec, interval="2014-10-22/2014-10-23",
                   data_source="ds").count()

    # dry run: reports, changes nothing
    would = apply_retention(root, "ds", "2014-10-24", dry_run=True)
    assert [w.interval.iso() for w in would] == [
        "2014-10-22T00:00:00+00:00/2014-10-24T00:00:00+00:00"]
    assert load(spark, root, spec, interval="2014-10-22/2014-10-25",
                data_source="ds").count() == 3 * per_day

    dropped = apply_retention(root, "ds", "2014-10-24")
    assert len(dropped) == 1  # contiguous run -> ONE tombstone
    rows = load(spark, root, spec, interval="2014-10-22/2014-10-25",
                data_source="ds").collect()
    assert len(rows) == per_day
    assert all(r["__time"].day == 24 for r in rows)
    # idempotent: nothing new to drop
    assert apply_retention(root, "ds", "2014-10-24") == []
    # vacuum reclaims the two hidden days
    assert len(vacuum(root, "ds")) == 2


def test_apply_retention_drops_backfill_above_tombstone(spark, tmp_path,
                                                        golden_events):
    """ADVICE r3: expired data backfilled ABOVE an existing tombstone with
    the identical interval must still be dropped — 'already dark' is a
    visible-timeline property, not tombstone-interval equality."""
    from druid_hadoop_utils_spark.sources.maintenance import apply_retention

    root = str(tmp_path)
    base = golden_events.drop("user_host")
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    write_segment(base, root, "ds", "2014-10-22/2014-10-23", "v1")
    dropped = apply_retention(root, "ds", "2014-10-23")
    assert len(dropped) == 1
    # NOTE: v1 not vacuumed — its manifest keeps the merged expired span
    # identical to the tombstone's interval, the trigger for the old bug.
    # Backfill the same day above the tombstone (version sorts above the
    # ISO drop stamp).
    write_segment(base, root, "ds", "2014-10-22/2014-10-23", "zzz-backfill")
    assert load(spark, root, spec, interval="2014-10-22/2014-10-23",
                data_source="ds").count() > 0
    # the backfill is expired too: retention must tombstone it again
    dropped2 = apply_retention(root, "ds", "2014-10-23")
    assert len(dropped2) == 1
    assert load(spark, root, spec, interval="2014-10-22/2014-10-23",
                data_source="ds").count() == 0
    # and now it really is idempotent
    assert apply_retention(root, "ds", "2014-10-23") == []


from pyspark.sql import Row


class TestCompactionCandidates:
    def test_flags_many_small_files_and_clears_after_compaction(
            self, spark, tmp_path):
        from datetime import datetime

        from druid_hadoop_utils_spark.sources.ingest import publish_segments
        from druid_hadoop_utils_spark.sources.maintenance import (
            compact_segments,
            compaction_candidates,
        )

        import glob
        import shutil

        rows = [Row(__time=datetime(2024, 1, 1, i % 24), v=float(i))
                for i in range(500)]
        df = spark.createDataFrame(rows)
        root = str(tmp_path / "tbl")
        publish_segments(df, root, "ev", "v1", bucket="DAY")
        # fragment the segment the way months of small appends would (AQE
        # coalesces the salted write at toy scale, so fabricate directly)
        seg_file = glob.glob(f"{root}/ev/2024*/v=v1/shard=0/*.parquet")[0]
        for i in range(6):
            shutil.copy(seg_file, seg_file.replace("part-", f"extra{i}-part-"))
        cands = compaction_candidates(root, "ev", max_files_per_segment=4,
                                      min_file_bytes=1024 * 1024)
        assert len(cands) == 1
        c = cands[0]
        assert c["n_files"] > 4
        assert any("files >" in r for r in c["reasons"])
        assert any("under" in r for r in c["reasons"])

        # compacting the flagged interval clears the report
        compact_segments(spark, root, "ev", c["interval"], bucket="DAY",
                         files_per_bucket=1)
        after = compaction_candidates(root, "ev", max_files_per_segment=4,
                                      min_file_bytes=0)
        assert after == []

    def test_healthy_layout_not_flagged(self, spark, tmp_path):
        from datetime import datetime

        from druid_hadoop_utils_spark.sources.ingest import publish_segments
        from druid_hadoop_utils_spark.sources.maintenance import (
            compaction_candidates,
        )

        rows = [Row(__time=datetime(2024, 1, 1, i % 24), v=float(i))
                for i in range(100)]
        df = spark.createDataFrame(rows)
        root = str(tmp_path / "tbl")
        publish_segments(df, root, "ev", "v1", bucket="DAY")
        assert compaction_candidates(root, "ev", min_file_bytes=0) == []


class TestAutoCompactAndStats:
    def _fragmented(self, spark, tmp_path):
        import glob
        import shutil
        from datetime import datetime

        from druid_hadoop_utils_spark.sources.ingest import publish_segments

        rows = [Row(__time=datetime(2024, 1, 1, i % 24), v=float(i))
                for i in range(500)]
        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(rows), root, "ev", "v1",
                         bucket="DAY")
        seg_file = glob.glob(f"{root}/ev/2024*/v=v1/shard=0/*.parquet")[0]
        for i in range(6):
            shutil.copy(seg_file,
                        seg_file.replace("part-", f"extra{i}-part-"))
        return root

    def test_auto_compact_applies_advisor(self, spark, tmp_path):
        from druid_hadoop_utils_spark import load
        from druid_hadoop_utils_spark.sources.maintenance import (
            auto_compact,
            compaction_candidates,
        )

        root = self._fragmented(spark, tmp_path)
        spec = {"granularity": "NONE", "dimensions": [],
                "metrics": [{"name": "v", "type": "double"}]}
        before = load(spark, root, spec, interval="2024-01-01/2024-01-02",
                      data_source="ev").count()

        planned = auto_compact(spark, root, "ev", min_file_bytes=1024 * 1024,
                               dry_run=True)
        assert len(planned) == 1
        done = auto_compact(spark, root, "ev", min_file_bytes=1024 * 1024)
        assert done == planned
        # report clears, rows preserved through the atomic flip
        assert compaction_candidates(root, "ev", min_file_bytes=0) == []
        after = load(spark, root, spec, interval="2024-01-01/2024-01-02",
                     data_source="ev").count()
        assert after == before
        # idempotent: a healthy table compacts nothing
        assert auto_compact(spark, root, "ev", min_file_bytes=0) == []

    def test_coalesce_spans_gap_cap_overlap(self):
        """The batching geometry (round 14): adjacency merges, a gap
        splits (unflagged data is never rewritten), the per-job cap
        bounds a span, overlap unions."""
        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.maintenance import (
            _coalesce_spans,
        )

        days = [f"2024-01-{d:02d}/2024-01-{d + 1:02d}"
                for d in (1, 2, 3, 4, 5)]
        lone = "2024-01-10/2024-01-11"
        assert _coalesce_spans(days + [lone], 32) == [
            Interval.parse("2024-01-01/2024-01-06"),
            Interval.parse(lone),
        ]
        # cap: 5 contiguous days at 2 buckets/job → 3 jobs
        assert _coalesce_spans(days, 2) == [
            Interval.parse("2024-01-01/2024-01-03"),
            Interval.parse("2024-01-03/2024-01-05"),
            Interval.parse("2024-01-05/2024-01-06"),
        ]
        # overlapping flags (mixed-granularity segments) union
        assert _coalesce_spans(
            ["2024-01-01/2024-01-03", "2024-01-02/2024-01-04"], 32) == [
            Interval.parse("2024-01-01/2024-01-04"),
        ]
        assert _coalesce_spans([], 32) == []

    def test_auto_compact_batches_adjacent_intervals(
            self, spark, tmp_path, monkeypatch):
        """VERDICT r13 item 5: a contiguous flagged backlog compacts in
        ONE Spark job per span (not one per interval), with identical
        rows and a cleared advisor afterwards."""
        import glob
        import shutil
        from datetime import datetime

        from druid_hadoop_utils_spark import load
        from druid_hadoop_utils_spark.sources import maintenance as M
        from druid_hadoop_utils_spark.sources.ingest import (
            publish_segments,
        )

        days = [1, 2, 3, 4, 5, 10]  # 5 contiguous + 1 isolated
        rows = [Row(__time=datetime(2024, 1, d, h), v=float(d * 100 + h))
                for d in days for h in range(4)]
        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(rows), root, "ev", "v1",
                         bucket="DAY")
        for d in days:
            seg_file = glob.glob(
                f"{root}/ev/2024-01-{d:02d}*/v=v1/shard=0/*.parquet")[0]
            for i in range(6):
                shutil.copy(seg_file,
                            seg_file.replace("part-", f"extra{i}-part-"))

        spec = {"granularity": "NONE", "dimensions": [],
                "metrics": [{"name": "v", "type": "double"}]}

        def _state():
            df = load(spark, root, spec, interval="2024-01-01/2024-02-01",
                      data_source="ev")
            r = df.agg(F.count("*").alias("n"),
                       F.sum("v").alias("s")).collect()[0]
            return r["n"], r["s"]

        before = _state()
        calls: list[str] = []
        real = M.compact_segments

        def counting(spark_, root_, ds_, interval, **kw):
            calls.append(str(interval))
            return real(spark_, root_, ds_, interval, **kw)

        monkeypatch.setattr(M, "compact_segments", counting)
        done = M.auto_compact(spark, root, "ev",
                              min_file_bytes=1024 * 1024)
        monkeypatch.undo()
        # every flagged interval is reported...
        assert len(done) == len(days)
        # ...but the contiguous run submitted as ONE job
        assert len(calls) == 2, calls
        assert M.compaction_candidates(root, "ev", min_file_bytes=0) == []
        assert _state() == before
        # idempotent
        assert M.auto_compact(spark, root, "ev", min_file_bytes=0) == []

    def test_table_stats(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import (
            auto_compact,
            table_stats,
        )

        root = self._fragmented(spark, tmp_path)
        st = table_stats(root, "ev")
        assert st["segments_visible"] == 1 and st["visible_files"] == 7
        assert st["versions"] == ["v1"]
        assert st["time_min"].startswith("2024-01-01")
        auto_compact(spark, root, "ev", min_file_bytes=1024 * 1024)
        st2 = table_stats(root, "ev")
        assert st2["visible_files"] == 1
        assert st2["segments_overshadowed"] >= 1  # the v1 original
        assert st2["segments_visible"] == 1
        # round 7: horizon + tags surface in the ops summary
        assert st2["history_horizon"] is None and st2["tags"] == {}
        from druid_hadoop_utils_spark.sources.maintenance import vacuum
        from druid_hadoop_utils_spark.sources.segments import create_tag

        # a tag at the CURRENT view: the pre-compaction original is
        # invisible in every view since it, so vacuum reclaims it and
        # the horizon lands exactly on the tag's pinned instant
        pinned = create_tag(root, "ev", "pin")["asOf"]
        assert vacuum(root, "ev")
        st3 = table_stats(root, "ev")
        assert st3["tags"] == {"pin": pinned}
        assert st3["history_horizon"] == pinned


# ---------------------------------------------------------------------
# staged-orphan reclamation (VERDICT r10 item 2): vacuum sweeps version
# dirs no manifest references and crashed publishes' _staging_* trees,
# age-gated so in-flight writers are never yanked
# ---------------------------------------------------------------------


@pytest.fixture(params=["local", "objectsim"])
def orphan_root(tmp_path, request, spark):
    from datetime import datetime

    from pyspark.sql import Row

    r = (str(tmp_path / "tbl") if request.param == "local"
         else "objectsim://" + str(tmp_path / "tbl"))
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(2) for h in (1, 2)]
    publish_segments(spark.createDataFrame(rows), r, "t", version="v1",
                     time_column="ts", bucket="DAY")
    return r


def _fabricate_died_mid_commit(spark, root):
    """A merge that died between its staged (register=False) publish and
    its commit: full never-visible bucket copies on disk, no manifest."""
    from datetime import datetime

    from pyspark.sql import Row

    staged = publish_segments(
        spark.createDataFrame([Row(ts=datetime(2024, 1, 1, 1),
                                   k="k1", v=999.0)]),
        root, "t", version="merge-deadbeef-v9", time_column="ts",
        bucket="DAY", register=False)
    assert staged and all(m.path for m in staged)
    return staged


def test_vacuum_reclaims_died_mid_commit_staged_dirs(spark, orphan_root):
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(orphan_root)
    staged = _fabricate_died_mid_commit(spark, orphan_root)
    vdirs = {fs.parent(m.path) for m in staged}
    assert all(fs.isdir(d) for d in vdirs)

    # age gate 0: everything unreferenced reclaims immediately
    removed = vacuum(orphan_root, "t", reclaim_staged_after_s=0.0)
    assert not any(fs.isdir(d) for d in vdirs), "orphan version dir survived"
    # the reclaimed dirs are reported (by path)
    assert any("merge-deadbeef-v9" in r for r in removed)
    # live data untouched
    assert {m.version for m in list_manifests(orphan_root, "t")} == {"v1"}


def test_vacuum_age_gate_protects_in_flight_staged_dirs(spark, orphan_root):
    """A FRESH staged dir (an in-flight writer between stage and commit)
    survives the default 24 h gate."""
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(orphan_root)
    staged = _fabricate_died_mid_commit(spark, orphan_root)
    vdirs = {fs.parent(m.path) for m in staged}

    removed = vacuum(orphan_root, "t")  # default reclaim_staged_after_s=24h
    assert all(fs.isdir(d) for d in vdirs), "in-flight staged dir yanked"
    assert not any("merge-deadbeef-v9" in r for r in removed)


def test_vacuum_reclaims_crashed_staging_tree(spark, orphan_root):
    """A publish that died before promoting leaves `_staging_<version>`;
    the age-gated sweep reclaims it."""
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(orphan_root)
    staging = fs.join(orphan_root, "t", "_staging_vcrashed")
    fs.mkdirs(staging)
    fs.put_text(fs.join(staging, "part-0.parquet"), "not really parquet")

    kept = vacuum(orphan_root, "t")  # fresh → survives the default gate
    assert fs.isdir(staging)
    assert not any("_staging_vcrashed" in r for r in kept)

    removed = vacuum(orphan_root, "t", reclaim_staged_after_s=0.0)
    assert not fs.isdir(staging)
    assert any("_staging_vcrashed" in r for r in removed)


def test_vacuum_dry_run_reports_orphans_without_deleting(spark, orphan_root):
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(orphan_root)
    staged = _fabricate_died_mid_commit(spark, orphan_root)
    vdirs = {fs.parent(m.path) for m in staged}

    reported = vacuum(orphan_root, "t", dry_run=True,
                      reclaim_staged_after_s=0.0)
    assert any("merge-deadbeef-v9" in r for r in reported)
    assert all(fs.isdir(d) for d in vdirs), "dry_run deleted data"


def test_vacuum_orphans_on_manifestless_table(spark, tmp_path):
    """A table whose very first publish died before any manifest landed:
    no timeline at all, only staged orphans — vacuum still reclaims."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.fs import get_fs

    root = str(tmp_path / "fresh")
    fs = get_fs(root)
    staged = publish_segments(
        spark.createDataFrame([Row(ts=datetime(2024, 1, 1, 1),
                                   k="k1", v=1.0)]),
        root, "t", version="v1", time_column="ts", bucket="DAY",
        register=False)
    vdirs = {fs.parent(m.path) for m in staged}
    assert all(fs.isdir(d) for d in vdirs)
    removed = vacuum(root, "t", reclaim_staged_after_s=0.0)
    assert removed and not any(fs.isdir(d) for d in vdirs)


def test_maintain_table_full_loop(spark, sf_dir, tmp_path):
    """maintain_table (round 13, VERDICT r12 item 7): the one-call cron
    — advisor compaction, vacuum, materialized catch-up from pending
    markers, postings re-compaction against the settled timeline, and
    age-gated materialized vacuum — driven end-to-end on a table with
    pending markers and a stale compact-postings tree."""
    from druid_hadoop_utils_spark.operators import similarity as S
    from druid_hadoop_utils_spark.sources.dml import delete_where
    from druid_hadoop_utils_spark.sources.maintenance import maintain_table
    from druid_hadoop_utils_spark.sources.materialize import (
        compact_postings,
        materialize_aggs,
        materialize_postings,
        read_postings,
    )

    root = str(tmp_path)
    # varied intra-day hours: the files_per_bucket salt keys on __time,
    # so a constant per-bucket timestamp would collapse to one file
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.expr(
            "timestampadd(HOUR, CAST(vec_id % 24 AS INT), "
            "CASE WHEN vec_id % 2 = 0 THEN timestamp'2024-01-01 00:00:00'"
            " ELSE timestamp'2024-01-02 00:00:00' END)"))
    # 3 files per bucket so the advisor flags both day segments
    # (files_per_bucket is an upper bound: AQE's partition coalescing
    # folds this tiny shuffle into one task — and one file — so turn
    # coalescing off for the publish to actually get the salt fan-out)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    try:
        publish_segments(emb, root, "emb", version="v1",
                         time_column="ts", bucket="DAY",
                         files_per_bucket=3)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "true")
    spec = {"granularity": "NONE", "dimensions": ["vec_id"],
            "metrics": [{"name": "embedding", "type": "complex"}]}
    S.publish_ann_index(spark, root, "emb", spec=spec, n_cells=8,
                        sample=512)
    materialize_postings(spark, root, "emb", "ivf")
    materialize_aggs(spark, root, "emb", "daily", [],
                     [{"type": "count", "name": "n"}],
                     granularity="DAY", time_column="__time")
    stale_tree = compact_postings(spark, root, "emb", "ivf")
    # DML: timeline moves (tree now stale), pending markers registered
    delete_where(spark, root, "emb",
                 {"type": "selector", "dimension": "vec_id",
                  "value": "2"})

    report = maintain_table(spark, root, "emb",
                            max_files_per_segment=2,
                            materialized_min_age_s=0)
    assert report["errors"] == []
    # advisor found the 3-file day segment(s) and compacted them
    assert report["compacted"]
    # old DML/pre-compaction versions reclaimed
    assert report["vacuumed"]
    # pending markers drove catch-up for BOTH materializations
    assert set(report["caught_up"]) >= {"ivf", "daily"}
    assert report["caught_up"]["ivf"]
    # a fresh compact tree against the settled (post-vacuum) timeline
    new_tree = report["postings_compacted"]["ivf"]
    assert new_tree != stale_tree
    # the stale tree reclaimed (age floor overridden to 0)
    stale_stem = os.path.basename(stale_tree)[:-len(".parquet")]
    assert stale_stem in report["materialized_vacuumed"]["ivf"]
    # and the table still serves correctly, from the NEW tree
    post = read_postings(spark, root, "emb", "ivf")
    assert all("_compact." in f for f in post.inputFiles())
    assert post.count() == emb.count() - 1
    # idempotent: a quiet second run changes nothing and stays green
    report2 = maintain_table(spark, root, "emb",
                             max_files_per_segment=2,
                             materialized_min_age_s=0)
    assert report2["errors"] == []
    assert report2["compacted"] == [] and report2["vacuumed"] == []
    assert report2["postings_compacted"]["ivf"] == new_tree


def test_vacuum_floor_as_of_pins_cutoff_exactly(spark, sf_dir, tmp_path):
    """vacuum(floor_as_of=) (round 13): an instant floor behaves like a
    tag — every view from that instant forward survives regardless of
    retain_history_s, and the boundary is INCLUSIVE (a floor exactly at
    the last announce keeps the diff-FROM view while releasing all
    older history)."""
    from druid_hadoop_utils_spark.sources.changes import (
        latest_stamp,
        read_changes,
    )
    from druid_hadoop_utils_spark.sources.dml import delete_where

    t1 = "2024-06-01T00:00:00+00:00"
    root = str(tmp_path)
    base = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("__time"), "event_id", "event_type", "value",
        "user_id")
    publish_segments(base, root, "events", version="v1", bucket="DAY",
                     published_at=t1)
    delete_where(spark, root, "events",
                 {"type": "selector", "dimension": "event_type",
                  "value": "error"})
    n_err = base.where(F.col("event_type") == "error").count()
    stamp = latest_stamp(root, "events")

    # floor at the OLD view's instant: nothing reclaimable
    assert vacuum(root, "events", floor_as_of=t1) == []
    assert read_changes(spark, root, "events", t1).count() == n_err

    # floor exactly AT the delete's stamp: pre-delete history goes,
    # the view at the stamp itself still resolves (boundary inclusive)
    removed = vacuum(root, "events", floor_as_of=stamp)
    assert removed
    assert read_changes(spark, root, "events", stamp).count() == 0
    with pytest.raises(ValueError, match="horizon"):
        read_changes(spark, root, "events", t1).count()


def test_maintain_table_broken_materialization_does_not_block_vacuum(
        spark, sf_dir, tmp_path):
    """The strict contract: a failing per-step (here a postings
    materialization whose published index artifact was deleted) still
    lets every independent step run — vacuum reclaims, the error is
    aggregated, and strict=True re-raises AFTER the work."""
    from druid_hadoop_utils_spark.operators import similarity as S
    from druid_hadoop_utils_spark.sources.dml import delete_where
    from druid_hadoop_utils_spark.sources.maintenance import maintain_table
    from druid_hadoop_utils_spark.sources.materialize import (
        materialize_postings,
    )

    root = str(tmp_path)
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.when(F.col("vec_id") % 2 == 0,
                     F.lit("2024-01-01 00:00:00"))
              .otherwise(F.lit("2024-01-02 00:00:00"))
              .cast("timestamp"))
    publish_segments(emb, root, "emb", version="v1", time_column="ts",
                     bucket="DAY")
    spec = {"granularity": "NONE", "dimensions": ["vec_id"],
            "metrics": [{"name": "embedding", "type": "complex"}]}
    S.publish_ann_index(spark, root, "emb", spec=spec, n_cells=8,
                        sample=512)
    materialize_postings(spark, root, "emb", "ivf")
    # break the materialization: the published index artifact vanishes
    os.remove(S.ann_index_path(root, "emb"))
    # and DML leaves reclaimable history + a pending marker
    delete_where(spark, root, "emb",
                 {"type": "selector", "dimension": "vec_id",
                  "value": "2"})

    with pytest.raises(RuntimeError, match="step failures"):
        maintain_table(spark, root, "emb", materialized_min_age_s=0)
    # non-strict: same work, errors reported instead of raised
    rep = maintain_table(spark, root, "emb", strict=False,
                         materialized_min_age_s=0)
    assert rep["errors"] and any("ivf" in e or "catch_up" in e
                                 for e in rep["errors"])
    # the table steps still ran on BOTH calls — the first (strict) one
    # already vacuumed the DML history, so nothing is left to reclaim
    # and the overshadowed v1 bucket's manifest is gone from the table
    assert rep["vacuumed"] == []
    from druid_hadoop_utils_spark.sources.segments import list_manifests

    versions = {m.version for m in list_manifests(root, "emb")
                if str(m.interval).startswith("2024-01-01")}
    assert "v1" not in versions, "strict run's vacuum did not reclaim"


class TestCoalesceSpanProperties:
    """Property sweep of the round-14 backlog batching geometry: for
    ANY flagged-day set and cap, the job spans must cover exactly the
    flagged days (never a gap day — unflagged data must not be
    rewritten), stay disjoint and sorted, and respect the cap."""

    def test_random_day_sets(self):
        from datetime import timedelta

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from druid_hadoop_utils_spark.intervals import Interval, parse_ts
        from druid_hadoop_utils_spark.sources.maintenance import (
            _coalesce_spans,
        )

        day0 = parse_ts("2024-01-01T00:00:00Z")

        @settings(max_examples=200, deadline=None)
        @given(days=st.sets(st.integers(0, 60), min_size=1, max_size=40),
               cap=st.integers(1, 8))
        def check(days, cap):
            ivs = [f"{(day0 + timedelta(days=d)).isoformat()}/"
                   f"{(day0 + timedelta(days=d + 1)).isoformat()}"
                   for d in sorted(days)]
            spans = _coalesce_spans(ivs, cap)
            # sorted + disjoint
            for a, b in zip(spans, spans[1:]):
                assert a.end <= b.start
            # exact union: every flagged day covered, no unflagged day
            covered = set()
            for s in spans:
                d = s.start
                while d < s.end:
                    covered.add((d - day0).days)
                    d += timedelta(days=1)
            assert covered == days
            # cap respected (a span holds at most cap flagged members)
            for s in spans:
                members = [d for d in days
                           if s.start <= day0 + timedelta(days=d) < s.end]
                assert 1 <= len(members) <= cap

        check()
