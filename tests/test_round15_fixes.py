"""Round-15 ADVICE fixes, pinned:

1. streaming replay-safety window — a crash between the foreachBatch
   in-band registry commit and Spark's offset checkpoint, followed by a
   vacuum past the batch's FROM view, no longer wedges the stream: the
   replay is skipped iff the registered checkpoint proves the batch
   already completed (>= TO stamp); a genuinely-behind consumer still
   raises.
2. _coalesce_spans never emits two overlapping compact jobs when the
   per-job cap forces a split under mixed-granularity overlapping flags.
3. _consumer_gauge reports the REAL registered count on a pre-stamp
   table (checkpoints exist, no stamped manifests) instead of 0.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime

import pytest
from pyspark.sql import Row

from druid_hadoop_utils_spark.sources.changes import (
    commit_consumed,
    consumer_checkpoint_path,
    latest_stamp,
    read_changes,
    read_checkpoint,
)
from druid_hadoop_utils_spark.sources.dml import update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import vacuum
from druid_hadoop_utils_spark.streaming.changes_source import (
    stream_changes_foreach,
)

T1 = "2024-06-01T00:00:00+00:00"


def _rows(n=12):
    return [Row(__time=datetime(2024, 1, 1 + i % 3, i % 4),
                doc_id=i, lang="en" if i % 2 else "de",
                score=float(i)) for i in range(n)]


# ---------------------------------------------------------------------
# 1. streaming replay after the in-band-commit / offset-checkpoint
#    crash window + vacuum
# ---------------------------------------------------------------------


class TestReplayBelowHorizon:
    def _drain(self, spark, root, ckpt, calls, name="featgen"):
        def process(feed, a, b):
            feed.count()  # materialize the plan like a real consumer
            calls.append((a, b))

        q = stream_changes_foreach(
            spark, root, "docs", process, checkpoint_dir=ckpt,
            consumer_name=name, available_now=True)
        q.awaitTermination(120)

    def test_completed_batch_replay_skips_after_vacuum(
            self, spark, tmp_path):
        """The ADVICE r14 window end to end: batch 2 fully processed and
        registry-committed, Spark offset checkpoint LOST (crash before
        checkpoint write), vacuum advances the horizon past the batch's
        FROM view. The restarted stream must recognize the registered
        checkpoint >= TO as proof of completion, skip the replay, and
        advance — not wedge on ValueError forever."""
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        ckpt_backup = str(tmp_path / "sck_backup")
        calls: list = []

        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        self._drain(spark, root, ckpt, calls)  # batch 1: GENESIS -> T1
        assert len(calls) == 1 and calls[0][1] == T1

        # snapshot Spark's checkpoint BEFORE batch 2 = the lost write
        shutil.copytree(ckpt, ckpt_backup)

        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        t2 = latest_stamp(root, "docs")
        self._drain(spark, root, ckpt, calls)  # batch 2: (T1, t2]
        assert calls[-1] == (T1, t2)
        # the in-band commit survived the "crash"
        reg = read_checkpoint(consumer_checkpoint_path(root, "docs",
                                                       "featgen"))
        assert reg == t2

        # crash simulation: Spark's offset checkpoint reverts to
        # pre-batch-2; the registry keeps t2 (exactly the window)
        shutil.rmtree(ckpt)
        shutil.copytree(ckpt_backup, ckpt)

        # maintenance runs meanwhile: floor = registry (t2), so the
        # horizon legitimately advances past view T1
        vacuum(root, "docs", retain_history_s=0.0, floor_as_of=t2)
        with pytest.raises(ValueError, match="history horizon"):
            read_changes(spark, root, "docs", T1, t2)

        # restart: replays batch (T1, t2] -> below horizon, but the
        # registered checkpoint reads t2 >= t2 -> skip, don't wedge
        n_before = len(calls)
        self._drain(spark, root, ckpt, calls)
        assert len(calls) == n_before, "completed batch must not re-run"
        # and the stream is healthy afterwards: a further drain is a
        # caught-up no-op, not an error
        self._drain(spark, root, ckpt, calls)
        assert len(calls) == n_before

    def test_widened_replay_narrows_to_unprocessed_suffix(
            self, spark, tmp_path):
        """The harder variant of the ADVICE window: offset checkpoint
        lost AND a new publish lands before restart, so the replayed
        batch widens to (T1, t3] — not byte-identical to the committed
        (T1, t2]. The clamp must narrow delivery to the unprocessed
        (t2, t3] suffix (registry = durable progress), even though view
        T1 is below the vacuum horizon — the stream heals instead of
        wedging, and nothing is delivered twice."""
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        ckpt_backup = str(tmp_path / "sck_backup")
        calls: list = []

        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        self._drain(spark, root, ckpt, calls)          # GENESIS -> T1
        shutil.copytree(ckpt, ckpt_backup)

        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        t2 = latest_stamp(root, "docs")
        self._drain(spark, root, ckpt, calls)          # (T1, t2]
        assert calls[-1] == (T1, t2)

        # crash window + a NEW publish before restart
        shutil.rmtree(ckpt)
        shutil.copytree(ckpt_backup, ckpt)
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "en"},
                     set={"score": "score + 7"})
        t3 = latest_stamp(root, "docs")
        vacuum(root, "docs", retain_history_s=0.0, floor_as_of=t2)
        with pytest.raises(ValueError, match="history horizon"):
            read_changes(spark, root, "docs", T1, t3)

        self._drain(spark, root, ckpt, calls)
        # exactly ONE new delivery, clamped to the unprocessed suffix
        assert calls[-1] == (t2, t3)
        assert calls.count((t2, t3)) == 1
        reg = read_checkpoint(consumer_checkpoint_path(root, "docs",
                                                       "featgen"))
        assert reg == t3
        # healthy afterwards
        n = len(calls)
        self._drain(spark, root, ckpt, calls)
        assert len(calls) == n

    def test_genuinely_behind_consumer_still_raises(self, spark,
                                                    tmp_path):
        """The skip must demand PROOF: registry behind the batch's TO
        stamp means the batch never completed — the below-horizon error
        is a real fell-too-far-behind condition and propagates."""
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        ckpt_backup = str(tmp_path / "sck_backup")
        calls: list = []

        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        self._drain(spark, root, ckpt, calls)
        shutil.copytree(ckpt, ckpt_backup)

        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        t2 = latest_stamp(root, "docs")
        self._drain(spark, root, ckpt, calls)

        shutil.rmtree(ckpt)
        shutil.copytree(ckpt_backup, ckpt)
        # registry rewound to T1: the batch's completion is NOT proven
        commit_consumed(consumer_checkpoint_path(root, "docs",
                                                 "featgen"), T1)
        vacuum(root, "docs", retain_history_s=0.0, floor_as_of=t2)

        def process(feed, a, b):
            calls.append((a, b))

        q = stream_changes_foreach(
            spark, root, "docs", process, checkpoint_dir=ckpt,
            consumer_name="featgen", available_now=True)
        with pytest.raises(StreamingQueryException,
                           match="history horizon"):
            q.awaitTermination(120)


# ---------------------------------------------------------------------
# 2. _coalesce_spans: cap split never emits overlapping jobs
# ---------------------------------------------------------------------


class TestCoalesceSpansOverlap:
    def test_cap_split_on_overlap_keeps_merging(self):
        from druid_hadoop_utils_spark.sources.maintenance import (
            _coalesce_spans,
        )

        # mixed-granularity flags: a month-wide advisory overlapping
        # day buckets, cap=2 forces a split mid-overlap under the old
        # rule -> two jobs both rewriting 01-02/01-03
        flagged = [
            "2024-01-01T00:00:00/2024-01-02T00:00:00",
            "2024-01-01T00:00:00/2024-02-01T00:00:00",
            "2024-01-02T00:00:00/2024-01-03T00:00:00",
            "2024-02-01T00:00:00/2024-02-02T00:00:00",
        ]
        spans = _coalesce_spans(flagged, max_buckets_per_job=2)
        # no two spans overlap: consecutive spans touch at most
        for prev, nxt in zip(spans, spans[1:]):
            assert nxt.start >= prev.end, (prev, nxt)
        # every flagged interval is covered by exactly the union
        from druid_hadoop_utils_spark.intervals import Interval

        for s in flagged:
            iv = Interval.parse(s)
            assert any(sp.start <= iv.start and iv.end <= sp.end
                       for sp in spans), s
        # the month overlap merged into ONE job; the gap-free touch at
        # 02-01 still split on the cap
        assert len(spans) == 2

    def test_touch_split_at_cap_unchanged(self):
        from druid_hadoop_utils_spark.sources.maintenance import (
            _coalesce_spans,
        )

        days = [f"2024-01-{d:02d}T00:00:00/2024-01-{d + 1:02d}T00:00:00"
                for d in range(1, 7)]
        spans = _coalesce_spans(days, max_buckets_per_job=2)
        assert len(spans) == 3
        for prev, nxt in zip(spans, spans[1:]):
            assert nxt.start == prev.end

    def test_gap_never_bridged(self):
        from druid_hadoop_utils_spark.sources.maintenance import (
            _coalesce_spans,
        )

        spans = _coalesce_spans(
            ["2024-01-01T00:00:00/2024-01-02T00:00:00",
             "2024-01-05T00:00:00/2024-01-06T00:00:00"],
            max_buckets_per_job=32)
        assert len(spans) == 2


# ---------------------------------------------------------------------
# 2b. compaction_plan: the dry-run span preview
# ---------------------------------------------------------------------


class TestCompactionPlan:
    def test_preview_matches_real_run_geometry(self, spark, tmp_path):
        import glob as _glob
        import shutil as _shutil

        from druid_hadoop_utils_spark.sources.maintenance import (
            auto_compact,
            compaction_plan,
        )

        root = str(tmp_path / "tbl")
        rows = [Row(__time=datetime(2024, 1, 1 + d, h), k=d * 10 + h,
                    v=float(h)) for d in range(4) for h in range(3)]
        publish_segments(spark.createDataFrame(rows), root, "ev",
                         version="v1", bucket="DAY", published_at=T1)
        # fragment every day segment so the advisor flags all four
        for seg in _glob.glob(f"{root}/ev/2024*/v=v1/shard=0/*.parquet"):
            for i in range(6):
                _shutil.copy(seg,
                             seg.replace("part-", f"extra{i}-part-"))

        plan = compaction_plan(root, "ev", min_file_bytes=1024 * 1024,
                               max_buckets_per_job=2)
        assert len(plan["intervals"]) == 4
        assert len(plan["flagged"]) == 4
        # 4 contiguous days at cap 2 -> 2 jobs of 2 members each
        assert [j["flagged_members"] for j in plan["jobs"]] == [2, 2]
        # preview intervals == what auto_compact(dry_run) returns
        assert plan["intervals"] == auto_compact(
            spark, root, "ev", min_file_bytes=1024 * 1024, dry_run=True)
        # and the real run compacts exactly the previewed intervals
        done = auto_compact(spark, root, "ev",
                            min_file_bytes=1024 * 1024,
                            max_buckets_per_job=2)
        assert done == plan["intervals"]
        after = compaction_plan(root, "ev", min_file_bytes=1024 * 1024)
        assert after["jobs"] == [] and after["intervals"] == []

    def test_byte_targeted_output_sizing(self, spark, tmp_path):
        """The 100 TB knob: target_file_bytes sizes each job's output
        by measured bytes instead of a fixed files_per_bucket — a huge
        bucket must not collapse to one file (one write task, one read
        split). Pinned: plan sizing == ceil(mean flagged bytes per
        bucket / target), the real run emits that many files per
        bucket, rows survive, and a generous target still yields 1."""
        import glob as _glob
        import math
        import shutil as _shutil

        from druid_hadoop_utils_spark import load
        from druid_hadoop_utils_spark.sources.maintenance import (
            auto_compact,
            compaction_plan,
        )

        root = str(tmp_path / "tbl")
        rows = [Row(__time=datetime(2024, 1, 1 + d, h % 24, m),
                    k=d * 1000 + h * 60 + m, v=float(m))
                for d in range(2) for h in range(5) for m in range(10)]
        publish_segments(spark.createDataFrame(rows), root, "ev",
                         version="v1", bucket="DAY", published_at=T1)
        for seg in _glob.glob(f"{root}/ev/2024*/v=v1/shard=0/*.parquet"):
            for i in range(6):
                _shutil.copy(seg,
                             seg.replace("part-", f"extra{i}-part-"))

        spec = {"granularity": "NONE", "dimensions": [],
                "metrics": [{"name": "v", "type": "double"}]}
        before = load(spark, root, spec, interval="2024-01-01/2024-02-01",
                      data_source="ev").count()

        plan = compaction_plan(root, "ev", min_file_bytes=1024 * 1024)
        mean = sum(c["total_bytes"] for c in plan["flagged"]) / len(
            plan["intervals"])
        target = int(mean // 6) + 1   # expect 6 files per bucket
        sized = compaction_plan(root, "ev", min_file_bytes=1024 * 1024,
                                target_file_bytes=target)
        want = math.ceil(mean / target)
        assert want >= 4
        assert all(j["files_per_bucket"] == want for j in sized["jobs"])
        # without a target the preview leaves sizing to the caller
        assert all(j["files_per_bucket"] is None for j in plan["jobs"])

        # AQE coalesces the tiny per-salt shuffle partitions of a
        # test-sized table back into one file (its advisory partition
        # size dwarfs them); at the scale the knob exists for, each
        # (bucket, salt) partition exceeds the advisory size and
        # survives. Disable AQE here so the salt fan-out is observable.
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            auto_compact(spark, root, "ev", min_file_bytes=1024 * 1024,
                         target_file_bytes=target)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
        day_dirs = {p.rsplit("/", 3)[0]
                    for p in _glob.glob(
                        f"{root}/ev/2024*/v=z*compact*/shard=0/*.parquet")}
        for d in _glob.glob(f"{root}/ev/2024*"):
            files = _glob.glob(f"{d}/v=z*compact*/shard=0/*.parquet")
            # files_per_bucket is an UPPER bound (test_maintenance.py
            # precedent): distinct salts can hash-collide into one
            # shuffle partition, so pin a band, not equality
            assert want // 2 <= len(files) <= want, (d, files)
        assert day_dirs, "compaction must have produced a new version"
        after = load(spark, root, spec, interval="2024-01-01/2024-02-01",
                     data_source="ev").count()
        assert after == before

        # generous target: one file per bucket again (fresh fragments)
        for seg in _glob.glob(
                f"{root}/ev/2024*/v=z*compact*/shard=0/*.parquet"):
            for i in range(6):
                _shutil.copy(seg,
                             seg.replace("part-", f"x{i}-part-"))
        plan2 = compaction_plan(root, "ev", min_file_bytes=1024 * 1024,
                                target_file_bytes=1 << 40)
        assert plan2["jobs"] and all(
            j["files_per_bucket"] == 1 for j in plan2["jobs"])


class TestByteSizingGranularity:
    """Byte-targeted sizing keys on OUTPUT buckets at the rewrite
    granularity, not on flagged-interval count — the mixed-granularity
    cases from the round-15 review."""

    def _gb(self, n):
        return n * 1024 * 1024 * 1024

    def test_day_flags_rebucketed_at_month(self):
        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.maintenance import (
            _span_files_per_bucket,
        )

        # 30 flagged DAY segments of 1 GB over one month, rewritten at
        # MONTH with a 512 MB target: the ONE month bucket holds 30 GB
        # -> 60 files, not ceil(1GB/512MB)=2
        flagged = [{"interval": f"2024-01-{d:02d}T00:00:00/"
                                f"2024-01-{d + 1:02d}T00:00:00",
                    "total_bytes": self._gb(1)} for d in range(1, 31)]
        span = Interval.parse("2024-01-01T00:00:00/2024-01-31T00:00:00")
        fpb = _span_files_per_bucket(span, flagged, 512 * 1024 * 1024,
                                     "MONTH")
        assert fpb == 60

    def test_month_flag_rebucketed_at_day(self):
        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.maintenance import (
            _span_files_per_bucket,
        )

        # one flagged 31 GB MONTH segment rewritten at DAY: ~1 GB/day
        # -> 2 files per day at 512 MB, not ceil(31GB/512MB)=62
        flagged = [{"interval": "2024-01-01T00:00:00/2024-02-01T00:00:00",
                    "total_bytes": self._gb(31)}]
        span = Interval.parse("2024-01-01T00:00:00/2024-02-01T00:00:00")
        fpb = _span_files_per_bucket(span, flagged, 512 * 1024 * 1024,
                                     "DAY")
        assert fpb == 2

    def test_bucket_count_edges(self):
        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.maintenance import (
            _bucket_count,
        )

        assert _bucket_count(
            Interval.parse("2024-01-01T00:00:00/2024-01-02T00:00:00"),
            "DAY") == 1
        # partial trailing day still emits a bucket
        assert _bucket_count(
            Interval.parse("2024-01-01T12:00:00/2024-01-02T06:00:00"),
            "DAY") == 2
        assert _bucket_count(
            Interval.parse("2024-01-01T00:00:00/2024-01-01T03:00:00"),
            "HOUR") == 3
        assert _bucket_count(
            Interval.parse("2024-01-01T00:00:00/2024-03-01T00:00:00"),
            "MONTH") == 2
        # sub-month span at MONTH = one bucket
        assert _bucket_count(
            Interval.parse("2024-01-05T00:00:00/2024-01-20T00:00:00"),
            "MONTH") == 1
        with pytest.raises(ValueError, match="unsupported bucket"):
            _bucket_count(
                Interval.parse("2024-01-01T00:00:00/2024-01-02T00:00:00"),
                "WEEK")


# ---------------------------------------------------------------------
# 2c. column-projected change feed
# ---------------------------------------------------------------------


class TestProjectedChangeFeed:
    def _table(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        rows = [Row(__time=datetime(2024, 1, 1 + i % 3, i % 4),
                    doc_id=i, lang="en" if i % 2 else "de",
                    text="lorem ipsum " * 50 + str(i),
                    score=float(i)) for i in range(12)]
        publish_segments(spark.createDataFrame(rows), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        return root

    def test_unprojected_change_nets_to_empty(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        # UPDATE touches only `score` — outside the projection
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        feed = read_changes(spark, root, "docs", T1,
                            columns=["doc_id", "lang"])
        assert feed.columns == ["doc_id", "lang", "_change_type", "_n"]
        assert feed.count() == 0
        # the full feed is NOT empty — the projection is what nets it
        assert read_changes(spark, root, "docs", T1).count() > 0

    def test_projected_net_equals_relational_diff(self, spark,
                                                  tmp_path):
        from druid_hadoop_utils_spark import load

        root = self._table(spark, tmp_path)
        spec = {"granularity": "NONE",
                "dimensions": ["doc_id", "lang", "text"],
                "metrics": [{"name": "score", "type": "double"}]}
        iv = "2024-01-01/2024-02-01"
        base = load(spark, root, spec, interval=iv,
                    data_source="docs").select("lang", "score")
        update_where(spark, root, "docs",
                     {"type": "bound", "dimension": "doc_id",
                      "lower": "8", "ordering": "numeric"},
                     set={"score": "score * 10"})
        final = load(spark, root, spec, interval=iv,
                     data_source="docs").select("lang", "score")

        feed = read_changes(spark, root, "docs", T1,
                            columns=["lang", "score"])
        got = sorted(
            (r["lang"], r["score"], r["_change_type"], r["_n"])
            for r in feed.collect())
        ins = final.exceptAll(base).groupBy("lang", "score").count()
        dels = base.exceptAll(final).groupBy("lang", "score").count()
        want = sorted(
            [(r["lang"], r["score"], "insert", r["count"])
             for r in ins.collect()]
            + [(r["lang"], r["score"], "delete", r["count"])
               for r in dels.collect()])
        assert got == want and got

    def test_projection_reaches_the_scan(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 1"})
        feed = read_changes(spark, root, "docs", T1,
                            columns=["doc_id", "score"])
        plan = feed._jdf.queryExecution().executedPlan().toString()
        schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert schemas
        # the fat text column and lang must never be read
        assert all("text" not in ln and "lang" not in ln
                   for ln in schemas), schemas

    def test_projecting_away_map_lifts_netting_refusal(self, spark,
                                                       tmp_path):
        root = str(tmp_path / "tbl")
        rows = [Row(__time=datetime(2024, 1, 1 + i % 2), doc_id=i,
                    props={"k": str(i)}) for i in range(6)]
        publish_segments(spark.createDataFrame(rows), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        update_where(spark, root, "docs",
                     {"type": "bound", "dimension": "doc_id",
                      "lower": "4", "ordering": "numeric"},
                     set={"doc_id": "doc_id + 100"})
        with pytest.raises(ValueError, match="map columns"):
            read_changes(spark, root, "docs", T1).count()
        feed = read_changes(spark, root, "docs", T1,
                            columns=["doc_id"])
        got = {(r["doc_id"], r["_change_type"]) for r in feed.collect()}
        assert got == {(4, "delete"), (5, "delete"),
                       (104, "insert"), (105, "insert")}

    def test_projection_validation(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match="not in table columns"):
            read_changes(spark, root, "docs", T1, columns=["nope"])
        with pytest.raises(ValueError, match="added by the feed"):
            read_changes(spark, root, "docs", T1,
                         columns=["_change_type"])
        with pytest.raises(ValueError, match="table columns only"):
            read_changes(spark, root, "docs", T1, columns=[])
        with pytest.raises(ValueError, match="duplicate columns"):
            read_changes(spark, root, "docs", T1,
                         columns=["lang", "lang"])

    def test_caught_up_empty_feed_carries_projection(self, spark,
                                                     tmp_path):
        root = self._table(spark, tmp_path)
        feed = read_changes(spark, root, "docs", T1, T1,
                            columns=["doc_id", "lang"])
        assert feed.columns == ["doc_id", "lang", "_change_type", "_n"]
        assert feed.count() == 0


# ---------------------------------------------------------------------
# 3. _consumer_gauge on a pre-stamp table
# ---------------------------------------------------------------------


class TestPreStampConsumerGauge:
    def test_registered_count_visible_without_stamps(self, spark,
                                                     tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import (
            _consumer_gauge,
        )

        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        # strip stamps -> pre-feature manifests
        mdir = os.path.join(root, "docs", "_segments")
        for name in os.listdir(mdir):
            p = os.path.join(mdir, name)
            obj = json.loads(open(p).read())
            obj.pop("publishedAt", None)
            open(p, "w").write(json.dumps(obj))

        # two real consumers + a stray editor backup that must NOT count
        for n in ("alpha", "beta"):
            commit_consumed(consumer_checkpoint_path(root, "docs", n),
                            T1)
        cdir = os.path.join(root, "docs", "_consumers")
        open(os.path.join(cdir, "_editor_backup.json"), "w").write("{}")

        g = _consumer_gauge(root, "docs")
        assert g["registered"] == 2
        assert g["slowest"] is None and g["max_behind_s"] is None
        assert g["errors"] == []

    def test_no_registry_dir_stays_zero(self, spark, tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import (
            _consumer_gauge,
        )

        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        g = _consumer_gauge(root, "docs")
        assert g["registered"] == 0
