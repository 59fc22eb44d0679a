"""Structured Streaming over the change feed (VERDICT r13 item 8,
streaming/changes_source.py).

Pins the wrapper's contracts against the BATCH loop it drives:

1. the announce stream delivers exactly the manifest registrations
   between its offsets, micro-batched per publish-stamp advance, and
   resumes from Spark's checkpoint across restarts (no redelivery);
2. ``stream_changes_foreach`` hands each batch the IDENTICAL row-level
   feed ``read_changes`` computes for the same stamp pair — full
   snapshot first (GENESIS), net changes after — so a downstream
   aggregate maintained from the stream equals a full recompute;
3. a named stream advances its REGISTERED consumer checkpoint
   (vacuum-floor protected, visible to list_consumers).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.sources.changes import (
    GENESIS,
    latest_stamp,
    list_consumers,
    read_changes,
)
from druid_hadoop_utils_spark.sources.dml import delete_where, update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.streaming.changes_source import (
    stream_announcements,
    stream_changes_foreach,
)

T1 = "2024-06-01T00:00:00+00:00"
T2 = "2024-06-02T00:00:00+00:00"
T3 = "2024-06-03T00:00:00+00:00"


def _rows(n=12, day0=1):
    return [Row(__time=datetime(2024, 1, day0 + i % 3, i % 4),
                doc_id=i, lang="en" if i % 2 else "de",
                score=float(i)) for i in range(n)]


class TestAnnounceStream:
    def test_stream_delivers_and_checkpoints(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        ann = stream_announcements(spark, root, "docs")
        sink: list = []

        def run_once():
            # foreachBatch sink: the memory sink cannot recover from a
            # checkpoint, and restart-resume is exactly what's under test
            q = (ann.writeStream
                 .foreachBatch(lambda df, _e: sink.extend(df.collect()))
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_once()
        got = list(sink)
        assert len(got) == 3  # 3 day segments, one registration each
        assert {r["version"] for r in got} == {"v1"}
        assert {r["published_at"] for r in got} == {T1}
        assert all(r["from_as_of"] == GENESIS for r in got)
        assert all(not r["tombstone"] for r in got)

        # restart from the SAME checkpoint with nothing new: no rows
        sink.clear()
        run_once()
        assert sink == []

        # a DML publish advances the offset: exactly the new manifests
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        t2 = latest_stamp(root, "docs")
        sink.clear()
        run_once()
        assert sink and {r["published_at"] for r in sink} == {t2}
        # from_as_of reconstructs the batch's diff-FROM view
        assert {r["from_as_of"] for r in sink} == {T1}

    def test_reader_commit_is_monotonic(self, spark, tmp_path):
        """The registry has TWO writers for a named stream — the
        foreachBatch wrapper (in-band) and the reader's commit callback,
        which Spark fires one trigger LATE — so a late commit must never
        move the checkpoint backwards."""
        from druid_hadoop_utils_spark.streaming.changes_source import (
            SegmentAnnounceStreamReader,
        )

        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        reader = SegmentAnnounceStreamReader(
            {"tableroot": root, "datasource": "docs",
             "consumername": "replica"})
        reader.commit({"asOf": T2})
        lags = list_consumers(root, "docs")
        assert lags["replica"]["consumed_as_of"] == T2
        reader.commit({"asOf": T1})  # LATE commit of an older batch
        assert list_consumers(
            root, "docs")["replica"]["consumed_as_of"] == T2  # no regress
        reader.commit({"asOf": T3})
        assert list_consumers(
            root, "docs")["replica"]["consumed_as_of"] == T3
        reader.commit({"asOf": GENESIS})  # never checkpoint genesis
        assert list_consumers(
            root, "docs")["replica"]["consumed_as_of"] == T3


class TestForeachChanges:
    def test_stream_equals_batch_feed_and_recompute(self, spark,
                                                    tmp_path):
        """The consumer-equivalence property, streaming edition: a
        (count, sum) aggregate maintained from the streamed feed equals
        a full recompute of the current view after every drain."""
        from druid_hadoop_utils_spark import load

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        spec = {"granularity": "NONE", "dimensions": ["doc_id", "lang"],
                "metrics": [{"name": "score", "type": "double"}]}
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        state = {"n": 0, "s": 0.0}
        batches: list[tuple[str, str]] = []

        def process(feed, a, b):
            batches.append((a, b))
            # the streamed feed must BE read_changes(a, b)
            exp = read_changes(spark, root, "docs", a, b)
            assert _sorted(feed) == _sorted(exp)
            agg = feed.groupBy().agg(
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("_n")).otherwise(-F.col("_n"))
                      ).alias("dn"),
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("score") * F.col("_n"))
                      .otherwise(-F.col("score") * F.col("_n"))
                      ).alias("ds")).collect()[0]
            state["n"] += agg["dn"] or 0
            state["s"] += agg["ds"] or 0.0

        def _sorted(df):
            cols = sorted(df.columns)
            return sorted(tuple(r[c] for c in cols)
                          for r in df.select(*cols).collect())

        def recompute():
            cur = load(spark, root, spec,
                       interval="2024-01-01/2024-02-01",
                       data_source="docs")
            r = cur.agg(F.count("*").alias("n"),
                        F.sum("score").alias("s")).collect()[0]
            return r["n"], float(r["s"] or 0.0)

        def drain_once():
            q = stream_changes_foreach(
                spark, root, "docs", process, checkpoint_dir=ckpt,
                consumer_name="featgen", available_now=True)
            q.awaitTermination(120)

        drain_once()  # batch 1: GENESIS full snapshot as inserts
        assert batches and batches[0][0] == GENESIS
        assert (state["n"], state["s"]) == recompute()

        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 100"})
        delete_where(spark, root, "docs",
                     {"type": "bound", "dimension": "doc_id",
                      "lower": "9", "ordering": "numeric"})
        t3 = latest_stamp(root, "docs")
        drain_once()  # net changes only
        assert batches[-1][0] == T1 and batches[-1][1] == t3
        assert (state["n"], state["s"]) == recompute()
        # the registered checkpoint followed the stream
        lags = list_consumers(root, "docs")
        assert lags["featgen"]["consumed_as_of"] == t3

        # caught up: a further drain delivers nothing
        n_before = len(batches)
        drain_once()
        assert len(batches) == n_before


class TestReplayDeterminism:
    def test_read_between_offsets_replays_byte_identical(
            self, spark, tmp_path):
        """Failure recovery re-reads a batch via readBetweenOffsets with
        the checkpointed bounds — it must reproduce EXACTLY what read()
        delivered, even after later publishes landed (the replay derives
        from the manifest stamps, not from 'current latest')."""
        from druid_hadoop_utils_spark.streaming.changes_source import (
            SegmentAnnounceStreamReader,
        )

        root = str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        reader = SegmentAnnounceStreamReader(
            {"tableroot": root, "datasource": "docs"})
        start = reader.initialOffset()
        it, end = reader.read(start)
        batch1 = list(it)
        assert end == {"asOf": T1} and len(batch1) == 3

        # later traffic must not perturb the replay of batch 1
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 1"})
        assert list(reader.readBetweenOffsets(start, end)) == batch1

        # the next read picks up exactly the new registrations
        it2, end2 = reader.read(end)
        batch2 = list(it2)
        t2 = latest_stamp(root, "docs")
        assert end2 == {"asOf": t2}
        assert batch2 and all(r[1] == t2 and r[8] == T1 for r in batch2)
        assert list(reader.readBetweenOffsets(end, end2)) == batch2
        # caught up: read returns empty and does NOT advance the offset
        it3, end3 = reader.read(end2)
        assert list(it3) == [] and end3 == end2


class TestAnnounceStreamCost:
    def test_caught_up_poll_is_one_listing(self, spark, tmp_path,
                                           monkeypatch):
        """The stream's per-trigger metadata cost on an object store:
        read() is ONE manifest listing — after compact_manifests, one
        ls + one snapshot GET regardless of segment count — and a
        caught-up poll adds NOTHING else (no per-segment reads, no
        data-plane touches). This is what makes a tight trigger interval
        affordable at 100k segments."""
        from druid_hadoop_utils_spark.sources import fs as fsmod
        from druid_hadoop_utils_spark.sources.fs import get_fs
        from druid_hadoop_utils_spark.sources.segments import (
            compact_manifests,
        )
        from druid_hadoop_utils_spark.streaming.changes_source import (
            SegmentAnnounceStreamReader,
        )

        monkeypatch.setenv("SPARK_GRAFT_DELAY_MS", "0")
        fsmod._CACHE.pop("delaysim", None)
        root = "delaysim://" + str(tmp_path / "tbl")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)
        compact_manifests(root, "docs")

        reader = SegmentAnnounceStreamReader(
            {"tableroot": root, "datasource": "docs"})
        fs = get_fs(root)

        fs.reset_counts()
        it, end = reader.read(reader.initialOffset())
        assert len(list(it)) == 3 and end == {"asOf": T1}
        first = dict(fs.op_counts)

        fs.reset_counts()
        it2, end2 = reader.read(end)  # caught up
        assert list(it2) == [] and end2 == end
        polled = dict(fs.op_counts)
        fsmod._CACHE.pop("delaysim", None)

        for counts in (first, polled):
            # one listing of _segments + one snapshot read; nothing per
            # segment, nothing per announce row
            assert counts.get("ls", 0) <= 2, counts
            assert counts.get("read_text", 0) <= 2, counts
            assert counts.get("list_files", 0) == 0, counts


class TestStreamVacuumFloor:
    def test_lagging_stream_floors_maintenance_vacuum(self, spark,
                                                      tmp_path):
        """The claim end-to-end: a named STREAM's registered checkpoint
        floors maintain_table's vacuum exactly like a batch consumer's —
        the view its next micro-batch diffs FROM survives maintenance,
        and catching up releases the floor."""
        from druid_hadoop_utils_spark.sources.maintenance import (
            maintain_table,
        )

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        seen: list = []

        def drain():
            q = stream_changes_foreach(
                spark, root, "docs", lambda f, a, b: seen.append((a, b)),
                checkpoint_dir=ckpt, consumer_name="streamer",
                available_now=True)
            q.awaitTermination(120)

        drain()  # checkpoint lands at T1
        assert list_consumers(root, "docs")["streamer"][
            "consumed_as_of"] == T1

        delete_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"})
        # maintenance with zero retention: the stream's floor keeps the
        # pre-delete view alive
        rep = maintain_table(spark, root, "docs")
        assert rep["consumer_floor_as_of"] == T1
        assert rep["vacuumed"] == []
        feed = read_changes(spark, root, "docs", T1)
        assert feed.count() > 0  # the diff-FROM view still resolves

        # the stream catches up; the floor advances; vacuum reclaims
        drain()
        t2 = latest_stamp(root, "docs")
        assert list_consumers(root, "docs")["streamer"][
            "consumed_as_of"] == t2
        rep2 = maintain_table(spark, root, "docs")
        assert rep2["consumer_floor_as_of"] == t2
        assert rep2["vacuumed"], "catch-up must release the floor"
        # the stream keeps working against the vacuumed table
        n = len(seen)
        drain()
        assert len(seen) == n  # caught up, no phantom batch
