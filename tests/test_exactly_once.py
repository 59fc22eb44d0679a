"""BatchLedger: exactly-once effects over the at-least-once change feed
(VERDICT r14 "what's missing" item 2).

The crash window under test: a batch's effects are durable but Spark's
offset checkpoint write is lost, so the restarted stream re-delivers
the batch with identical (from, to] bounds. A naive accumulating
consumer double-counts; one whose single commit point is a
``BatchLedger.commit`` keyed by the stamp pair does not.
"""

from __future__ import annotations

import shutil
from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.sources.dml import update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.streaming.changes_source import (
    BatchLedger,
    stream_changes_foreach,
)

T1 = "2024-06-01T00:00:00+00:00"


def _rows(n=12):
    return [Row(__time=datetime(2024, 1, 1 + i % 3, i % 4),
                doc_id=i, lang="en" if i % 2 else "de",
                score=float(i)) for i in range(n)]


def _delta(feed) -> int:
    d = feed.groupBy().agg(
        F.sum(F.when(F.col("_change_type") == "insert", F.col("_n"))
              .otherwise(-F.col("_n"))).alias("dn")).collect()[0]
    return int(d["dn"] or 0)


class TestExactlyOnceReplay:
    def _run(self, spark, tmp_path, process, consumer_name="eo"):
        """Publish → drain → snapshot ckpt → DML → drain → restore ckpt
        (the lost-offset-write crash) → drain (replay) → drain (idle)."""
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        backup = str(tmp_path / "sck_backup")

        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        def drain():
            q = stream_changes_foreach(
                spark, root, "docs", process, checkpoint_dir=ckpt,
                consumer_name=consumer_name, available_now=True)
            q.awaitTermination(120)

        drain()
        shutil.copytree(ckpt, backup)
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 1"})
        drain()
        shutil.rmtree(ckpt)
        shutil.copytree(backup, ckpt)
        drain()   # replay of batch 2
        drain()   # caught up

    @pytest.mark.slow
    def test_naive_unnamed_consumer_double_counts(self, spark,
                                                  tmp_path):
        """The failure mode the ledger exists for, on an UNNAMED stream
        (no registry → no replay clamp): the lost-offset-write replay
        re-delivers the completed batch and a naive accumulator applies
        it twice. If this ever stops double-counting, the delivery
        contract changed and the ledger docs must be revisited. (A
        NAMED stream clamps replays to its registered checkpoint — see
        test_named_stream_clamps_completed_replay — which shrinks but
        does NOT close the idempotency window: a crash between
        `process`'s external effect and the in-band registry commit
        still re-delivers.)"""
        state = {"rows": 0, "applied": 0}

        def process(feed, a, b):
            state["rows"] += _delta(feed)
            state["applied"] += 1

        self._run(spark, tmp_path, process, consumer_name=None)
        assert state["applied"] == 3   # GENESIS + update + its replay
        assert state["rows"] == 12     # net row delta of the update is 0
        # ...12 only because the update's net delta happens to be 0;
        # an aggregate the update DOES move would be wrong here (see
        # the ledgered twin below asserting score sums)

    @pytest.mark.slow
    def test_named_stream_clamps_completed_replay(self, spark,
                                                  tmp_path):
        """The same crash window on a NAMED stream: the registry commit
        survived, so the replayed trigger is skipped whole — the naive
        accumulator sees each batch once (round 15 clamp)."""
        state = {"applied": 0}

        def process(feed, a, b):
            feed.count()
            state["applied"] += 1

        self._run(spark, tmp_path, process, consumer_name="eo")
        assert state["applied"] == 2   # GENESIS + update; replay skipped

    def test_ledgered_consumer_applies_each_batch_once(self, spark,
                                                       tmp_path):
        ledger = BatchLedger(str(tmp_path / "ledger"))
        applied = []

        def process(feed, a, b):
            if ledger.committed(a, b) is not None:
                return
            prev = ledger.latest()
            s = dict((prev or {"payload": {"rows": 0, "score": 0.0}})
                     ["payload"])
            d = feed.groupBy().agg(
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("_n")).otherwise(-F.col("_n"))
                      ).alias("dn"),
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("score") * F.col("_n"))
                      .otherwise(-F.col("score") * F.col("_n"))
                      ).alias("ds")).collect()[0]
            s["rows"] += int(d["dn"] or 0)
            s["score"] += float(d["ds"] or 0.0)
            assert ledger.commit(a, b, s)
            applied.append((a, b))

        self._run(spark, tmp_path, process)
        assert len(applied) == 2          # replay skipped
        final = ledger.latest()["payload"]
        # 12 rows, sum(0..11) = 66, +1 on the 6 'de' rows (even ids)
        assert final == {"rows": 12, "score": 72.0}
        assert len(ledger.entries()) == 2

    @pytest.mark.slow
    def test_widened_replay_bounds_never_double_fold(self, spark,
                                                     tmp_path):
        """Offset checkpoint lost AND a new publish lands before
        restart (no vacuum involved): the replayed trigger covers
        (T1, t3], but the wrapper clamps delivery to the registry — so
        the ledger sees the fresh (t2, t3] pair, folds only the missing
        delta, and the committed (GENESIS..t2] state is never applied
        twice."""
        ledger = BatchLedger(str(tmp_path / "ledger"))
        pairs = []

        def process(feed, a, b):
            if ledger.committed(a, b) is not None:
                return
            prev = ledger.latest()
            s = dict((prev or {"payload": {"rows": 0, "score": 0.0}})
                     ["payload"])
            d = feed.groupBy().agg(
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("_n")).otherwise(-F.col("_n"))
                      ).alias("dn"),
                F.sum(F.when(F.col("_change_type") == "insert",
                             F.col("score") * F.col("_n"))
                      .otherwise(-F.col("score") * F.col("_n"))
                      ).alias("ds")).collect()[0]
            s["rows"] += int(d["dn"] or 0)
            s["score"] += float(d["ds"] or 0.0)
            assert ledger.commit(a, b, s)
            pairs.append((a, b))

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        backup = str(tmp_path / "sck_backup")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        def drain():
            q = stream_changes_foreach(
                spark, root, "docs", process, checkpoint_dir=ckpt,
                consumer_name="eo", available_now=True)
            q.awaitTermination(120)

        drain()                                  # GENESIS -> T1
        shutil.copytree(ckpt, backup)
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "de"},
                     set={"score": "score + 1"})
        drain()                                  # (T1, t2]
        # crash window + a new publish before restart
        shutil.rmtree(ckpt)
        shutil.copytree(backup, ckpt)
        update_where(spark, root, "docs",
                     {"type": "selector", "dimension": "lang",
                      "value": "en"},
                     set={"score": "score + 10"})
        drain()                                  # clamped: (t2, t3]
        drain()                                  # caught up

        assert len(pairs) == 3
        final = ledger.latest()["payload"]
        # 12 rows; sum(0..11)=66, +1 x 6 'de' (even ids), +10 x 6 'en'
        assert final == {"rows": 12, "score": 132.0}

    def test_half_processed_batch_reruns_to_same_commit(self, spark,
                                                        tmp_path):
        """Crash BEFORE the ledger commit: the rerun recomputes the
        identical fold and commits once — the deterministic-replay side
        of the contract."""
        ledger = BatchLedger(str(tmp_path / "ledger"))
        crash_once = {"armed": False}

        def process(feed, a, b):
            if ledger.committed(a, b) is not None:
                return
            prev = ledger.latest()
            s = dict((prev or {"payload": {"rows": 0}})["payload"])
            s["rows"] += _delta(feed)
            if crash_once["armed"]:
                crash_once["armed"] = False
                raise RuntimeError("injected crash before commit")
            ledger.commit(a, b, s)

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "sck")
        publish_segments(spark.createDataFrame(_rows()), root, "docs",
                         version="v1", bucket="DAY", published_at=T1)

        def drain(expect_fail=False):
            from pyspark.errors.exceptions.captured import (
                StreamingQueryException,
            )

            q = stream_changes_foreach(
                spark, root, "docs", process, checkpoint_dir=ckpt,
                consumer_name="eo", available_now=True)
            if expect_fail:
                with pytest.raises(StreamingQueryException,
                                   match="injected crash"):
                    q.awaitTermination(120)
            else:
                q.awaitTermination(120)

        crash_once["armed"] = True
        drain(expect_fail=True)            # dies mid-batch, no commit
        assert ledger.latest() is None
        drain()                            # rerun converges
        assert ledger.latest()["payload"] == {"rows": 12}
        assert len(ledger.entries()) == 1


class TestLedgerPrimitive:
    def test_commit_is_first_writer_wins(self, tmp_path):
        lg = BatchLedger(str(tmp_path / "lg"))
        assert lg.commit("a1", "b1", {"v": 1}) is True
        assert lg.commit("a1", "b1", {"v": 2}) is False
        assert lg.committed("a1", "b1") == {"v": 1}

    def test_objectsim_backend_conditional_create(self, tmp_path):
        lg = BatchLedger("objectsim://" + str(tmp_path / "lg"))
        assert lg.commit("a1", "b1", {"v": 1}) is True
        assert lg.commit("a1", "b1", {"v": 2}) is False
        assert lg.committed("a1", "b1") == {"v": 1}
        assert lg.committed("a1", "b2") is None

    def test_distinct_pairs_are_distinct_entries(self, tmp_path):
        lg = BatchLedger(str(tmp_path / "lg"))
        # same TO stamp, different FROM (a re-baselined GENESIS batch)
        # must NOT collide with the incremental batch's entry
        assert lg.commit("a1", "b1", 1)
        assert lg.commit("genesis", "b1", 2)
        assert lg.committed("a1", "b1") == 1
        assert lg.committed("genesis", "b1") == 2

    def test_prune_keeps_newest(self, tmp_path):
        lg = BatchLedger(str(tmp_path / "lg"))
        for i in range(5):
            assert lg.commit(f"a{i}", f"b{i}", i)
        assert lg.prune(keep=2) == 3
        left = lg.entries()
        assert [e["payload"] for e in left] == [3, 4]
        assert lg.latest()["payload"] == 4
