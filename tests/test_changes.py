"""Row-level change feed between table views (sources/changes.py).

Pins the three properties the module exists for:

1. **Logical fidelity** — the feed between tag A and the current view
   equals exactly the net row changes DML made (update = old-row delete
   + new-row insert; delete = deletes only).
2. **Rewrite cancellation** — compaction between the two views nets to
   an EMPTY logical feed (physical mode still shows the rewrite, and
   its two sides are the same multiset).
3. **O(changed bytes)** — the scans stay inside ``changed_windows``'s
   file plan: untouched buckets are never read (inputFiles assertion),
   and partial-overshadow windows clip the feed to the overlap only.

The reference has no DML/change feed — this extends its overshadow
timeline (SURVEY.md §2 S2) like sources/dml.py extends the write path.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.sources.changes import (
    changed_windows,
    commit_consumed,
    consume_changes,
    read_changes,
    read_checkpoint,
)
from druid_hadoop_utils_spark.sources.dml import delete_where, update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import (
    compact_segments,
    vacuum,
)
from druid_hadoop_utils_spark.sources.tables import load_table

T1 = "2024-06-01T00:00:00+00:00"
T2 = "2024-06-02T00:00:00+00:00"


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("__time"), "event_id", "event_type", "value",
        "user_id")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestLogicalFeed:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory, spark, sf_dir):
        root = str(tmp_path_factory.mktemp("chg_dml"))
        publish_segments(_base(spark, sf_dir), root, "events",
                         version="v1", bucket="DAY", published_at=T1)
        update_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "click"},
                     set={"value": "value + 10"})
        return root

    def test_update_feed_is_old_delete_plus_new_insert(
            self, spark, sf_dir, root):
        feed = read_changes(spark, root, "events", T1)
        base = _base(spark, sf_dir)
        clicks = base.where(F.col("event_type") == "click")

        dels = feed.where(F.col("_change_type") == "delete")
        ins = feed.where(F.col("_change_type") == "insert")
        data_cols = [c for c in feed.columns
                     if c not in ("_change_type", "_n")]
        assert _rows(dels.select(*data_cols)) == _rows(clicks)
        assert _rows(ins.select(*data_cols)) == _rows(
            clicks.withColumn("value", F.col("value") + 10))
        # events rows are unique → every net count is 1
        assert feed.where(F.col("_n") != 1).count() == 0

    def test_untouched_rows_absent(self, spark, root):
        feed = read_changes(spark, root, "events", T1)
        assert feed.where(F.col("event_type") != "click").count() == 0

    def test_scans_stay_inside_changed_plan(self, spark, root):
        plan = changed_windows(root, "events", T1)
        feed = read_changes(spark, root, "events", T1, mode="physical")
        prefixes = tuple(sorted(plan))
        for f in feed.inputFiles():
            local = f.removeprefix("file://")
            assert local.startswith(prefixes), f
        # the update rewrote only buckets containing clicks, under ONE
        # new version: every changed path must carry BOTH sides (same
        # bucket, old file lost + new file gained)
        assert plan and all(
            sides["insert"] or sides["delete"] for sides in plan.values())

    def test_same_view_twice_is_empty_with_feed_schema(self, spark, root):
        feed = read_changes(spark, root, "events", T1, T1)
        assert feed.count() == 0
        assert "_change_type" in feed.columns and "_n" in feed.columns

    def test_mode_validation(self, spark, root):
        with pytest.raises(ValueError, match="mode"):
            read_changes(spark, root, "events", T1, mode="nope")

    def test_map_column_refuses_logical_mode(self, spark, tmp_path):
        # MapType cannot be a groupBy key: logical netting must refuse
        # loudly and point at physical mode, not die inside Catalyst
        from datetime import datetime

        from druid_hadoop_utils_spark.sources.segments import (
            write_segment,
        )

        root = str(tmp_path)
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1), {"k": "v"})],
            "`__time` timestamp, attrs map<string,string>")
        write_segment(df, root, "ev", "2024-01-01/2024-01-02", "v1")
        write_segment(df, root, "ev", "2024-01-01/2024-01-02", "v2")
        with pytest.raises(ValueError, match="map columns"):
            read_changes(spark, root, "ev",
                         "1970-01-01T00:00:00+00:00").collect()
        # physical mode still works on the same table
        phys = read_changes(spark, root, "ev",
                            "1970-01-01T00:00:00+00:00",
                            mode="physical")
        assert phys.count() == 1


class TestDeleteFeed:
    def test_delete_where_feed_is_deletes_only(self, spark, sf_dir,
                                               tmp_path):
        root = str(tmp_path)
        publish_segments(_base(spark, sf_dir), root, "events",
                         version="v1", bucket="DAY", published_at=T1)
        delete_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "error"})
        feed = read_changes(spark, root, "events", T1)
        assert feed.where(F.col("_change_type") == "insert").count() == 0
        dels = feed.where(F.col("_change_type") == "delete")
        expected = _base(spark, sf_dir).where(
            F.col("event_type") == "error")
        data_cols = [c for c in feed.columns
                     if c not in ("_change_type", "_n")]
        assert _rows(dels.select(*data_cols)) == _rows(expected)


class TestRewriteCancellation:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory, spark, sf_dir):
        root = str(tmp_path_factory.mktemp("chg_compact"))
        publish_segments(_base(spark, sf_dir), root, "events",
                         version="v1", bucket="DAY", published_at=T1)
        compact_segments(spark, root, "events", "2024-01-01/2024-03-01",
                         bucket="MONTH")
        return root

    def test_compaction_nets_to_empty_logical_feed(self, spark, root):
        feed = read_changes(spark, root, "events", T1)
        assert feed.count() == 0

    def test_physical_mode_shows_symmetric_rewrite(self, spark, root):
        feed = read_changes(spark, root, "events", T1, mode="physical")
        data_cols = [c for c in feed.columns
                     if c not in ("_change_type", "_n")]
        ins = feed.where(F.col("_change_type") == "insert")
        dels = feed.where(F.col("_change_type") == "delete")
        assert ins.count() == dels.count() > 0
        assert _rows(ins.select(*data_cols)) == _rows(
            dels.select(*data_cols))


class TestPartialOvershadow:
    def test_feed_clips_to_overshadowed_window(self, spark, sf_dir,
                                               tmp_path):
        # v1 is ONE January MONTH segment; v2 overshadows just
        # [01-05, 01-07) with doubled values. The month segment's
        # window SPLITS around the overlap — the feed must clip to the
        # overlap via interval subtraction, not whole-segment identity.
        root = str(tmp_path)
        base = _base(spark, sf_dir).where(
            (F.col("__time") >= F.lit(datetime(2024, 1, 1))) &
            (F.col("__time") < F.lit(datetime(2024, 2, 1))))
        publish_segments(base, root, "events", version="v1",
                         bucket="MONTH", published_at=T1)
        win = ((F.col("__time") >= F.lit(datetime(2024, 1, 5))) &
               (F.col("__time") < F.lit(datetime(2024, 1, 7))))
        v2 = base.where(win).withColumn("value", F.col("value") * 2)
        publish_segments(v2, root, "events", version="v2", bucket="DAY",
                         published_at=T2)

        feed = read_changes(spark, root, "events", T1)
        data_cols = [c for c in feed.columns
                     if c not in ("_change_type", "_n")]
        dels = feed.where(F.col("_change_type") == "delete")
        ins = feed.where(F.col("_change_type") == "insert")
        # deletes = exactly the v1 rows inside the overshadowed window
        # (the week segment's OTHER five days stay visible and must not
        # leak into the feed even though their file is scanned)
        assert _rows(dels.select(*data_cols)) == _rows(base.where(win))
        assert _rows(ins.select(*data_cols)) == _rows(v2)

    def test_unchanged_buckets_not_in_plan(self, spark, sf_dir, tmp_path):
        root = str(tmp_path)
        publish_segments(_base(spark, sf_dir), root, "events",
                         version="v1", bucket="DAY", published_at=T1)
        publish_segments(
            _base(spark, sf_dir).where(
                (F.col("__time") >= F.lit(datetime(2024, 1, 5))) &
                (F.col("__time") < F.lit(datetime(2024, 1, 6)))
            ).withColumn("value", F.col("value") * 2),
            root, "events", version="v2", bucket="DAY", published_at=T2)
        plan = changed_windows(root, "events", T1)
        # exactly two paths: the hidden v1 day and the v2 replacement
        assert len(plan) == 2
        sides = sorted(
            ("ins" if p["insert"] else "") + ("del" if p["delete"] else "")
            for p in plan.values())
        assert sides == ["del", "ins"]


class TestConsumer:
    """consume_changes / commit_consumed — the checkpointed incremental
    consumer loop over the feed."""

    def test_full_cycle(self, spark, sf_dir, tmp_path):
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "consumer.json")
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)

        # 1) first run: full snapshot as inserts
        feed, token = consume_changes(spark, root, "events", ckpt)
        assert feed.where(F.col("_change_type") != "insert").count() == 0
        assert feed.count() == base.count()
        assert read_checkpoint(ckpt) is None  # nothing committed yet
        commit_consumed(ckpt, token)
        assert read_checkpoint(ckpt) == token == T1

        # 2) nothing new: empty feed, same token, schema intact
        feed2, token2 = consume_changes(spark, root, "events", ckpt)
        assert token2 == token and feed2.count() == 0
        assert "_change_type" in feed2.columns

        # 3) DML lands: exactly its net changes
        delete_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "error"})
        feed3, token3 = consume_changes(spark, root, "events", ckpt)
        assert token3 > token
        assert feed3.where(F.col("_change_type") == "insert").count() == 0
        assert feed3.count() == base.where(
            F.col("event_type") == "error").count()
        # crash-before-commit: the SAME feed redelivers (at-least-once)
        feed3b, token3b = consume_changes(spark, root, "events", ckpt)
        assert token3b == token3 and feed3b.count() == feed3.count()
        commit_consumed(ckpt, token3)
        feed4, _ = consume_changes(spark, root, "events", ckpt)
        assert feed4.count() == 0

    def test_consumer_lag(self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.changes import consumer_lag

        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "c.json")
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)
        lag = consumer_lag(root, "events", ckpt)
        assert lag["consumed_as_of"] is None and lag["behind_s"] is None
        assert lag["pending_announces"] > 0

        _, token = consume_changes(spark, root, "events", ckpt)
        commit_consumed(ckpt, token)
        lag2 = consumer_lag(root, "events", ckpt)
        assert lag2["behind_s"] == 0.0
        assert lag2["pending_announces"] == 0

        delete_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "error"})
        lag3 = consumer_lag(root, "events", ckpt)
        assert lag3["behind_s"] > 0
        assert lag3["pending_announces"] > 0
        assert lag3["latest"] != lag3["consumed_as_of"]

    def test_mid_processing_publish_waits_whole(self, spark, sf_dir,
                                                tmp_path):
        # a publish landing AFTER the consume call resolved its token
        # must not leak into this cycle — and must arrive IN FULL next
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "c.json")
        base = _base(spark, sf_dir)
        # events spans January 2024 only — split mid-month
        early = base.where(F.col("__time") < F.lit(datetime(2024, 1, 15)))
        late = base.where(F.col("__time") >= F.lit(datetime(2024, 1, 15)))
        publish_segments(early, root, "events", version="v1",
                         bucket="DAY", published_at=T1)
        feed, token = consume_changes(spark, root, "events", ckpt)
        publish_segments(late, root, "events", version="v1",
                         bucket="DAY", published_at=T2)
        # the already-resolved feed still sees only the early half
        assert feed.count() == early.count()
        commit_consumed(ckpt, token)
        feed2, token2 = consume_changes(spark, root, "events", ckpt)
        assert token2 == T2
        assert feed2.count() == late.count() > 0
        assert feed2.where(F.col("_change_type") != "insert").count() == 0


class TestStreamedTable:
    def test_consumer_over_microbatch_publishes(self, spark, tmp_path):
        """Streaming publishes (streaming/ingest.py's writer calls
        write_segment per micro-batch; newer batch versions overshadow)
        stamp through the same announce path, so the consumer composes:
        a re-published hour arrives as delete(old)+insert(new), a new
        hour as pure inserts."""
        from datetime import datetime

        from pyspark.sql import Row

        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.segments import write_segment

        root = str(tmp_path / "stream_tbl")
        ckpt = str(tmp_path / "c.json")

        def rows(hour, vals):
            return spark.createDataFrame(
                [Row(__time=datetime(2024, 3, 1, hour, m), v=float(x))
                 for m, x in enumerate(vals)])

        def hour_iv(h):
            return Interval(datetime(2024, 3, 1, h),
                            datetime(2024, 3, 1, h + 1))

        # batch 0: hours 0 and 1
        write_segment(rows(0, [1, 2]), root, "ev", hour_iv(0),
                      "batch-000000000000")
        write_segment(rows(1, [3, 4]), root, "ev", hour_iv(1),
                      "batch-000000000000")
        feed, tok = consume_changes(spark, root, "ev", ckpt)
        assert feed.count() == 4
        assert feed.where(F.col("_change_type") != "insert").count() == 0
        commit_consumed(ckpt, tok)

        # batch 1: hour 1 re-published (value 4 -> 40) + hour 2 new
        write_segment(rows(1, [3, 40]), root, "ev", hour_iv(1),
                      "batch-000000000001")
        write_segment(rows(2, [5]), root, "ev", hour_iv(2),
                      "batch-000000000001")
        feed2, tok2 = consume_changes(spark, root, "ev", ckpt)
        got = sorted((r["_change_type"], r["v"]) for r in feed2.collect())
        # the unchanged hour-1 row (v=3) cancels; only the real delta shows
        assert got == [("delete", 4.0), ("insert", 5.0),
                       ("insert", 40.0)]
        commit_consumed(ckpt, tok2)
        feed3, _ = consume_changes(spark, root, "ev", ckpt)
        assert feed3.count() == 0


class TestTombstones:
    def test_drop_interval_feeds_as_deletes(self, spark, sf_dir,
                                            tmp_path):
        # a drop tombstone hides data without rewriting it: the feed
        # must read the hidden file and emit its rows as deletes, and
        # nothing else
        from druid_hadoop_utils_spark.sources.maintenance import (
            drop_interval,
        )

        root = str(tmp_path)
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)
        drop_interval(root, "events", "2024-01-05/2024-01-07")
        feed = read_changes(spark, root, "events", T1)
        assert feed.where(F.col("_change_type") == "insert").count() == 0
        dropped = base.where(
            (F.col("__time") >= F.lit(datetime(2024, 1, 5))) &
            (F.col("__time") < F.lit(datetime(2024, 1, 7))))
        data_cols = [c for c in feed.columns
                     if c not in ("_change_type", "_n")]
        assert _rows(feed.select(*data_cols)) == _rows(dropped)


class TestHorizon:
    def test_pre_horizon_view_refuses(self, spark, sf_dir, tmp_path):
        root = str(tmp_path)
        publish_segments(_base(spark, sf_dir), root, "events",
                         version="v1", bucket="DAY", published_at=T1)
        compact_segments(spark, root, "events", "2024-01-01/2024-03-01",
                         bucket="MONTH")
        vacuum(root, "events")
        with pytest.raises(ValueError, match="horizon"):
            read_changes(spark, root, "events", T1)


class TestSchemaEvolution:
    """Evolve-forward columns through the feed (round 13, VERDICT r12
    item 2): a column added between view A and view B reaches the feed
    schema, old-side rows carry NULL in it, and the caught-up EMPTY
    feed's schema probe finds it even with mixed published_at stamp
    formats."""

    T3 = "2024-06-03T00:00:00+00:00"

    def test_evolved_column_nulls_on_old_side(self, spark, sf_dir,
                                              tmp_path):
        root = str(tmp_path)
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)
        # the evolved segment: a NEW day bucket with an extra column
        # (no 'purchase' rows — the delete_where below must only touch
        # the OLD-schema side)
        evolved = (base.where(F.col("event_type") != "purchase").limit(3)
                   .withColumn("__time",
                               F.lit(datetime(2024, 3, 1)).cast("timestamp"))
                   .withColumn("lang", F.lit("en")))
        publish_segments(evolved, root, "events", version="v2",
                         bucket="DAY", published_at=T2)
        # and a DML delete on OLD-schema rows, so the feed carries both
        # sides of the evolution
        delete_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "purchase"})

        feed = read_changes(spark, root, "events", T1)
        assert "lang" in feed.columns
        ins = feed.where(F.col("_change_type") == "insert")
        dels = feed.where(F.col("_change_type") == "delete")
        # new-side rows carry the evolved column's values...
        assert ins.where(F.col("lang").isNull()).count() == 0
        assert ins.count() == 3
        # ...old-side rows net with NULL in it (the documented contract)
        assert dels.count() > 0
        assert dels.where(F.col("lang").isNotNull()).count() == 0

    def test_empty_feed_probe_parses_mixed_stamp_formats(
            self, spark, sf_dir, tmp_path):
        """String-comparing published_at picks '2024-06-01T12:00:00
        +02:00' (actual 10:00Z) over '2024-06-01T11:00:00Z' (actual
        11:00Z) — the OLDER segment — and the empty feed's schema
        would miss the evolved column. Stamps must be parsed."""
        root = str(tmp_path)
        base = _base(spark, sf_dir)
        s_old = "2024-06-01T12:00:00+02:00"  # actual 10:00Z
        s_new = "2024-06-01T11:00:00Z"       # actual 11:00Z, string-SMALLER
        assert s_new < s_old and _parse_stamp(s_new) > _parse_stamp(s_old)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=s_old)
        evolved = (base.limit(2)
                   .withColumn("__time",
                               F.lit(datetime(2024, 3, 1)).cast("timestamp"))
                   .withColumn("lang", F.lit("en")))
        publish_segments(evolved, root, "events", version="v2",
                         bucket="DAY", published_at=s_new)

        feed = read_changes(spark, root, "events", self.T3, self.T3)
        assert feed.count() == 0
        assert "lang" in feed.columns  # probed the PARSE-newest segment


def _parse_stamp(s):
    from druid_hadoop_utils_spark.sources.segments import _parse_as_of

    return _parse_as_of(s)


class TestConsumerEquivalence:
    """Randomized checkpointed-consumer equivalence (round 13, VERDICT
    r12 item 1b): a ``consume_changes`` loop maintaining a downstream
    aggregate across interleaved DML / publish / compaction / restore
    cycles must equal a FULL recompute of the current view at every
    commit point, and a crash before ``commit_consumed`` must redeliver
    the SAME feed (at-least-once, applied once by the token contract)."""

    SPEC = {"granularity": "NONE",
            "dimensions": ["event_id", "event_type", "user_id"],
            "metrics": [{"name": "value", "type": "double"}]}

    def _recompute(self, spark, root):
        from druid_hadoop_utils_spark.plans.planner import load

        df = load(spark, root, self.SPEC, interval="2024-01-01/2025-01-01",
                  data_source="events")
        return {r["event_type"]: (r["n"], r["s"])
                for r in df.groupBy("event_type")
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .collect()}

    @staticmethod
    def _feed_effect(feed):
        """The feed collapsed to per-event_type (Δn, Δsum) — what the
        downstream aggregate applies."""
        rows = (feed.groupBy("event_type").agg(
            F.sum(F.when(F.col("_change_type") == "insert", F.col("_n"))
                  .otherwise(-F.col("_n"))).alias("dn"),
            F.sum(F.when(F.col("_change_type") == "insert",
                         F.col("value") * F.col("_n"))
                  .otherwise(-F.col("value") * F.col("_n"))).alias("ds"))
            .collect())
        return {r["event_type"]: (r["dn"], r["ds"] or 0.0) for r in rows}

    @pytest.mark.slow
    def test_randomized_lifecycle_equivalence(self, spark, sf_dir,
                                              tmp_path):
        import random

        from druid_hadoop_utils_spark.sources.changes import latest_stamp
        from druid_hadoop_utils_spark.sources.maintenance import (
            next_version,
            restore_to,
        )

        rng = random.Random(13)
        root = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "consumer.json")
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)

        downstream: dict = {}

        def consume_and_apply(crash_first: bool):
            feed, token = consume_changes(spark, root, "events", ckpt)
            eff = self._feed_effect(feed)
            if crash_first:
                # crash-before-commit: the SAME feed redelivers
                feed2, token2 = consume_changes(spark, root, "events",
                                                ckpt)
                assert token2 == token
                assert self._feed_effect(feed2) == eff
            for k, (dn, ds) in eff.items():
                n, s = downstream.get(k, (0, 0.0))
                downstream[k] = (n + dn, s + ds)
            commit_consumed(ckpt, token)

        def check_equivalence():
            mine = {k: v for k, v in downstream.items() if v[0] != 0}
            full = self._recompute(spark, root)
            assert set(mine) == set(full), (set(mine), set(full))
            for k in full:
                assert mine[k][0] == full[k][0], k
                assert mine[k][1] == pytest.approx(full[k][1],
                                                   abs=1e-6), k

        # genesis: the full current view as inserts
        consume_and_apply(crash_first=False)
        check_equivalence()

        types = [r["event_type"] for r in
                 base.select("event_type").distinct().collect()]
        snapshots = []
        new_day = [0]

        def op_publish():
            new_day[0] += 1
            d = datetime(2024, 3, new_day[0])
            extra = (base.limit(7)
                     .withColumn("__time", F.lit(d).cast("timestamp"))
                     .withColumn("event_id",
                                 F.col("event_id") + 2000000 * new_day[0])
                     .withColumn("event_type", F.lit(f"extra{new_day[0]}")))
            publish_segments(extra, root, "events",
                             version=next_version(root, "events", "pub"),
                             bucket="DAY")

        def op_update():
            update_where(spark, root, "events",
                         {"type": "selector", "dimension": "event_type",
                          "value": rng.choice(types)},
                         set={"value": "value * 2 + 1"})

        def op_delete():
            delete_where(spark, root, "events",
                         {"type": "selector", "dimension": "event_type",
                          "value": rng.choice(types)})

        def op_compact():
            compact_segments(spark, root, "events",
                             "2024-01-01/2024-02-01", bucket="MONTH")

        def op_restore():
            if snapshots:
                restore_to(root, "events", snapshots.pop())

        ops = [op_publish, op_update, op_delete, op_compact, op_publish,
               op_restore, op_update, op_compact, op_restore, op_delete]
        rng.shuffle(ops)
        for i, op in enumerate(ops):
            snapshots.append(latest_stamp(root, "events"))
            rng.shuffle(snapshots)
            op()
            consume_and_apply(crash_first=(i % 3 == 1))
            check_equivalence()


class TestConsumerRegistry:
    """Registered consumer checkpoints (round 13): discoverable lag
    (list_consumers) and the maintain_table vacuum retention floor —
    a lagging consumer's diff-FROM view must survive maintenance, and
    catch-up releases the floor."""

    def test_checkpoint_path_validation(self, tmp_path):
        from druid_hadoop_utils_spark.sources.changes import (
            consumer_checkpoint_path,
        )

        root = str(tmp_path)
        p = consumer_checkpoint_path(root, "events", "feature_builder")
        assert p.endswith("/events/_consumers/feature_builder.json")
        with pytest.raises(ValueError, match="bare label"):
            consumer_checkpoint_path(root, "events", "a/b")
        with pytest.raises(ValueError, match="bare label"):
            consumer_checkpoint_path(root, "events", "_sneaky")

    def test_floor_protects_lagging_consumer_then_releases(
            self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.changes import (
            consumer_checkpoint_path,
            consumers_floor_as_of,
            list_consumers,
        )
        from druid_hadoop_utils_spark.sources.maintenance import (
            maintain_table,
        )

        root = str(tmp_path)
        base = _base(spark, sf_dir)
        publish_segments(base, root, "events", version="v1",
                         bucket="DAY", published_at=T1)
        assert list_consumers(root, "events") == {}
        assert consumers_floor_as_of(root, "events") is None

        ckpt = consumer_checkpoint_path(root, "events", "featgen")
        _, tok = consume_changes(spark, root, "events", ckpt)
        commit_consumed(ckpt, tok)
        lags = list_consumers(root, "events")
        assert set(lags) == {"featgen"} and lags["featgen"][
            "pending_announces"] == 0
        # the floor is the checkpoint INSTANT (tok == T1 here), not an
        # age — a fully-caught-up consumer pins exactly its own stamp
        assert consumers_floor_as_of(root, "events") == tok == T1

        delete_where(spark, root, "events",
                     {"type": "selector", "dimension": "event_type",
                      "value": "error"})
        n_err = base.where(F.col("event_type") == "error").count()

        # maintenance with default (0) retention: the floor must keep
        # the consumer's diff-FROM view alive through the vacuum
        rep = maintain_table(spark, root, "events")
        assert rep["consumer_floor_as_of"] == tok
        assert rep["vacuumed"] == []  # every old view is still needed
        feed = read_changes(spark, root, "events", tok)
        assert feed.count() == n_err  # the view at tok still resolves

        # consumer catches up to the delete's stamp; the floor advances
        # to it, and the next maintenance reclaims the pre-delete
        # history EXACTLY up to the checkpoint (cutoff == the instant,
        # so the view AT the checkpoint survives — boundary inclusive)
        feed2, tok2 = consume_changes(spark, root, "events", ckpt)
        assert feed2.count() == n_err
        commit_consumed(ckpt, tok2)
        assert consumers_floor_as_of(root, "events") == tok2
        rep2 = maintain_table(spark, root, "events")
        assert rep2["vacuumed"], "catch-up must release the floor"
        # the consumer keeps working against the vacuumed table
        feed3, _ = consume_changes(spark, root, "events", ckpt)
        assert feed3.count() == 0
