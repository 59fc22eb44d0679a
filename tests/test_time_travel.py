"""Time-travel reads over the versioned segment timeline.

Every manifest announce (publish, compaction, drop tombstone) carries a
``publishedAt`` stamp; ``list_manifests(as_of=...)`` / ``load(as_of=...)``
resolve the overshadow timeline over only the manifests announced by that
instant — reproducing exactly what a reader then saw. History is bounded
by physical ``vacuum``, which advances a horizon that makes earlier
``as_of`` reads refuse loudly (the Delta/Iceberg VACUUM-retention shape;
the reference's timeline is the live-only Druid 0.9 view —
DruidInputFormat.java:98-110 — so this is an engine extension).
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load, table_history, timeline_version
from druid_hadoop_utils_spark.api import druid_query
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import (
    drop_interval,
    vacuum,
)
from druid_hadoop_utils_spark.sources.segments import (
    compact_manifests,
    history_horizon,
    list_manifests,
    mark_history_horizon,
    publish_stamp,
)
from druid_hadoop_utils_spark.sources.tables import load_table

SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"}]}

T1 = "2024-06-01T00:00:00+00:00"   # v1 publish
T2 = "2024-06-02T00:00:00+00:00"   # v2 overshadow publish
MID = "2024-06-01T12:00:00"        # between the two (naive = UTC)
IV = "2024-01-03/2024-01-10"


@pytest.fixture(scope="class")
def root(tmp_path_factory, spark, sf_dir):
    """v1 = raw events; v2 re-publishes [01-05, 01-07) with value doubled."""
    root = str(tmp_path_factory.mktemp("ttravel"))
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value", "user_id")
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", published_at=T1)
    patch = ev.where(
        (F.col("ts") >= F.lit("2024-01-05")) & (F.col("ts") < F.lit("2024-01-07"))
    ).withColumn("value", F.col("value") * 2)
    publish_segments(patch, root, "events", version="v2", time_column="ts",
                     bucket="DAY", published_at=T2)
    return root


def _sum(df):
    return df.agg(F.round(F.sum("value"), 2)).first()[0]


class TestAsOfLoad:
    def test_as_of_between_sees_v1_only(self, spark, root):
        old = load(spark, root, SPEC, interval=IV, data_source="events",
                   as_of=MID)
        now = load(spark, root, SPEC, interval=IV, data_source="events")
        assert all("v=v1" in f for f in old.inputFiles())
        assert any("v=v2" in f for f in now.inputFiles())
        # the doubled window makes the sums provably differ
        assert _sum(old) < _sum(now)

    def test_as_of_after_equals_current(self, spark, root):
        late = load(spark, root, SPEC, interval=IV, data_source="events",
                    as_of="2024-06-03T00:00:00")
        now = load(spark, root, SPEC, interval=IV, data_source="events")
        assert _sum(late) == _sum(now)
        assert sorted(late.inputFiles()) == sorted(now.inputFiles())

    def test_as_of_before_first_publish_is_empty(self, spark, root):
        df = load(spark, root, SPEC, interval=IV, data_source="events",
                  as_of="2024-05-01T00:00:00")
        assert df.count() == 0  # ignoreWhenNoSegments shape
        with pytest.raises(FileNotFoundError):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of="2024-05-01T00:00:00", ignore_when_no_segments=False)

    def test_spec_json_as_of_field(self, spark, root):
        df = load(spark, root, dict(SPEC, asOf=MID), interval=IV,
                  data_source="events")
        assert all("v=v1" in f for f in df.inputFiles())

    def test_as_of_datetime_and_naive_equivalent(self, spark, root):
        aware = load(spark, root, SPEC, interval=IV, data_source="events",
                     as_of=datetime(2024, 6, 1, 12, 0, tzinfo=timezone.utc))
        naive = load(spark, root, SPEC, interval=IV, data_source="events",
                     as_of=MID)
        assert sorted(aware.inputFiles()) == sorted(naive.inputFiles())

    def test_timeline_version_varies_with_as_of(self, spark, root):
        v_old = timeline_version(root, "events", as_of=MID)
        v_now = timeline_version(root, "events")
        assert v_old != v_now
        # stable: the as_of view is immutable
        assert v_old == timeline_version(root, "events", as_of=MID)


class TestTombstoneAndHistory:
    def test_drop_rewinds(self, spark, root):
        before_drop = publish_stamp()
        drop_interval(root, "events", "2024-01-08/2024-01-09")
        gone = load(spark, root, SPEC, interval="2024-01-08/2024-01-09",
                    data_source="events")
        assert gone.count() == 0
        still = load(spark, root, SPEC, interval="2024-01-08/2024-01-09",
                     data_source="events", as_of=before_drop)
        assert still.count() > 0

    def test_table_history_log(self, spark, root):
        hist = table_history(root, "events")
        stamps = [h["publishedAt"] for h in hist]
        assert all(s is not None for s in stamps)
        assert stamps == sorted(stamps)
        versions = {h["version"] for h in hist}
        assert {"v1", "v2"} <= versions
        assert any(h["tombstone"] for h in hist)
        # v1 days under the doubled window are overshadowed → not visible
        hidden = [h for h in hist if h["version"] == "v1" and not h["visible"]]
        assert hidden

    def test_as_of_survives_manifest_compaction(self, spark, root):
        old = sorted(load(spark, root, SPEC, interval=IV,
                          data_source="events", as_of=MID).inputFiles())
        compact_manifests(root, "events")
        assert sorted(load(spark, root, SPEC, interval=IV,
                           data_source="events", as_of=MID).inputFiles()) == old
        # stamps survive the snapshot round-trip
        assert all(m.published_at is not None
                   for m in list_manifests(root, "events"))


class TestDruidQueryAsOf:
    def test_groupby_as_of(self, spark, root):
        q = {"queryType": "groupBy", "dataSource": "events",
             "granularity": "ALL", "dimensions": ["event_type"],
             "intervals": ["2024-01-05/2024-01-07"],
             "aggregations": [{"type": "doubleSum", "name": "value",
                               "fieldName": "value"}]}
        now = druid_query(spark, root, q)
        old = druid_query(spark, root, dict(q, asOf=MID))
        n = now.agg(F.sum("value")).first()[0]
        o = old.agg(F.sum("value")).first()[0]
        assert abs(n - 2 * o) < 1e-6  # the window was doubled in v2

    def test_as_of_skips_materialized_rewrite(self, spark, root):
        from druid_hadoop_utils_spark.sources.materialize import (
            materialize_aggs,
        )

        materialize_aggs(
            spark, root, "events", "tt_daily", ["event_type"],
            [{"type": "doubleSum", "name": "value", "fieldName": "value"}],
            granularity="DAY", time_column="__time",
        )
        q = {"queryType": "groupBy", "dataSource": "events",
             "granularity": "DAY", "dimensions": ["event_type"],
             "intervals": ["2024-01-05/2024-01-07"],
             "aggregations": [{"type": "doubleSum", "name": "value",
                               "fieldName": "value"}]}
        # current view: states answer (require mode proves coverage)
        req = druid_query(spark, root, dict(
            q, context={"useMaterialized": "require"}))
        assert all("_materialized" in f for f in req.inputFiles())
        # as_of: the rewrite must NOT answer — and require must refuse
        old = druid_query(spark, root, dict(q, asOf=MID))
        assert all("_materialized" not in f for f in old.inputFiles())
        with pytest.raises(ValueError, match="asOf"):
            druid_query(spark, root, dict(
                q, asOf=MID, context={"useMaterialized": "require"}))

    def test_cache_key_distinguishes_as_of(self):
        from druid_hadoop_utils_spark.sources.cache import query_cache_key

        q = {"queryType": "groupBy", "dataSource": "events",
             "granularity": "ALL", "dimensions": ["event_type"],
             "intervals": [IV], "aggregations": []}
        assert query_cache_key(q, "events") != query_cache_key(
            dict(q, asOf=MID), "events")


class TestVacuumHorizon:
    def test_vacuum_advances_horizon_and_refuses_old_as_of(
            self, spark, tmp_path, sf_dir):
        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(ev.withColumn("value", F.col("value") + 1),
                         root, "events", version="v2", time_column="ts",
                         bucket="DAY", published_at=T2)
        assert history_horizon(root, "events") is None
        # dry-run must not advance the horizon
        vacuum(root, "events", dry_run=True)
        assert history_horizon(root, "events") is None
        removed = vacuum(root, "events")
        assert removed
        horizon = history_horizon(root, "events")
        assert horizon is not None
        with pytest.raises(ValueError, match="horizon"):
            list_manifests(root, "events", as_of=MID)
        with pytest.raises(ValueError, match="horizon"):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of=MID)
        # at/after the horizon still reads fine (current view)
        df = load(spark, root, SPEC, interval=IV, data_source="events",
                  as_of=horizon)
        assert df.count() > 0
        # a second vacuum with nothing to remove keeps the horizon put
        assert vacuum(root, "events") == []
        assert history_horizon(root, "events") == horizon

    def test_horizon_only_moves_forward(self, tmp_path, spark, sf_dir):
        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
        publish_segments(ev.limit(10), root, "events", version="v1",
                         time_column="ts", bucket="DAY")
        mark_history_horizon(root, "events", "2024-06-05T00:00:00+00:00")
        mark_history_horizon(root, "events", "2024-06-01T00:00:00+00:00")
        assert history_horizon(root, "events").isoformat() == (
            "2024-06-05T00:00:00+00:00")


class TestRetentionVacuum:
    """vacuum(retain_history_s=N): the Delta RETAIN shape — reclaim only
    what NO as_of view since the cutoff needs; horizon moves to the
    cutoff, so time travel within the window survives the vacuum."""

    def _three_versions(self, spark, sf_dir, root):
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value").limit(200)
        for i, (v, t) in enumerate([("v1", T1), ("v2", T2),
                                    ("v3", "2024-06-03T00:00:00+00:00")]):
            publish_segments(ev.withColumn("value", F.col("value") + i),
                             root, "events", version=v, time_column="ts",
                             bucket="DAY", published_at=t)

    def test_window_covering_everything_reclaims_nothing(
            self, spark, tmp_path, sf_dir):
        root = str(tmp_path)
        self._three_versions(spark, sf_dir, root)
        # cutoff decades before T1: every historical view is retained
        assert vacuum(root, "events", retain_history_s=2.0e9) == []
        assert history_horizon(root, "events") is None

    def test_cutoff_between_versions_keeps_intermediate(
            self, spark, tmp_path, sf_dir):
        root = str(tmp_path)
        self._three_versions(spark, sf_dir, root)
        # cutoff strictly between T2 and T3: the views since the cutoff
        # are {v2 visible} and {v3 visible} — v1 is needed by none and
        # reclaims; v2, though CURRENTLY overshadowed, must survive
        cut = datetime(2024, 6, 2, 12, tzinfo=timezone.utc)
        retain = (datetime.now(timezone.utc) - cut).total_seconds()
        removed = vacuum(root, "events", retain_history_s=retain)
        assert removed and all("_v1_" in r for r in removed)
        left = {m.version for m in list_manifests(root, "events")}
        assert left == {"v2", "v3"}
        # time travel to the v2 era (at/after the cutoff) still works
        # and sees v2 files
        old = load(spark, root, SPEC, interval=IV, data_source="events",
                   as_of="2024-06-02T18:00:00")
        assert old.count() >= 0 and all(
            "v=v2" in f for f in old.inputFiles())
        # horizon landed at the cutoff, not "now"
        h = history_horizon(root, "events")
        assert abs((h - cut).total_seconds()) < 120
        with pytest.raises(ValueError, match="horizon"):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of=MID)

    def test_second_vacuum_without_retention_finishes_the_job(
            self, spark, tmp_path, sf_dir):
        root = str(tmp_path)
        self._three_versions(spark, sf_dir, root)
        cut = datetime(2024, 6, 2, 12, tzinfo=timezone.utc)
        retain = (datetime.now(timezone.utc) - cut).total_seconds()
        vacuum(root, "events", retain_history_s=retain)
        removed = vacuum(root, "events")  # default: no retention
        assert removed and all("_v2_" in r for r in removed)
        assert {m.version for m in list_manifests(root, "events")} == {"v3"}


class TestStampMechanics:
    def test_publish_stamp_monotonic(self):
        stamps = [publish_stamp() for _ in range(50)]
        assert stamps == sorted(stamps) and len(set(stamps)) == 50

    def test_unstamped_legacy_manifest_always_visible(self, tmp_path, spark,
                                                      sf_dir):
        import json
        import os

        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
        publish_segments(ev.limit(50), root, "events", version="v1",
                         time_column="ts", bucket="DAY")
        # strip the stamps (simulating pre-feature manifests)
        mdir = os.path.join(root, "events", "_segments")
        for name in os.listdir(mdir):
            p = os.path.join(mdir, name)
            obj = json.loads(open(p).read())
            obj.pop("publishedAt", None)
            open(p, "w").write(json.dumps(obj))
        ms = list_manifests(root, "events", as_of="1990-01-01T00:00:00")
        assert ms and all(m.published_at is None for m in ms)

    def test_objectsim_backend_round_trip(self, spark, sf_dir, tmp_path):
        # the horizon file + stamped manifests through the no-rename
        # object-store simulation backend
        root = "objectsim://" + str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where(F.col("ts") < F.lit("2024-01-05")),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        old = load(spark, root, SPEC, interval=IV, data_source="events",
                   as_of=MID)
        assert all("v=v1" in f for f in old.inputFiles())
        assert vacuum(root, "events")
        assert history_horizon(root, "events") is not None
        with pytest.raises(ValueError, match="horizon"):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of=MID)


def test_streaming_publishes_are_time_travel_views(spark, tmp_path):
    """Composition with streaming ingest: segment_publishing_writer goes
    through write_segment, so every micro-batch publish is stamped — and
    load(as_of=) reproduces the table exactly as it stood after any given
    micro-batch. A streamed table's history is auditable, not a silent
    latest-only view (the reference's Druid-0.9 timeline is live-only;
    DruidInputFormat.java:98-110)."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.streaming.ingest import (
        segment_publishing_writer,
        streaming_rollup,
    )

    src = str(tmp_path / "tt_stream_in")
    table_root = str(tmp_path / "tt_stream_tables")
    spec = {"granularity": "NONE", "dimensions": ["event_type"],
            "metrics": [{"name": "value", "type": "double"},
                        {"name": "n", "type": "long"}]}
    schema = "ts timestamp, event_type string, value double"

    def run_stream():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        rolled = streaming_rollup(
            stream, dims=["event_type"],
            aggs=[F.sum("value").alias("value"), F.count("*").alias("n")])
        q = segment_publishing_writer(
            rolled, table_root, "sev",
            checkpoint_dir=str(tmp_path / "tt_stream_ckpt"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    # micro-batch round 1: hour-0 events + a sentinel that closes hour 0
    spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, 0, 5), event_type="a", value=1.0),
         Row(ts=datetime(2024, 1, 1, 0, 25), event_type="a", value=2.0),
         Row(ts=datetime(2024, 1, 1, 3, 30), event_type="sentinel",
             value=9.0)],
        schema).coalesce(1).write.parquet(src + "/c0")
    run_stream()
    hist1 = [h for h in table_history(table_root, "sev") if h["publishedAt"]]
    assert hist1, "round 1 published nothing"
    stamp1 = max(h["publishedAt"] for h in hist1)

    # micro-batch round 2: hour-4 events (ahead of round 1's 03:20
    # watermark — earlier events would be dropped as late) + a later
    # sentinel that closes both hour 3 (round 1's sentinel) and hour 4
    spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, 4, 10), event_type="b", value=5.0),
         Row(ts=datetime(2024, 1, 1, 7, 0), event_type="sentinel2",
             value=9.0)],
        schema).coalesce(1).write.parquet(src + "/c1")
    run_stream()

    def rows(as_of=None):
        df = load(spark, table_root, spec, interval="2024-01-01/2024-01-02",
                  data_source="sev", as_of=as_of)
        return {(r["event_type"], r["value"], r["n"])
                for r in df.collect()}

    # as of the round-1 stamp: exactly the hour-0 rollup round 1 published
    assert rows(as_of=stamp1) == {("a", 3.0, 2)}
    # current view: round 2 closed hour 3 (round 1's sentinel) and hour 4
    assert rows() == {("a", 3.0, 2), ("sentinel", 9.0, 1), ("b", 5.0, 1)}
    # streamed manifests are stamped monotonically (round 2 strictly later)
    hist2 = [h for h in table_history(table_root, "sev") if h["publishedAt"]]
    assert max(h["publishedAt"] for h in hist2) > stamp1


class TestTags:
    """Named snapshot tags (segments.create_tag): metadata-only pins of
    an as_of view that load/druid_query resolve via as_of="tag:<name>",
    that vacuum preserves until deleted, and that the result cache
    fingerprints by RESOLVED instant (a moved tag can't serve staleness).
    The lineage answer for training runs: (table_root, tag), not a
    copied dataset."""

    def test_create_list_delete_roundtrip(self, root):
        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            delete_tag,
            list_tags,
        )

        t = create_tag(root, "events", "run-a")
        assert t["asOf"] == T2  # default = latest announce stamp
        t_old = create_tag(root, "events", "run-b", as_of=MID)
        got = list_tags(root, "events")
        assert [x["name"] for x in got] == ["run-b", "run-a"]  # oldest first
        assert delete_tag(root, "events", "run-b") is True
        assert delete_tag(root, "events", "run-b") is False
        assert [x["name"] for x in list_tags(root, "events")] == ["run-a"]
        assert t_old["asOf"].startswith("2024-06-01T12:00:00")

    def test_tag_read_equals_stamp_read(self, spark, root):
        from druid_hadoop_utils_spark.sources.segments import create_tag

        create_tag(root, "events", "pre-fix", as_of=MID)
        tagged = load(spark, root, SPEC, interval=IV, data_source="events",
                      as_of="tag:pre-fix")
        stamped = load(spark, root, SPEC, interval=IV, data_source="events",
                       as_of=MID)
        assert _sum(tagged) == _sum(stamped)
        assert sorted(tagged.inputFiles()) == sorted(stamped.inputFiles())

    def test_druid_query_json_tag_as_of(self, spark, root):
        from druid_hadoop_utils_spark.sources.segments import create_tag

        create_tag(root, "events", "q-tag", as_of=MID)
        q = {"queryType": "timeseries", "dataSource": "events",
             "granularity": "ALL", "intervals": [IV],
             "aggregations": [{"type": "doubleSum", "name": "v",
                               "fieldName": "value"}]}
        via_tag = druid_query(spark, root, dict(q, asOf="tag:q-tag"))
        via_stamp = druid_query(spark, root, dict(q, asOf=MID))
        assert via_tag.collect() == via_stamp.collect()

    def test_unknown_tag_and_bad_name_raise(self, root):
        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            resolve_as_of,
        )

        create_tag(root, "events", "known")
        with pytest.raises(ValueError, match="unknown tag.*known"):
            resolve_as_of(root, "events", "tag:nope")
        with pytest.raises(ValueError, match="invalid tag name"):
            create_tag(root, "events", "../escape")
        with pytest.raises(ValueError, match="immutable"):
            create_tag(root, "events", "known")
        # replace=True moves it
        moved = create_tag(root, "events", "known", as_of=MID, replace=True)
        assert moved["asOf"].startswith("2024-06-01T12:00:00")
        with pytest.raises(ValueError, match="instant, not another tag"):
            create_tag(root, "events", "meta", as_of="tag:known")

    def test_vacuum_preserves_tagged_view_until_deleted(self, spark, root):
        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            delete_tag,
            list_tags,
        )

        # earlier tests in this class left tags on the shared root —
        # each is a retention floor, so clear them to isolate this one
        for t in list_tags(root, "events"):
            delete_tag(root, "events", t["name"])
        create_tag(root, "events", "train-run", as_of=MID)
        v1_sum = _sum(load(spark, root, SPEC, interval=IV,
                           data_source="events", as_of="tag:train-run"))
        # the tag is a standing retention floor: every segment currently
        # invisible is still needed by some view since MID, so NOTHING
        # reclaims — and with no physical history lost, the horizon
        # stays unset (every as_of still resolves exactly)
        assert vacuum(root, "events") == []
        assert history_horizon(root, "events") is None
        assert _sum(load(spark, root, SPEC, interval=IV,
                         data_source="events", as_of="tag:train-run")
                    ) == v1_sum
        # delete the tag: the next vacuum reclaims the overshadowed v1
        # days and the horizon moves to now
        assert delete_tag(root, "events", "train-run")
        removed = vacuum(root, "events")
        assert len(removed) == 2 and all("v1" in r for r in removed)
        with pytest.raises(ValueError, match="horizon"):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of=MID)

    def test_vacuum_reclaims_pre_tag_history_horizon_stops_at_tag(
            self, spark, sf_dir, tmp_path):
        """A tag pinned AFTER the overshadow: the v1 days the fix replaced
        are invisible in every view from the tag forward, so vacuum
        reclaims them — but the horizon advances only TO the tag, and the
        tagged read keeps working."""
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where((F.col("ts") >= F.lit("2024-01-05"))
                     & (F.col("ts") < F.lit("2024-01-07"))
                     ).withColumn("value", F.col("value") * 2),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        post_fix = "2024-06-03T00:00:00+00:00"
        create_tag(root, "events", "post-fix", as_of=post_fix)
        want = _sum(load(spark, root, SPEC, interval=IV,
                         data_source="events", as_of="tag:post-fix"))
        removed = vacuum(root, "events")
        assert len(removed) == 2 and all("v1" in r for r in removed)
        # horizon stopped at the tag, not at now
        assert history_horizon(root, "events").isoformat() == post_fix
        assert _sum(load(spark, root, SPEC, interval=IV,
                         data_source="events", as_of="tag:post-fix")
                    ) == want
        with pytest.raises(ValueError, match="horizon"):
            load(spark, root, SPEC, interval=IV, data_source="events",
                 as_of=MID)

    def test_default_tag_after_full_vacuum_pins_current_view(
            self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where((F.col("ts") >= F.lit("2024-01-05"))
                     & (F.col("ts") < F.lit("2024-01-07"))),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        vacuum(root, "events")  # horizon -> now, past both stamps
        # explicit as_of below the horizon refuses...
        with pytest.raises(ValueError, match="predates the history horizon"):
            create_tag(root, "events", "late", as_of=MID)
        # ...but the DEFAULT pins the current view (stamp = horizon)
        t = create_tag(root, "events", "current")
        cur = _sum(load(spark, root, SPEC, interval=IV,
                        data_source="events"))
        assert _sum(load(spark, root, SPEC, interval=IV,
                         data_source="events", as_of="tag:current")) == cur
        assert t["asOf"] == history_horizon(root, "events").isoformat()

    def test_cache_fingerprints_resolved_instant(self, spark, sf_dir,
                                                 tmp_path):
        from druid_hadoop_utils_spark.sources.cache import (
            cached_druid_query,
        )
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where((F.col("ts") >= F.lit("2024-01-05"))
                     & (F.col("ts") < F.lit("2024-01-07"))
                     ).withColumn("value", F.col("value") * 2),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        create_tag(root, "events", "corpus", as_of=MID)
        q = {"queryType": "timeseries", "dataSource": "events",
             "granularity": "ALL", "intervals": [IV], "asOf": "tag:corpus",
             "aggregations": [{"type": "doubleSum", "name": "v",
                               "fieldName": "value"}]}
        v1_val = cached_druid_query(spark, root, "events", q).first()["v"]
        # move the tag to the post-v2 instant: the SAME query JSON must
        # re-fingerprint (resolved instant changed) — a hit on the old
        # entry would serve the old view
        create_tag(root, "events", "corpus", as_of=T2, replace=True)
        v2_val = cached_druid_query(spark, root, "events", q).first()["v"]
        direct = druid_query(spark, root, dict(q, asOf=T2)).first()["v"]
        assert v2_val == direct and v2_val != v1_val

    def test_objectsim_backend_tags(self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            list_tags,
        )

        root = "objectsim://" + str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where(F.col("ts") < F.lit("2024-01-05")),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        create_tag(root, "events", "pin", as_of=MID)
        assert [t["name"] for t in list_tags(root, "events")] == ["pin"]
        assert vacuum(root, "events") == []  # the tagged view holds it
        old = load(spark, root, SPEC, interval=IV, data_source="events",
                   as_of="tag:pin")
        assert all("v=v1" in f for f in old.inputFiles())


class TestCloneView:
    """clone_view (sources/ingest.py): materialize a resolved view —
    current, instant, or tag — as a fresh independent managed table via
    one distributed publish job."""

    def _totals(self, spark, root, ds, as_of=None):
        df = load(spark, root, SPEC, interval=IV, data_source=ds,
                  as_of=as_of)
        return (_sum(df), df.count())

    def test_clone_tag_view_rows_equal_and_independent(self, spark, sf_dir,
                                                       tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import clone_view
        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            delete_tag,
        )

        # own source root: this test vacuums it, which would advance the
        # shared class fixture's horizon under later tests
        src = str(tmp_path / "clone_src_root")
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id")
        publish_segments(ev, src, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        publish_segments(
            ev.where((F.col("ts") >= F.lit("2024-01-05"))
                     & (F.col("ts") < F.lit("2024-01-07"))
                     ).withColumn("value", F.col("value") * 2),
            src, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        create_tag(src, "events", "clone-src", as_of=MID)
        dest = str(tmp_path / "clone_dest")
        out = clone_view(spark, src, "events", dest, as_of="tag:clone-src")
        assert out  # one manifest per day bucket
        want = self._totals(spark, src, "events", as_of="tag:clone-src")
        assert self._totals(spark, dest, "events") == want
        # independence: deleting the tag and vacuuming the SOURCE cannot
        # break the clone (it holds its own data, not references)
        delete_tag(src, "events", "clone-src")
        vacuum(src, "events")
        assert self._totals(spark, dest, "events") == want

    def test_clone_current_view_partial_overshadow_faithful(
            self, spark, sf_dir, tmp_path):
        """v2 re-publishes a HALF-day inside a v1 DAY segment: the clone
        must reproduce the windowed view (v1 rows outside the patch +
        doubled rows inside), not resurrect the overshadowed half."""
        from druid_hadoop_utils_spark.sources.ingest import clone_view
        from druid_hadoop_utils_spark.sources.segments import write_segment
        from druid_hadoop_utils_spark.sources.tables import load_table

        src = str(tmp_path / "partial_src")
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id"
        ).withColumnRenamed("ts", "__time")
        day = ev.where((F.col("__time") >= F.lit("2024-01-03"))
                       & (F.col("__time") < F.lit("2024-01-04")))
        write_segment(day, src, "events", "2024-01-03/2024-01-04", "v1",
                      published_at=T1)
        patch = day.where(F.hour("__time") < 12).withColumn(
            "value", F.col("value") * 2)
        write_segment(patch, src, "events",
                      "2024-01-03T00:00:00/2024-01-03T12:00:00", "v2",
                      published_at=T2)
        dest = str(tmp_path / "partial_dest")
        clone_view(spark, src, "events", dest, bucket="DAY")
        src_view = load(spark, src, SPEC, interval="2024-01-03/2024-01-04",
                        data_source="events")
        dest_view = load(spark, dest, SPEC,
                         interval="2024-01-03/2024-01-04",
                         data_source="events")
        assert _sum(dest_view) == _sum(src_view)
        assert dest_view.count() == src_view.count()
        # the clone is SINGLE-version: no overshadow left to resolve
        assert all("v=v1" in f for f in dest_view.inputFiles())

    def test_clone_provenance_marker_and_cross_backend(self, spark, root,
                                                       tmp_path):
        import json
        import os

        from druid_hadoop_utils_spark.sources.ingest import clone_view
        from druid_hadoop_utils_spark.sources.segments import create_tag

        create_tag(root, "events", "ship", as_of=MID, replace=True)
        dest = "objectsim://" + str(tmp_path / "obj_dest")
        clone_view(spark, root, "events", dest, dest_data_source="ev2",
                   as_of="tag:ship")
        # reads back through the object-store-sim backend
        want = self._totals(spark, root, "events", as_of="tag:ship")
        assert self._totals(spark, dest, "ev2") == want
        marker_path = os.path.join(str(tmp_path / "obj_dest"), "ev2",
                                   "_clone.json")
        marker = json.loads(open(marker_path).read())
        assert marker["tag"] == "ship"
        assert marker["sourceDataSource"] == "events"
        assert marker["asOf"].startswith("2024-06-01T12:00:00")
        assert marker["segments"] >= 1

    def test_clone_interval_clip(self, spark, root, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import clone_view

        dest = str(tmp_path / "clip_dest")
        clone_view(spark, root, "events", dest,
                   interval="2024-01-04/2024-01-06")
        full = load(spark, root, SPEC, interval="2024-01-04/2024-01-06",
                    data_source="events")
        clipped = load(spark, dest, SPEC, interval=IV,
                       data_source="events")
        assert clipped.count() == full.count()
        assert _sum(clipped) == _sum(full)


class TestTagReviewFixes:
    """Regressions for the round-7 review findings on tags/clone."""

    def _mk(self, spark, sf_dir, tmp_path):
        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value").limit(200)
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        return root

    def test_future_tag_refused(self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = self._mk(spark, sf_dir, tmp_path)
        with pytest.raises(ValueError, match="in the future"):
            create_tag(root, "events", "oops", as_of="2099-01-01T00:00:00")

    def test_legacy_future_tag_does_not_brick_horizon(self, spark, sf_dir,
                                                      tmp_path):
        """A future-dated tag written before create_tag validated (or by
        hand) must not drive the vacuum horizon into the future."""
        import json
        import os

        from druid_hadoop_utils_spark.sources.segments import (
            list_manifests,
        )

        root = self._mk(spark, sf_dir, tmp_path)
        # overshadow a day so the vacuum has something to reclaim
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value").limit(200)
        publish_segments(ev.where(F.col("ts") < F.lit("2024-01-02")),
                         root, "events", version="v2", time_column="ts",
                         bucket="DAY", published_at=T2)
        tdir = os.path.join(root, "events", "_segments", "_tags")
        os.makedirs(tdir)
        open(os.path.join(tdir, "legacy.json"), "w").write(json.dumps(
            {"name": "legacy", "asOf": "2099-01-01T00:00:00+00:00",
             "createdAt": T2}))
        removed = vacuum(root, "events")
        assert removed  # the overshadowed v1 day reclaimed
        h = history_horizon(root, "events")
        from datetime import datetime, timezone

        assert h is not None and h <= datetime.now(timezone.utc)
        # recent as_of views still resolve
        assert list_manifests(root, "events", as_of=h.isoformat())

    def test_typod_datasource_refused_and_no_tags_dir_left(
            self, spark, sf_dir, tmp_path):
        import os

        from druid_hadoop_utils_spark.sources.segments import (
            create_tag,
            list_manifests,
        )

        root = self._mk(spark, sf_dir, tmp_path)
        with pytest.raises(FileNotFoundError, match="evnets"):
            create_tag(root, "evnets", "t1", as_of=MID)
        assert not os.path.exists(os.path.join(root, "evnets"))
        # the missing-table error stays loud
        with pytest.raises(FileNotFoundError):
            list_manifests(root, "evnets")

    def test_default_stamp_is_chronological_not_lexicographic(
            self, spark, sf_dir, tmp_path):
        """'...00Z' sorts lexicographically AFTER '...00.500000+00:00'
        though it is chronologically earlier — the default tag must pin
        the chronologically latest announce."""
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = str(tmp_path)
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value").limit(50)
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY",
                         published_at="2024-06-01T12:00:00Z")
        publish_segments(ev, root, "events", version="v2", time_column="ts",
                         bucket="DAY",
                         published_at="2024-06-01T12:00:00.500000+00:00")
        t = create_tag(root, "events", "latest")
        assert t["asOf"] == "2024-06-01T12:00:00.500000+00:00"

    def test_clone_disjoint_interval_refuses(self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.ingest import clone_view

        root = self._mk(spark, sf_dir, tmp_path / "src")
        with pytest.raises(FileNotFoundError, match="does not intersect"):
            clone_view(spark, root, "events", str(tmp_path / "dst"),
                       interval="1990-01-01/1990-01-02")


class TestRestore:
    """restore_to (sources/maintenance.py): the Delta-RESTORE analogue —
    re-announce a historical view as the CURRENT view, metadata-only."""

    T3 = "2024-06-03T00:00:00+00:00"

    def _mk(self, spark, sf_dir, tmp_path, with_new_interval=True):
        """v1 all days (T1); v2 doubles [01-05,01-07) (T2); optional v3
        adds a brand-new month of data (T3)."""
        from druid_hadoop_utils_spark.sources.segments import create_tag

        root = str(tmp_path / "restore_root")
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value", "user_id")
        publish_segments(ev, root, "events", version="v1", time_column="ts",
                         bucket="DAY", published_at=T1)
        create_tag(root, "events", "good", as_of=MID)
        publish_segments(
            ev.where((F.col("ts") >= F.lit("2024-01-05"))
                     & (F.col("ts") < F.lit("2024-01-07"))
                     ).withColumn("value", F.col("value") * 2),
            root, "events", version="v2", time_column="ts", bucket="DAY",
            published_at=T2)
        if with_new_interval:
            feb = ev.limit(40).withColumn(
                "ts", F.col("ts") + F.expr("INTERVAL 31 DAYS"))
            publish_segments(feb, root, "events", version="v3",
                             time_column="ts", bucket="DAY",
                             published_at=self.T3)
        return root

    def _read(self, spark, root, interval=IV, as_of=None):
        return load(spark, root, SPEC, interval=interval,
                    data_source="events", as_of=as_of)

    def test_restore_makes_current_equal_old_view(self, spark, sf_dir,
                                                  tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import restore_to

        root = self._mk(spark, sf_dir, tmp_path)
        want = (_sum(self._read(spark, root, as_of="tag:good")),
                self._read(spark, root, as_of="tag:good").count())
        out = restore_to(root, "events", "tag:good")
        assert out  # re-announces + at least the feb tombstone
        got = self._read(spark, root)
        assert (_sum(got), got.count()) == want
        # the interval that only existed AFTER the tag reads empty now
        feb = self._read(spark, root, interval="2024-02-01/2024-03-01")
        assert feb.count() == 0
        # idempotent: a second restore to the same instant is a no-op
        assert restore_to(root, "events", "tag:good") == []

    def test_restore_is_itself_time_travelable(self, spark, sf_dir,
                                               tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import restore_to

        root = self._mk(spark, sf_dir, tmp_path)
        bad_sum = _sum(self._read(spark, root))  # doubled window visible
        restore_to(root, "events", "tag:good")
        # just before the restore the bad state is still auditable
        pre_restore = self.T3  # after v3, before the restore announce
        assert _sum(self._read(spark, root, as_of=pre_restore)) == bad_sum
        feb_then = self._read(spark, root,
                              interval="2024-02-01/2024-03-01",
                              as_of=pre_restore)
        assert feb_then.count() > 0

    def test_vacuum_after_restore_keeps_shared_dirs(self, spark, sf_dir,
                                                    tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import restore_to
        from druid_hadoop_utils_spark.sources.segments import delete_tag

        root = self._mk(spark, sf_dir, tmp_path)
        want = (_sum(self._read(spark, root, as_of="tag:good")),
                self._read(spark, root, as_of="tag:good").count())
        restore_to(root, "events", "tag:good")
        delete_tag(root, "events", "good")  # drop the retention floor
        removed = vacuum(root, "events")
        # the original-v1 manifests (overshadowed by the re-announce),
        # the v2 overshadow, and the tombstoned v3 all reclaim...
        assert any("v1" in r for r in removed)
        assert any("v2" in r for r in removed)
        assert any("v3" in r for r in removed)
        # ...but the re-announced segments still read: their data dirs
        # were shared with the removed v1 manifests and must survive
        got = self._read(spark, root)
        assert (_sum(got), got.count()) == want

    def test_partial_overshadow_refuses_with_clone_hint(self, spark,
                                                        sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import restore_to
        from druid_hadoop_utils_spark.sources.segments import write_segment

        root = str(tmp_path / "partial_root")
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value").withColumnRenamed("ts", "__time")
        day = ev.where((F.col("__time") >= F.lit("2024-01-03"))
                       & (F.col("__time") < F.lit("2024-01-04")))
        write_segment(day, root, "events", "2024-01-03/2024-01-04", "v1",
                      published_at=T1)
        write_segment(day.where(F.hour("__time") < 12), root, "events",
                      "2024-01-03T00:00:00/2024-01-03T12:00:00", "v2",
                      published_at=T2)
        # a later full-day re-publish makes the partial view historical
        write_segment(day, root, "events", "2024-01-03/2024-01-04", "v3",
                      published_at=self.T3)
        with pytest.raises(ValueError, match="PARTIALLY.*clone_view"):
            restore_to(root, "events", "2024-06-02T12:00:00")
        # restoring to the CURRENT instant stays a clean no-op
        assert restore_to(root, "events", "2024-06-04T00:00:00") == []

    def test_dry_run_registers_nothing(self, spark, sf_dir, tmp_path):
        from druid_hadoop_utils_spark.sources.maintenance import restore_to

        root = self._mk(spark, sf_dir, tmp_path)
        before = _sum(self._read(spark, root))
        planned = restore_to(root, "events", "tag:good", dry_run=True)
        assert planned and any(m.tombstone for m in planned)
        assert _sum(self._read(spark, root)) == before  # unchanged


def test_restore_to_pre_history_instant_refuses(spark, sf_dir, tmp_path):
    """Review regression: an as_of before the first stamped publish is an
    EMPTY view — restoring to it would tombstone the entire table behind
    a typo'd year. It must refuse like reads do, not mass-delete."""
    from druid_hadoop_utils_spark.sources.maintenance import restore_to

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").limit(100)
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", published_at=T1)
    before = load(spark, root, SPEC, interval=IV,
                  data_source="events").count()
    with pytest.raises(FileNotFoundError, match="no manifest was announced"):
        restore_to(root, "events", "2020-01-01T00:00:00")
    # nothing was tombstoned
    assert load(spark, root, SPEC, interval=IV,
                data_source="events").count() == before


def test_restore_objectsim_backend_round_trip(spark, sf_dir, tmp_path):
    """restore_to through the no-rename object-store simulation: the
    re-announce manifests and tombstones publish via atomic puts, and
    the refcounted vacuum keeps the shared dirs — same as local."""
    from druid_hadoop_utils_spark.sources.maintenance import (
        restore_to,
        vacuum,
    )
    from druid_hadoop_utils_spark.sources.segments import (
        create_tag,
        delete_tag,
    )

    root = "objectsim://" + str(tmp_path)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").limit(300)
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", published_at=T1)
    create_tag(root, "events", "good")
    publish_segments(ev.withColumn("value", F.col("value") * 100),
                     root, "events", version="v2", time_column="ts",
                     bucket="DAY", published_at=T2)

    def total():
        return _sum(load(spark, root, SPEC, interval=IV,
                         data_source="events"))

    want = _sum(load(spark, root, SPEC, interval=IV, data_source="events",
                     as_of="tag:good"))
    assert restore_to(root, "events", "tag:good")
    assert total() == want
    delete_tag(root, "events", "good")
    assert vacuum(root, "events")  # reclaims v2 + overshadowed originals
    assert total() == want  # shared dirs survived through objectsim://


@pytest.mark.slow
def test_restore_randomized_soundness_sweep(spark, sf_dir, tmp_path):
    """Randomized soundness: for random publish histories (full-day
    segments, so no partial-overshadow refusals) and a random historical
    instant, the rows AFTER restore_to(instant) must equal the rows
    load(as_of=instant) returned BEFORE the restore — for every seed."""
    import random

    from druid_hadoop_utils_spark.sources.maintenance import restore_to

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").where(
        (F.col("ts") >= F.lit("2024-01-03")) & (F.col("ts") < F.lit("2024-01-07")))
    days = ["2024-01-03", "2024-01-04", "2024-01-05", "2024-01-06"]

    def rows(root, as_of=None):
        df = load(spark, root, SPEC, interval="2024-01-03/2024-01-07",
                  data_source="events", as_of=as_of)
        return sorted((r["event_type"], round(r["value"], 3),
                       str(r["__time"])) for r in df.collect())

    for seed in range(4):
        rng = random.Random(seed)
        root = str(tmp_path / f"rr{seed}")
        stamps = []
        for k in range(4):  # 4 publish generations of random day subsets
            stamp = f"2024-06-0{k + 1}T00:00:00+00:00"
            chosen = [d for d in days if rng.random() < 0.7]
            if not chosen and k == 0:
                chosen = days[:1]
            factor = float(k + 1)
            for d in chosen:
                end = days[days.index(d) + 1] if days.index(d) + 1 < len(
                    days) else "2024-01-07"
                part = ev.where((F.col("ts") >= F.lit(d))
                                & (F.col("ts") < F.lit(end))).withColumn(
                    "value", F.col("value") * factor
                ).withColumnRenamed("ts", "__time")
                from druid_hadoop_utils_spark.sources.segments import (
                    write_segment,
                )

                write_segment(part, root, "events", f"{d}/{end}",
                              f"v{k + 1}", published_at=stamp)
            if chosen:
                stamps.append(stamp)
        target = rng.choice(stamps)
        want = rows(root, as_of=target)
        restore_to(root, "events", target)
        assert rows(root) == want, f"seed {seed} as_of {target}"


def test_diff_views_added_removed_rewindowed(spark, sf_dir, tmp_path):
    """diff_views: the audit answer to 'what changed between run A and
    run B' — keyed by DATA identity (path), so a restore's re-announce
    of the same bytes is not a change, while a partial overshadow shows
    up as a rewindow."""
    from druid_hadoop_utils_spark.sources.maintenance import restore_to
    from druid_hadoop_utils_spark.sources.segments import (
        diff_views,
        write_segment,
    )

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").withColumnRenamed("ts", "__time")
    d3 = ev.where((F.col("__time") >= F.lit("2024-01-03"))
                  & (F.col("__time") < F.lit("2024-01-04")))
    d4 = ev.where((F.col("__time") >= F.lit("2024-01-04"))
                  & (F.col("__time") < F.lit("2024-01-05")))
    write_segment(d3, root, "events", "2024-01-03/2024-01-04", "v1",
                  published_at=T1)
    # B adds day 4, half-overshadows day 3 (rewindow), at T2
    write_segment(d4, root, "events", "2024-01-04/2024-01-05", "v2",
                  published_at=T2)
    write_segment(d3.where(F.hour("__time") < 12), root, "events",
                  "2024-01-03T00:00:00/2024-01-03T12:00:00", "v2",
                  published_at=T2)

    d = diff_views(root, "events", MID)  # A = v1-only view, B = current
    assert [x["interval"] for x in d["added"]] == [
        "2024-01-03T00:00:00+00:00/2024-01-03T12:00:00+00:00",
        "2024-01-04T00:00:00+00:00/2024-01-05T00:00:00+00:00"]
    assert d["removed"] == []
    assert len(d["rewindowed"]) == 1
    rw = d["rewindowed"][0]
    assert rw["a"]["windows"] == [
        "2024-01-03T00:00:00+00:00/2024-01-04T00:00:00+00:00"]
    assert rw["b"]["windows"] == [
        "2024-01-03T12:00:00+00:00/2024-01-04T00:00:00+00:00"]
    # identical instants diff empty; tag names resolve
    assert diff_views(root, "events", MID, MID) == {
        "added": [], "removed": [], "rewindowed": []}
    from druid_hadoop_utils_spark.sources.segments import create_tag

    create_tag(root, "events", "a", as_of=MID)
    assert diff_views(root, "events", "tag:a", MID) == {
        "added": [], "removed": [], "rewindowed": []}


def test_restore_is_one_atomic_manifest_put(spark, sf_dir, tmp_path):
    """The whole restore lands as ONE snapshot-shaped manifest file (a
    single atomic put) — a crash mid-restore can never leave a mixed
    half-restored view."""
    import os

    from druid_hadoop_utils_spark.sources.maintenance import restore_to
    from druid_hadoop_utils_spark.sources.segments import create_tag

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value")
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", published_at=T1)
    create_tag(root, "events", "good")
    publish_segments(ev.withColumn("value", F.col("value") * 2),
                     root, "events", version="v2", time_column="ts",
                     bucket="DAY", published_at=T2)
    mdir = os.path.join(root, "events", "_segments")
    before = set(os.listdir(mdir))
    announced = restore_to(root, "events", "tag:good")
    assert len(announced) > 1  # many segments re-announced...
    new_files = set(os.listdir(mdir)) - before
    assert len(new_files) == 1  # ...through exactly one new file
    assert next(iter(new_files)).startswith("0-snapshot-restore-")
    want = _sum(load(spark, root, SPEC, interval=IV, data_source="events",
                     as_of="tag:good"))
    assert _sum(load(spark, root, SPEC, interval=IV,
                     data_source="events")) == want


def test_restore_multishard_group_inside_snapshot(spark, sf_dir, tmp_path):
    """A sharded publish restores as a GROUP entry inside the restore
    snapshot: all shards re-announce together (atomic flip), and the
    timeline parses the group-inside-snapshot shape back correctly."""
    from druid_hadoop_utils_spark.sources.maintenance import restore_to
    from druid_hadoop_utils_spark.sources.segments import (
        create_tag,
        list_manifests,
    )

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").where(
        (F.col("ts") >= F.lit("2024-01-03")) & (F.col("ts") < F.lit("2024-01-05")))
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", shards_per_bucket=3, published_at=T1)
    create_tag(root, "events", "good")
    publish_segments(ev.withColumn("value", F.col("value") * 9),
                     root, "events", version="v2", time_column="ts",
                     bucket="DAY", shards_per_bucket=3, published_at=T2)
    want = _sum(load(spark, root, SPEC, interval=IV, data_source="events",
                     as_of="tag:good"))
    announced = restore_to(root, "events", "tag:good")
    # 2 day buckets x 3 shards re-announced
    assert len([m for m in announced if not m.tombstone]) == 6
    assert _sum(load(spark, root, SPEC, interval=IV,
                     data_source="events")) == want
    # every re-announced shard parses back with the restore version
    restored = [m for m in list_manifests(root, "events")
                if m.version.endswith("-restore")]
    assert sorted(m.shard_num for m in restored
                  if m.interval.start.day == 3) == [0, 1, 2]
