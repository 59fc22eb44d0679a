"""Per-segment aggregate-state materialization: incremental maintenance,
MVCC soundness, merge correctness (exact aggs == raw-row query; sketch
estimates == direct sketch query)."""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.materialize import (
    materialize_aggs,
    query_materialized,
    vacuum_materialized,
)

AGGS = [
    {"type": "count", "name": "n"},
    {"type": "doubleSum", "name": "total", "fieldName": "value"},
    {"type": "longMax", "name": "vmax", "fieldName": "value"},
    {"type": "hyperUnique", "name": "users", "fieldName": "user_id"},
]


def _events(spark, days, per_day=24):
    rows = [
        Row(ts=datetime(2024, 1, d, h), event_type=("click" if h % 2 else "view"),
            value=float(d * 100 + h), user_id=(d * 7 + h) % 11)
        for d in days for h in range(per_day)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "mat_root")
    publish_segments(_events(spark, [1, 2, 3]), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    return root


def _direct(spark, root, interval="2024-01-01/2024-02-01"):
    """Ground truth: the same rollup over raw rows through load()."""
    from druid_hadoop_utils_spark import load
    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate

    df = load(spark, root, {"granularity": "DAY",
                            "dimensions": ["event_type"],
                            "metrics": [{"name": "value", "type": "double"},
                                        {"name": "user_id", "type": "long"}]},
              interval=interval, data_source="ev")
    return group_aggregate(df, ["event_type"], AGGS)


def _as_map(df):
    return {(r["__time"], r["event_type"]):
            (r["n"], round(r["total"], 6), r["vmax"], round(r["users"], 6))
            for r in df.collect()}


def test_materialized_equals_raw_query(spark, table):
    done = materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    assert len(done) == 3  # one state per day segment
    got = _as_map(query_materialized(spark, table, "ev", "daily"))
    want = _as_map(_direct(spark, table))
    assert got == want
    assert len(got) == 6  # 3 days x 2 event types


def test_incremental_new_segment_only(spark, table):
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    publish_segments(_events(spark, [4]), table, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    done = materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    assert len(done) == 1 and "2024-01-04" in done[0]
    got = _as_map(query_materialized(spark, table, "ev", "daily"))
    assert got == _as_map(_direct(spark, table))
    assert len(got) == 8


def test_missing_state_fails_loudly_then_catches_up(spark, table):
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    publish_segments(_events(spark, [5]), table, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    with pytest.raises(FileNotFoundError, match="no state"):
        query_materialized(spark, table, "ev", "daily")
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    assert len(_as_map(query_materialized(spark, table, "ev", "daily"))) == 8


def test_overshadow_uses_new_version_state(spark, table):
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    # replace day 2 with different data at v2 — old state must be ignored
    repl = _events(spark, [2]).withColumn("value", F.col("value") * 10)
    publish_segments(repl, table, "ev", version="v2",
                     time_column="ts", bucket="DAY")
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    got = _as_map(query_materialized(spark, table, "ev", "daily"))
    assert got == _as_map(_direct(spark, table))


def test_interval_filter_on_buckets(spark, table):
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    got = _as_map(query_materialized(spark, table, "ev", "daily",
                                     interval="2024-01-02/2024-01-03"))
    want = _as_map(_direct(spark, table, interval="2024-01-02/2024-01-03"))
    assert got == want and len(got) == 2


def test_non_mergeable_agg_rejected(spark, table):
    with pytest.raises(ValueError, match="non-mergeable"):
        materialize_aggs(spark, table, "ev", "bad", ["event_type"],
                         [{"type": "doubleFirst", "name": "f",
                           "fieldName": "value"}])


def test_spec_change_under_same_name_rejected(spark, table):
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    with pytest.raises(ValueError, match="different spec"):
        materialize_aggs(spark, table, "ev", "daily", [], AGGS)


def test_vacuum_drops_unlisted_states(spark, table):
    from druid_hadoop_utils_spark.sources.maintenance import (
        drop_interval,
        vacuum,
    )

    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    drop_interval(table, "ev", "2024-01-03/2024-01-04")
    vacuum(table, "ev")
    gone = vacuum_materialized(table, "ev", "daily")
    assert len(gone) == 1 and "2024-01-03" in gone[0]
    # remaining states still answer the surviving interval correctly
    got = _as_map(query_materialized(spark, table, "ev", "daily",
                                     interval="2024-01-01/2024-01-03"))
    assert got == _as_map(_direct(spark, table,
                                  interval="2024-01-01/2024-01-03"))


def test_partial_overshadow_refuses_loudly(spark, table):
    """A half-day v2 segment overshadows part of day 2: day 2's
    whole-segment state would over-count, so the query must refuse."""
    from druid_hadoop_utils_spark.sources.segments import write_segment

    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    half = spark.createDataFrame([
        Row(ts=datetime(2024, 1, 2, 1), event_type="click",
            value=9.0, user_id=1)]).withColumnRenamed("ts", "__time")
    write_segment(half, table, "ev", "2024-01-02T00:00:00/2024-01-02T12:00:00",
                  version="v2")
    with pytest.raises(ValueError, match="partially visible"):
        query_materialized(spark, table, "ev", "daily")


def test_query_reads_states_only(spark, table):
    """The 100 TB contract in the plan itself: the state-merge query's
    scan reads ONLY _materialized paths — the raw segment parquet never
    appears."""
    materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    files = query_materialized(spark, table, "ev", "daily").inputFiles()
    assert files, "expected parquet inputs"
    raw = [f for f in files if "_materialized" not in f]
    assert not raw, f"raw segment files in the states-only query: {raw[:3]}"


@pytest.mark.slow
def test_randomized_publish_sequences_match_direct(spark, tmp_path):
    """Property sweep: random publish/replace sequences over random day
    layouts — after catching states up, the states-only query equals the
    raw-row query EXACTLY (sums/counts/min/max) for every seed. Partial
    overshadows never arise here (publishes are whole-day), so every
    layout must answer, not refuse."""
    import random

    exact_aggs = [
        {"type": "count", "name": "n"},
        {"type": "doubleSum", "name": "total", "fieldName": "value"},
        {"type": "longMin", "name": "vmin", "fieldName": "user_id"},
        {"type": "longMax", "name": "vmax", "fieldName": "user_id"},
    ]
    for seed in range(4):
        rng = random.Random(seed)
        root = str(tmp_path / f"rand_{seed}")
        # 2-4 publishes, each covering 1-3 random days at increasing
        # versions (later versions overshadow whole days)
        for step in range(rng.randint(2, 4)):
            days = rng.sample(range(1, 6), rng.randint(1, 3))
            df = _events(spark, days, per_day=rng.randint(3, 8)) \
                .withColumn("value", F.col("value") + step)
            publish_segments(df, root, "ev", version=f"v{step}",
                             time_column="ts", bucket="DAY")
        materialize_aggs(spark, root, "ev", "rnd", ["event_type"],
                         exact_aggs)
        from druid_hadoop_utils_spark import load
        from druid_hadoop_utils_spark.functions.aggregators import (
            group_aggregate,
        )

        raw = load(spark, root, {"granularity": "DAY",
                                 "dimensions": ["event_type"],
                                 "metrics": [{"name": "value", "type": "double"},
                                             {"name": "user_id", "type": "long"}]},
                   interval="2024-01-01/2024-02-01", data_source="ev")
        want = {(r["__time"], r["event_type"]):
                (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
                for r in group_aggregate(raw, ["event_type"],
                                         exact_aggs).collect()}
        got = {(r["__time"], r["event_type"]):
               (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
               for r in query_materialized(spark, root, "ev", "rnd").collect()}
        assert got == want, f"seed {seed}"


def test_streaming_published_segments_materialize_incrementally(
    spark, tmp_path
):
    """End-to-end composition: a stream publishes hourly segments
    (streaming/ingest.segment_publishing_writer); materialize_aggs then
    maintains an HOURLY rollup state per published segment, and a second
    micro-batch round only materializes the newly published segments."""
    from druid_hadoop_utils_spark.streaming.ingest import (
        segment_publishing_writer,
        streaming_rollup,
    )

    src = str(tmp_path / "stream_in")
    first = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, h, m), event_type=t, value=float(v))
         for h, m, t, v in [(0, 5, "a", 1), (0, 25, "a", 2), (0, 45, "b", 3),
                            (3, 30, "sentinel", 9)]])
    first.coalesce(1).write.parquet(src + "/c0")

    table_root = str(tmp_path / "stream_tables")
    aggs = [{"type": "doubleSum", "name": "value", "fieldName": "value"},
            {"type": "longSum", "name": "n", "fieldName": "n"}]

    def run_stream():
        stream = spark.readStream.schema(first.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        rolled = streaming_rollup(
            stream, dims=["event_type"],
            aggs=[F.sum("value").alias("value"), F.count("*").alias("n")])
        q = segment_publishing_writer(
            rolled, table_root, "sev",
            checkpoint_dir=str(tmp_path / "stream_ckpt"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_stream()
    done = materialize_aggs(spark, table_root, "sev", "hourly",
                            ["event_type"], aggs, granularity="HOUR")
    assert done, "first round materialized nothing"
    n_first = len(done)

    # second micro-batch round: later events close the hour-3 window
    second = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 3, 0, 0), event_type="late_sentinel",
             value=0.0)])
    second.coalesce(1).write.parquet(src + "/c1")
    run_stream()
    done2 = materialize_aggs(spark, table_root, "sev", "hourly",
                             ["event_type"], aggs, granularity="HOUR")
    # incremental: the first round's segments are never recomputed
    assert all(d not in done for d in done2)

    out = {(r["__time"].hour, r["event_type"]): (r["value"], r["n"])
           for r in query_materialized(
               spark, table_root, "sev", "hourly",
               interval="2024-01-01/2024-01-02").collect()}
    assert out[(0, "a")] == (3.0, 2)
    assert out[(0, "b")] == (3.0, 1)
    assert n_first >= 1 and len(done2) >= 1


def test_filtered_and_histogram_aggs_materialize(spark, table):
    """filtered (inner mergeable) and approxHistogram states materialize
    and merge: the states-only answers equal the raw-row query — the
    filter applied once at materialize time, the histogram quantile
    evaluated from the merged self-describing struct state."""
    from druid_hadoop_utils_spark import load
    from druid_hadoop_utils_spark.functions.aggregators import (
        group_aggregate,
    )

    aggs = [
        {"type": "filtered",
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "click"},
         "aggregator": {"type": "doubleSum", "name": "click_value",
                        "fieldName": "value"}},
        {"type": "filtered",
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "click"},
         "aggregator": {"type": "count", "name": "click_n"}},
        {"type": "approxHistogram", "name": "p50", "fieldName": "value",
         "lowerLimit": 0.0, "upperLimit": 400.0, "numBuckets": 64,
         "probability": 0.5},
    ]
    materialize_aggs(spark, table, "ev", "filtered_hist", [], aggs)
    got = {r["__time"]: (round(r["click_value"], 6), r["click_n"],
                         round(r["p50"], 6))
           for r in query_materialized(spark, table, "ev",
                                       "filtered_hist").collect()}

    raw = load(spark, table, {"granularity": "DAY", "dimensions": ["event_type"],
                              "metrics": [{"name": "value", "type": "double"}]},
               interval="2024-01-01/2024-02-01", data_source="ev")
    want = {r["__time"]: (round(r["click_value"], 6), r["click_n"],
                          round(r["p50"], 6))
            for r in group_aggregate(raw, [], aggs).collect()}
    assert got == want and len(got) == 3


def test_theta_sketch_states_materialize_and_merge(spark, table):
    """thetaSketch is in MERGEABLE_TYPES: per-segment KMV states must
    union at query time to the same estimate a direct raw-row thetaSketch
    produces (exact regime here — small distinct counts)."""
    from druid_hadoop_utils_spark import load
    from druid_hadoop_utils_spark.functions.aggregators import (
        group_aggregate,
    )

    aggs = [{"type": "thetaSketch", "name": "theta_users",
             "fieldName": "user_id"}]
    materialize_aggs(spark, table, "ev", "theta", ["event_type"], aggs)
    got = {(r["__time"], r["event_type"]): round(r["theta_users"], 6)
           for r in query_materialized(spark, table, "ev",
                                       "theta").collect()}
    raw = load(spark, table, {"granularity": "DAY",
                              "dimensions": ["event_type"],
                              "metrics": [{"name": "user_id", "type": "long"}]},
               interval="2024-01-01/2024-02-01", data_source="ev")
    want = {(r["__time"], r["event_type"]): round(r["theta_users"], 6)
            for r in group_aggregate(raw, ["event_type"], aggs).collect()}
    assert got == want and len(got) == 6


def test_evolving_dimension_materializes_as_null(spark, tmp_path):
    """Druid evolving-dimension semantics (round-6 fix): a dimension
    ADDED in later segments materializes as NULL for older segments —
    matching the raw-path mergeSchema read — instead of failing
    analysis. A column present in NO segment still fails loudly."""
    from druid_hadoop_utils_spark import load
    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate
    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    root = str(tmp_path / "evolve")
    old = spark.createDataFrame([
        Row(ts=datetime(2024, 1, 1, h), event_type="click", value=float(h))
        for h in range(24)])
    publish_segments(old, root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    new = spark.createDataFrame([
        Row(ts=datetime(2024, 1, 2, h), event_type="view", value=float(h),
            region="eu") for h in range(24)])
    publish_segments(new, root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    aggs = [{"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"}]
    done = materialize_aggs(spark, root, "ev", "by_region",
                            ["event_type", "region"], aggs)
    assert len(done) == 2
    got = {(r["__time"], r["event_type"], r["region"]): (r["n"], r["total"])
           for r in query_materialized(spark, root, "ev", "by_region").collect()}
    raw = load(spark, root,
               {"granularity": "DAY", "dimensions": ["event_type", "region"],
                "metrics": [{"name": "value", "type": "double"}]},
               interval="2024-01-01/2024-02-01", data_source="ev")
    want = {(r["__time"], r["event_type"], r["region"]): (r["n"], r["total"])
            for r in group_aggregate(raw, ["event_type", "region"],
                                     aggs).collect()}
    assert got == want and len(got) == 2
    assert any(k[2] is None for k in got)  # the old segment's NULL region

    with pytest.raises(Exception, match="nowhere|cannot be resolved|UNRESOLVED"):
        materialize_aggs(spark, root, "ev", "ghost",
                         ["event_type", "no_such_col"], aggs)


def test_crashed_state_write_retries_cleanly(spark, table):
    """Atomic state publish (round 6): a writer that died mid-write
    leaves only a .tmp dir — the segment is NOT treated as covered, the
    next materialize_aggs recomputes it for real, and vacuum reclaims
    the orphan tmp."""
    import os
    import shutil

    mdir = os.path.join(table, "ev", "_materialized", "daily")
    done = materialize_aggs(spark, table, "ev", "daily", ["event_type"], AGGS)
    assert len(done) == 3
    # simulate the crash: demote one state back to a tmp dir. The fake
    # writer pid must be one the kernel can never assign (>= pid_max),
    # or a coincidental live process with that pid makes the sweep
    # correctly — but flakily — refuse to reclaim it.
    try:
        with open("/proc/sys/kernel/pid_max") as f:
            dead_pid = int(f.read())
    except OSError:
        dead_pid = 2**22  # linux absolute ceiling
    states = sorted(e for e in os.listdir(mdir) if e.endswith(".parquet"))
    victim = os.path.join(mdir, states[0])
    shutil.move(victim, victim + f".tmp-{dead_pid}")
    with pytest.raises(FileNotFoundError, match="has no state"):
        query_materialized(spark, table, "ev", "daily")
    redone = materialize_aggs(spark, table, "ev", "daily",
                              ["event_type"], AGGS)
    assert len(redone) == 1  # only the crashed segment recomputes
    got = _as_map(query_materialized(spark, table, "ev", "daily"))
    assert got == _as_map(_direct(spark, table))
    # default age floor (ADVICE r6): a FRESH tmp survives vacuum even
    # with a dead pid — on shared storage the pid probe is unreliable,
    # so only stale tmps are reclaimable
    assert vacuum_materialized(table, "ev", "daily") == []
    reclaimed = vacuum_materialized(table, "ev", "daily", tmp_min_age_s=0)
    assert any(f".tmp-{dead_pid}" in g for g in reclaimed)
    assert not any(".tmp-" in e for e in os.listdir(mdir))
