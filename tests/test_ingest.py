"""Batch ingestion → managed segment table → engine load round trip."""

import os

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.tables import load_table

SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"},
                    {"name": "user_id", "type": "long"}]}


@pytest.fixture(scope="module")
def table_root(tmp_path_factory, spark, sf_dir):
    root = str(tmp_path_factory.mktemp("ingested"))
    ev = load_table(spark, sf_dir, "events")
    manifests = publish_segments(
        ev.select("ts", "event_type", "value", "user_id"),
        root, "events", version="v1", time_column="ts", bucket="DAY",
    )
    assert len(manifests) >= 28  # ~30 day buckets in the events table
    return root


def test_ingested_counts_match_source(spark, sf_dir, table_root):
    ev = load_table(spark, sf_dir, "events")
    df = load(spark, table_root, SPEC, interval="2020-01-01/2030-01-01",
              data_source="events")
    assert df.count() == ev.count()


def test_interval_load_prunes_to_bucket_files(spark, table_root):
    df = load(spark, table_root, SPEC, interval="2024-01-03/2024-01-05",
              data_source="events")
    files = df.inputFiles()
    buckets = {f.split("/")[-4] for f in files}
    assert len(buckets) == 2  # exactly the two day buckets
    assert all(b.startswith("2024-01-03") or b.startswith("2024-01-04") for b in buckets)


def test_reingest_new_version_overshadows(spark, sf_dir, table_root):
    ev = load_table(spark, sf_dir, "events")
    one_day = ev.where(
        (F.col("ts") >= F.lit("2024-01-03")) & (F.col("ts") < F.lit("2024-01-04"))
    ).select("ts", "event_type", F.lit(0.0).alias("value"), "user_id")
    publish_segments(one_day, table_root, "events", version="v2",
                     time_column="ts", bucket="DAY")
    df = load(spark, table_root, SPEC, interval="2024-01-03/2024-01-04",
              data_source="events")
    # v2 zeroed the metric for that day; count unchanged
    assert df.agg(F.sum("value")).first()[0] == 0.0
    assert df.count() == one_day.count()


def test_sharded_publish_round_trip(spark, sf_dir, tmp_path):
    """shards_per_bucket=3: every bucket carries 1-3 shard segments under
    ONE group manifest file, rows partition losslessly across shards, and
    the load path reads the union."""
    from druid_hadoop_utils_spark.sources.segments import (
        MANIFEST_DIR,
        list_manifests,
    )

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events")
    src = ev.select("ts", "event_type", "value", "user_id")
    manifests = publish_segments(
        src, root, "ev3", version="v1", time_column="ts", bucket="DAY",
        shards_per_bucket=3,
    )
    by_iv = {}
    for m in manifests:
        by_iv.setdefault(m.interval.iso(), []).append(m)
    assert any(len(ms) > 1 for ms in by_iv.values()), "no bucket got >1 shard"
    for ms in by_iv.values():
        assert sorted(m.shard_num for m in ms) == list(range(len(ms)))
    # one manifest FILE per bucket, not per shard
    mfiles = os.listdir(os.path.join(root, "ev3", MANIFEST_DIR))
    assert len(mfiles) == len(by_iv)
    assert {m.manifest_file for m in list_manifests(root, "ev3")} == {
        os.path.join(root, "ev3", MANIFEST_DIR, f) for f in mfiles
    }
    df = load(spark, root, SPEC, interval="2020-01-01/2030-01-01",
              data_source="ev3")
    assert df.count() == src.count()
    assert df.agg(F.sum("user_id")).first()[0] == src.agg(F.sum("user_id")).first()[0]


def test_sharded_reingest_overshadows_atomically(spark, sf_dir, tmp_path):
    """A sharded v2 replaces a single-shard v1 for its bucket; vacuum
    removes all of v1's bucket data and the whole v2 group survives."""
    from druid_hadoop_utils_spark.sources.maintenance import vacuum

    root = str(tmp_path)
    ev = load_table(spark, sf_dir, "events")
    one_day = ev.where(
        (F.col("ts") >= F.lit("2024-01-03")) & (F.col("ts") < F.lit("2024-01-04"))
    ).select("ts", "event_type", "value", "user_id")
    publish_segments(one_day, root, "ev4", version="v1", time_column="ts",
                     bucket="DAY")
    zeroed = one_day.withColumn("value", F.lit(0.0))
    publish_segments(zeroed, root, "ev4", version="v2", time_column="ts",
                     bucket="DAY", shards_per_bucket=4)
    df = load(spark, root, SPEC, interval="2024-01-03/2024-01-04",
              data_source="ev4")
    assert df.count() == one_day.count()
    assert df.agg(F.sum("value")).first()[0] == 0.0
    removed = vacuum(root, "ev4")
    assert removed and all("_v1_" in r for r in removed)
    df2 = load(spark, root, SPEC, interval="2024-01-03/2024-01-04",
               data_source="ev4")
    assert df2.count() == one_day.count()


def test_files_per_bucket_bound(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500)
    manifests = publish_segments(
        ev.select("ts", "event_type", "value", "user_id"),
        str(tmp_path), "ev2", version="v1", time_column="ts",
        bucket="DAY", files_per_bucket=2,
    )
    for m in manifests:
        n_files = len([f for f in os.listdir(m.path) if f.endswith(".parquet")])
        assert 1 <= n_files <= 2


def test_crashed_publish_leftover_staging_is_invisible_and_retryable(
    spark, sf_dir, tmp_path
):
    """Crash-safety of the publish protocol (manifests land LAST): a
    publish that died after writing its staging parquet leaves (a) query
    results unchanged — staging dirs never reach the visible timeline —
    and (b) a clean retry path: re-running the same publish overwrites
    the leftover staging and lands normally."""
    root = str(tmp_path / "crash_root")
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value", "user_id")
    publish_segments(ev, root, "events", version="v1",
                     time_column="ts", bucket="DAY")
    before = load(spark, root, SPEC, interval="2024-01-01/2025-01-01",
                  data_source="events").count()

    # simulate the crash: a v2 staging dir exists, no manifests for it
    staging = os.path.join(root, "events", "_staging_v2")
    ev.withColumn("value", F.col("value") * 10).limit(100) \
        .write.mode("overwrite").parquet(staging)
    from druid_hadoop_utils_spark.sources.segments import list_manifests

    assert all(m.version == "v1" for m in list_manifests(root, "events"))
    after_crash = load(spark, root, SPEC, interval="2024-01-01/2025-01-01",
                       data_source="events")
    assert after_crash.count() == before  # nothing leaked into queries

    # the retry lands cleanly over the leftover staging
    publish_segments(ev.withColumn("value", F.col("value") + 1000.0),
                     root, "events", version="v2",
                     time_column="ts", bucket="DAY")
    out = load(spark, root, SPEC, interval="2024-01-01/2025-01-01",
               data_source="events")
    assert out.count() == before  # v2 overshadows v1 row-for-row
    assert out.agg(F.min("value")).collect()[0][0] >= 1000.0  # v2 rows


def test_null_timestamp_rows_refused_loudly_before_any_promote(spark, tmp_path):
    """Rows with NULL time have no bucket: publish must refuse with an
    actionable message BEFORE any segment promotes (no half-publish) —
    Druid likewise rejects rows without a parseable timestamp."""
    from datetime import datetime

    from pyspark.sql import Row

    root = str(tmp_path / "nullts")
    rows = [Row(ts=datetime(2024, 1, 1, h), v=float(h)) for h in range(5)]
    rows.append(Row(ts=None, v=99.0))
    with pytest.raises(ValueError, match="NULL 'ts'"):
        publish_segments(spark.createDataFrame(rows), root, "ev",
                         version="v1", time_column="ts", bucket="DAY")
    from druid_hadoop_utils_spark.sources.segments import list_manifests

    with pytest.raises(FileNotFoundError):  # nothing half-published:
        list_manifests(root, "ev")          # no manifest dir even exists
    # the fix the message names works
    good = spark.createDataFrame(rows).where(F.col("ts").isNotNull())
    ms = publish_segments(good, root, "ev", version="v1",
                          time_column="ts", bucket="DAY")
    assert len(ms) == 1
