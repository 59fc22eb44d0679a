"""Streaming ↔ batch equivalence harness (VERDICT r3 item 6).

Replays the real ``events`` table as a multi-micro-batch file stream and
asserts the stateful streaming operators' FINAL state equals the batch
operators' answer on the same data. Run in the exact regime (sketch/summary
width ≥ per-key cardinality), where both sides are deterministic and must
agree EXACTLY — the regime the oracle battery pins for the batch twins.
"""

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.sources.tables import load_table


def _replay_dir(spark, sf_dir, tmp_path, n_chunks=4):
    """Split events into n_chunks parquet files: one file == one
    micro-batch under maxFilesPerTrigger=1."""
    src = str(tmp_path / "replay")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value"),
        F.col("user_id").cast("string").alias("user_id"),
    )
    for i in range(n_chunks):
        ev.where(F.crc32(F.concat_ws("|", "event_type", "user_id", "value")) % n_chunks == i) \
          .write.parquet(f"{src}/chunk{i}")
    return src, ev


def _stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


def test_streaming_quantiles_equal_batch_kll(spark, sf_dir, tmp_path):
    """Final streaming per-key quantiles == batch kll_quantiles (same k,
    exact regime) on a replayed events stream."""
    from druid_hadoop_utils_spark.functions.kll import (
        kll_quantiles,
        kll_state_grouped,
    )
    from druid_hadoop_utils_spark.streaming.stateful import streaming_quantiles

    src, ev = _replay_dir(spark, sf_dir, tmp_path)
    qs = [0.25, 0.5, 0.95]

    out = streaming_quantiles(_stream(spark, src, ev.schema),
                              "event_type", "value", qs, k=1024)
    q = (
        out.writeStream.format("memory").queryName("equiv_q")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM equiv_q").collect()
    final_n = {}
    for r in rows:
        final_n[r.key] = max(final_n.get(r.key, 0), r.n_values)
    streamed = {r.key: (r.n_values, r.p25, r.p50, r.p95)
                for r in rows if r.n_values == final_n[r.key]}

    states = kll_state_grouped(ev, "value", ["event_type"], k=1024)
    batch = {
        r.event_type: (r.p25, r.p50, r.p95)
        for r in kll_quantiles(states, ["event_type"], qs).collect()
    }
    counts = {r.event_type: r.n for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}

    assert set(streamed) == set(batch)
    for key, (n, p25, p50, p95) in streamed.items():
        assert n == counts[key]
        assert (p25, p50, p95) == batch[key], key


def test_streaming_heavy_hitters_equal_batch_counts(spark, sf_dir, tmp_path):
    """Final streaming Misra-Gries state (width ≥ distinct items: exact)
    == batch exact heavy_hitters counts on a replayed events stream."""
    from druid_hadoop_utils_spark.operators.frequency import heavy_hitters
    from druid_hadoop_utils_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    src, ev = _replay_dir(spark, sf_dir, tmp_path)

    out = streaming_heavy_hitters(_stream(spark, src, ev.schema),
                                  "event_type", "user_id", k=64)
    q = (
        out.writeStream.format("memory").queryName("equiv_hh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM equiv_hh").collect()
    final_n = {}
    for r in rows:
        final_n[r.key] = max(final_n.get(r.key, 0), r.n_total)
    streamed = {(r.key, r.item): r.approx_count
                for r in rows if r.n_total == final_n[r.key]}

    # batch side 1: exact groupBy counts (ground truth)
    exact = {(r.event_type, r.user_id): r.n
             for r in ev.groupBy("event_type", "user_id")
                        .agg(F.count("*").alias("n")).collect()}
    assert streamed == exact

    # batch side 2: the heavy_hitters operator at a share threshold both
    # sides can answer exactly — every batch hitter appears in the final
    # streaming state with the identical exact count
    hh = heavy_hitters(ev.withColumn("g", F.col("event_type")),
                       ["event_type", "user_id"], min_share=0.01)
    batch_hitters = {(r.event_type, r.user_id): r.cnt for r in hh.collect()}
    assert batch_hitters  # threshold admits rows at this scale
    for key, cnt in batch_hitters.items():
        assert streamed.get(key) == cnt, key
