import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", content=bytes([1, 2, 3, 4] * 100),
            meta=Row(format="png", width=64, height=48, duration_ms=None)),
        Row(media_id=2, kind="image", content=bytes([9, 9, 9]),
            meta=Row(format="jpg", width=32, height=32, duration_ms=None)),
        Row(media_id=3, kind="video", content=bytes([5] * 50),
            meta=Row(format="mp4", width=640, height=480, duration_ms=3500)),
    ]
    return spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)


def _pil_available():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="Pillow installed: real path active")
def test_real_decode_raises_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(b"bytes", fake=False)


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_decode_with_pillow():
    """Activates the day Pillow ships: decode a generated 2x2 PNG and
    check shape/dtype — the only piece that changes vs the fake path."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2, 2), (10, 20, 30)).save(buf, format="PNG")
    arr = M.decode_image(buf.getvalue(), fake=False)
    assert arr.shape == (2, 2, 3) and arr.dtype.name == "uint8"
    assert (arr == [10, 20, 30]).all()


def test_fake_decoder_deterministic():
    a = M.decode_image(b"same-bytes", fake=True)
    b = M.decode_image(b"same-bytes", fake=True)
    assert (a == b).all() and a.shape == (8, 8, 3)


def test_image_features_pipeline(media, spark):
    out = M.image_features(media.where(F.col("kind") == "image"), fake=True)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_bytes == 400
    assert len(rows[1].features) == 16
    assert all(0.0 <= v <= 1.0 for v in rows[1].features)
    # deterministic across runs
    again = {r.media_id: r.sha256 for r in M.image_features(
        media.where(F.col("kind") == "image"), fake=True).collect()}
    assert again == {k: v.sha256 for k, v in rows.items()}


def test_frame_sample_plan_no_decode(media):
    out = M.frame_sample_plan(media, every_ms=1000)
    rows = sorted(r.frame_ts_ms for r in out.collect())
    assert rows == [0, 1000, 2000, 3000]


def test_media_stats_is_metadata_only(media, spark, tmp_path):
    out = {r.kind: r for r in M.media_stats(media).collect()}
    assert out["image"].n == 2
    assert out["image"].avg_pixels == (64 * 48 + 32 * 32) / 2
    # over parquet, the stats plan must NOT read the content column
    path = str(tmp_path / "media")
    media.write.parquet(path)
    plan = M.media_stats(spark.read.parquet(path))._jdf.queryExecution() \
        .executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("content" not in ln for ln in read_schema)


def test_media_byte_stats_reads_blobs(media):
    out = {r.kind: r for r in M.media_byte_stats(media).collect()}
    assert out["image"].total_bytes == 403
    assert out["video"].total_bytes == 50


def test_streaming_segment_publish(spark, tmp_path):
    """One availableNow micro-batch: stream → windowed rollup → segment
    publish → readable through the batch load() path (version flip)."""
    from druid_hadoop_utils_spark.streaming.ingest import (
        segment_publishing_writer,
        streaming_rollup,
    )
    from druid_hadoop_utils_spark import load

    src = str(tmp_path / "in")
    from datetime import datetime

    # the 03:30 sentinel advances the watermark past the hour-1 window;
    # its own window stays open and must NOT be emitted (append mode)
    events = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, h, m), event_type=t, value=float(v))
         for h, m, t, v in [(0, 5, "a", 1), (0, 25, "a", 2), (0, 45, "b", 3),
                            (1, 10, "a", 4), (3, 30, "sentinel", 9)]]
    )
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    rolled = streaming_rollup(
        stream, dims=["event_type"],
        aggs=[F.sum("value").alias("value"), F.count("*").alias("n")],
    )
    table_root = str(tmp_path / "tables")
    q = segment_publishing_writer(
        rolled, table_root, "stream_events",
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    spec = {"granularity": "NONE", "dimensions": ["event_type"],
            "metrics": [{"name": "value", "type": "double"}, {"name": "n", "type": "long"}]}
    df = load(spark, table_root, spec, interval="2024-01-01/2024-01-02",
              data_source="stream_events")
    rows = {(r["__time"].hour, r.event_type): (r.value, r.n) for r in df.collect()}
    assert rows[(0, "a")] == (3.0, 2)
    assert rows[(0, "b")] == (3.0, 1)
    assert rows[(1, "a")] == (4.0, 1)
    # the sentinel's window never closed → correctly withheld by the watermark
    assert (3, "sentinel") not in rows


def test_streaming_rollup_sliding_windows(spark, tmp_path):
    """slide= turns the tumbling bucket into overlapping windows: each
    event contributes to window_size/slide buckets, and the emitted
    per-window sums equal the batch groupBy over the same window spec."""
    from datetime import datetime

    from druid_hadoop_utils_spark.streaming.ingest import streaming_rollup

    src = str(tmp_path / "slide_in")
    events = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, 0, m), event_type="a", value=float(v))
         for m, v in [(5, 1), (20, 2), (35, 4), (50, 8)]]
        + [Row(ts=datetime(2024, 1, 1, 3, 0), event_type="sentinel", value=0.0)]
    )
    events.write.parquet(src)

    rolled = streaming_rollup(
        spark.readStream.schema(events.schema).parquet(src),
        watermark="10 minutes", window="1 hour", slide="30 minutes",
        dims=["event_type"],
        aggs=[F.sum("value").alias("value")],
    )
    q = (
        rolled.writeStream.format("memory").queryName("slide_roll")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "slide_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["__time"].hour, r["__time"].minute, r.event_type): r.value
        for r in spark.sql("SELECT * FROM slide_roll").collect()
    }
    # hour-long windows sliding by 30 min over events at :05(1) :20(2)
    # :35(4) :50(8): [23:30,00:30) sums 1+2, [00:00,01:00) sums all,
    # [00:30,01:30) sums 4+8
    assert got[(23, 30, "a")] == 3.0
    assert got[(0, 0, "a")] == 15.0
    assert got[(0, 30, "a")] == 12.0
    # sentinel's own windows never closed -> withheld by the watermark
    assert not any(k[2] == "sentinel" for k in got)
    assert len(got) == 3
