from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.sessions import sessionize


def test_session_gap_boundary_semantics(spark):
    """Events <= gap apart merge — the boundary is inclusive (an event at
    EXACTLY previous+gap still merges); only a strictly larger gap splits."""
    rows = [
        Row(ts=datetime(2024, 1, 1, 0, 0, 0), u=1),
        Row(ts=datetime(2024, 1, 1, 0, 29, 59), u=1),   # merges (< 30m)
        Row(ts=datetime(2024, 1, 1, 0, 59, 59), u=1),   # merges again
        Row(ts=datetime(2024, 1, 1, 1, 29, 59), u=1),   # exactly +30m → merges
        Row(ts=datetime(2024, 1, 1, 5, 0, 0), u=1),     # far later → new
        Row(ts=datetime(2024, 1, 1, 0, 10, 0), u=2),    # other key
    ]
    out = sessionize(spark.createDataFrame(rows), time_column="ts", keys=["u"])
    sess = sorted(
        (r.u, r.session_start, r.n_events) for r in out.collect()
    )
    assert sess == [
        (1, datetime(2024, 1, 1, 0, 0, 0), 4),
        (1, datetime(2024, 1, 1, 5, 0, 0), 1),
        (2, datetime(2024, 1, 1, 0, 10, 0), 1),
    ]


def test_session_end_is_last_plus_gap(spark):
    rows = [Row(ts=datetime(2024, 1, 1, 0, 0, 0), u=1),
            Row(ts=datetime(2024, 1, 1, 0, 10, 0), u=1)]
    out = sessionize(spark.createDataFrame(rows), time_column="ts", keys=["u"],
                     gap="30 minutes").first()
    assert out.session_start == datetime(2024, 1, 1, 0, 0, 0)
    assert out.session_end == datetime(2024, 1, 1, 0, 40, 0)


def test_sessionize_streaming_compatible(spark, tmp_path):
    """The same sessionize() call works on a streaming DataFrame."""
    rows = [Row(ts=datetime(2024, 1, 1, 0, m), u=1) for m in (0, 5, 50)]
    src = str(tmp_path / "in")
    df = spark.createDataFrame(rows)
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = sessionize(stream.withWatermark("ts", "1 hour"), time_column="ts",
                      keys=["u"], gap="30 minutes")
    q = (sess.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out").collect()
    # both sessions' windows close relative to the final watermark
    assert {(r.session_start.minute, r.n_events) for r in got} <= {(0, 2), (50, 1)}
